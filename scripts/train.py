#!/usr/bin/env python
"""Workflow step 3 (ref: train_model.py run-book — SURVEY.md §4.2).

Usage:
  python scripts/train.py preset=bigru-ctc workdir=runs/ctc \\
      dataview=data/dataviews/train [steps=N] [resume=1] [fused=1] \\
      [init_from=<release asset name>] [key=value...]

``init_from=`` warm-starts the params from a release checkpoint in assets/
(fresh optimizer, step 0) — fine-tuning, e.g. re-weighting the hybrid loss.

With fused=1 the dataview is ignored: training consumes raw fixture video
frames and runs detection/landmarking/ROI on device inside the train step.
Any dotted config path (train.learning_rate=1e-3, model.tf_dim=512, ...) can
be overridden on the command line.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides, preset


def main(argv):
    args = parse_overrides(argv)
    cfg = preset(args.pop("preset", "bigru-ctc"))
    workdir = args.pop("workdir", f"runs/{cfg.name}")
    dataview_path = args.pop("dataview", None)
    steps = int(args.pop("steps", 0)) or None
    resume = args.pop("resume", "0") in ("1", "true")
    init_from = args.pop("init_from", None)
    fused = args.pop("fused", "0") in ("1", "true")
    n_clips = int(args.pop("n_clips", 24))
    data_seed = int(args.pop("data_seed", 1))
    variation = float(args.pop("variation", 0.0))
    variation_max = args.pop("variation_max", None)
    if variation_max is not None:
        # mixed-appearance corpus: per-clip level in [variation, variation_max)
        variation = (variation, float(variation_max))
    vmax = variation[1] if isinstance(variation, tuple) else variation
    assets_variant = args.pop("assets_variant",
                              "robust" if vmax > 0 else "default")
    if args:
        cfg = cfg.override(**args)

    from lipreading_tpu.train.loop import FusedTrainer, Trainer

    if fused:
        from lipreading_tpu.data.pipeline import (
            FixtureVideoDataset,
            VideoBatchIterator,
        )
        from lipreading_tpu.ops.detector import params_to_jax
        from lipreading_tpu.ops.ert import model_to_jax
        from lipreading_tpu.preproc_training import load_assets

        det_np, ert_np = load_assets(variant=assets_variant)
        lmk = model_to_jax(ert_np)
        if cfg.preprocess.landmarker == "conv":
            # the fused step's landmark stage runs the distilled conv
            # landmarker instead of the ERT cascade (ops/landmarker.py)
            from lipreading_tpu.ops.landmarker import (
                params_to_jax as lmk_to_jax,
            )
            from lipreading_tpu.preproc_training import load_landmarker

            lm_np = load_landmarker(variant=assets_variant)
            if lm_np is None:
                raise SystemExit(
                    f"preprocess.landmarker=conv but no conv landmarker "
                    f"asset for variant {assets_variant!r}"
                )
            lmk = lmk_to_jax(lm_np)
        ds = FixtureVideoDataset(n_clips, seed=data_seed, cfg=cfg.data)
        it = VideoBatchIterator(ds, cfg.data.batch_size, seed=cfg.train.seed)
        trainer = FusedTrainer(cfg, workdir, params_to_jax(det_np), lmk)
        heldout = FixtureVideoDataset(4, seed=data_seed + 999_983, cfg=cfg.data)
        eval_batches = [heldout.batch(list(range(min(8, len(heldout)))),
                                      max(cfg.data.time_buckets))]
    else:
        from lipreading_tpu.data.dataset import BatchIterator, BucketedDataset
        from lipreading_tpu.data.dataview import Dataview, build_fixture_dataview

        if dataview_path and os.path.exists(
            os.path.join(dataview_path, "index.json")
        ):
            view = Dataview(dataview_path)
        else:
            dataview_path = dataview_path or os.path.join(workdir, "dataview")
            print(f"building fixture dataview at {dataview_path} ...")
            view = build_fixture_dataview(
                dataview_path, n_clips=n_clips, seed=data_seed,
                data_cfg=cfg.data, variation=variation,
                assets_variant=assets_variant,
            )
        ds = BucketedDataset(view, cfg.data)
        it = BatchIterator(ds, cfg.data.batch_size, seed=cfg.train.seed)
        trainer = Trainer(cfg, workdir)
        # held-out eval: fresh clips from a disjoint seed range
        ho_path = os.path.join(workdir, "dataview_heldout")
        if not os.path.exists(os.path.join(ho_path, "index.json")):
            ho_view = build_fixture_dataview(
                ho_path, n_clips=4, seed=data_seed + 999_983,
                data_cfg=cfg.data, variation=variation,
                assets_variant=assets_variant,
            )
        else:
            ho_view = Dataview(ho_path)
        ho_ds = BucketedDataset(ho_view, cfg.data)
        eval_batches = [ho_ds.make_batch(list(range(min(8, len(ho_ds)))))]

    if init_from:
        # warm-start fine-tuning: params from a release asset in assets/ or
        # a checkpoint .msgpack path (fine-tune chaining); fresh optimizer +
        # step 0 either way. The source's model tree must match the
        # preset/overrides this run builds.
        if os.path.exists(init_from):
            from lipreading_tpu.train.checkpoint import load_checkpoint

            _, p0, _, _, _ = load_checkpoint(init_from, trainer.params)
            trainer.warm_start(p0)
            print(f"warm-started params from {init_from}")
        else:
            from lipreading_tpu.preproc_training import load_release_model

            rel = load_release_model(init_from)
            if rel is None:
                raise SystemExit(f"init_from: no release asset {init_from!r}")
            trainer.warm_start(rel[0])
            print(f"warm-started params from assets/{init_from}")
    if resume:
        state = trainer.restore()
        if state:
            it = type(it).from_state(ds, cfg.data.batch_size, state) \
                if hasattr(type(it), "from_state") else it
            print(f"resumed at step {trainer.step}")

    print(f"training {cfg.name} ({cfg.encoder}/{cfg.decoder}) on "
          f"{len(ds)} samples, {trainer.mesh.devices.size} device(s)")
    last = trainer.fit(it, steps=steps, eval_batches=eval_batches)
    trainer.save(it)
    print("final:", last)


if __name__ == "__main__":
    main(sys.argv[1:])
