#!/usr/bin/env python
"""Workflow step 4 (ref: eval script — SURVEY.md §4.3): CER/WER of a trained
checkpoint on held-out fixture clips, or on a dataview split.

Usage:
  python scripts/evaluate.py preset=bigru-ctc workdir=runs/ctc \\
      [ckpt=path] [n_clips=6] [seed=9090] [beam=8] [decode=ctc|cascade]
      [key=value...]   (decode=cascade: batched greedy + trigger-gated
                        beam rescoring — the serving path, infer.py)
  python scripts/evaluate.py workdir=runs/ctc dataview=path [split=val] ...
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import load_workdir_config, parse_overrides, preset


def main(argv):
    args = parse_overrides(argv)
    preset_name = args.pop("preset", "bigru-ctc")
    workdir = args.pop("workdir", f"runs/{preset_name}")
    # the Trainer snapshots its exact config; prefer it over the preset
    cfg = load_workdir_config(workdir) or preset(preset_name)
    ckpt = args.pop("ckpt", None)
    n_clips = int(args.pop("n_clips", 6))
    seed = int(args.pop("seed", 9090))
    beam = int(args.pop("beam", cfg.train.beam_width))
    decode = args.pop("decode", None)   # decode via "ctc"/"attention" head
    lm_weight = float(args.pop("lm_weight", 0.0))
    use_lexicon = args.pop("lexicon", "0") in ("1", "true")
    release = args.pop("release", "bigru_ctc")
    variation = float(args.pop("variation", 0.0))
    assets_variant = args.pop("assets_variant",
                              "robust" if variation > 0 else "default")
    dataview_path = args.pop("dataview", None)
    split = args.pop("split", "val")
    overrides = dict(args)
    if args:
        cfg = cfg.override(**args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import cer, corpus_cer, corpus_wer
    from lipreading_tpu.models.lipreader import init_model
    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import load_assets
    from lipreading_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    params = init_model(jax.random.PRNGKey(0), cfg)
    path = ckpt or latest_checkpoint(os.path.join(workdir, "ckpt"))
    import dataclasses as _dc
    if path:
        _, params, _, _, _ = load_checkpoint(path, params)
        # device-resident once: load_checkpoint leaves are numpy, and the
        # jitted decode paths take params as an argument — without this
        # every decode call re-ships the full model over H2D (the same
        # tunnel tax load_release_model now pays once at load)
        params = jax.device_put(params)
        print(f"loaded {path}")
    else:
        from lipreading_tpu.preproc_training import load_release_model

        rel = load_release_model(release)
        if rel is not None:
            params, cfg = rel
            if overrides:
                # the release snapshot replaced cfg — re-apply the user's
                # CLI overrides or flags like preprocess.landmarker=conv
                # would be silently discarded on this path
                cfg = cfg.override(**overrides)
            print(f"using release checkpoint assets/{release}.msgpack")
        else:
            print("WARNING: no checkpoint found; evaluating random init")

    det_np, ert_np = load_assets(variant=assets_variant)
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    if cfg.preprocess.landmarker == "conv":
        # preprocess.landmarker=conv: the distilled conv landmarker stands in
        # for the ERT (2.2x preprocessing throughput; ops/landmarker.py)
        from lipreading_tpu.ops.landmarker import params_to_jax as lmk_to_jax
        from lipreading_tpu.preproc_training import load_landmarker

        lm_np = load_landmarker(variant=assets_variant)
        if lm_np is None:
            raise SystemExit(
                f"preprocess.landmarker=conv but no conv landmarker asset "
                f"for variant {assets_variant!r} (scripts/train_landmarker.py)"
            )
        ert = lmk_to_jax(lm_np)
    if decode == "ctc" and cfg.decoder == "hybrid":
        # decode a hybrid checkpoint through its CTC head (robust to the
        # attention decoder's failure modes on out-of-distribution lengths)
        cfg = _dc.replace(cfg, decoder="ctc")

    if dataview_path:
        evaluate_dataview(params, cfg, dataview_path, split, beam,
                          lm_weight=lm_weight, use_lexicon=use_lexicon,
                          decode=decode)
        return

    roi_list, len_list, refs = [], [], []
    for i in range(n_clips):
        clip = make_clip(seed + i, cfg.data, variation=variation)
        # bucket-padded preprocessing + decode: one compile per bucket shape
        rois = preprocess_padded(det, ert, clip.frames, cfg.preprocess)
        roi_list.append(rois)
        len_list.append(rois.shape[0])
        refs.append(clip.text)
    if decode == "cascade":
        # serving path: batched greedy pass, beam+LM rescoring only for
        # trigger-flagged clips (infer.transcribe_cascade). Clips group by
        # their 64-frame length bucket: a mixed-bucket batch pads short
        # clips far past their length, and the releases' time-pooled
        # GroupNorm makes features pad-dependent (nn.groupnorm docstring) —
        # training, dataview eval, and serving all batch same-bucket clips
        from lipreading_tpu.infer import transcribe_cascade

        buckets = {}
        if cfg.model.framewise_norm:
            # framewise statistics are pad-invariant (test-pinned), so the
            # same-bucket crutch is unnecessary: one shared bucket, one
            # batched call (VERDICT r3 #3 demotion criterion)
            tb = -(-max(len_list) // 64) * 64
            buckets[tb] = list(range(n_clips))
        else:
            for i, L in enumerate(len_list):
                buckets.setdefault(-(-L // 64) * 64, []).append(i)
        hyps = [None] * n_clips
        n_rescored = 0
        for tb, idxs in sorted(buckets.items()):
            batch = np.zeros((len(idxs), tb) + roi_list[0].shape[1:],
                             roi_list[0].dtype)
            for k, i in enumerate(idxs):
                batch[k, : len_list[i]] = roi_list[i]
            sub, n_r = transcribe_cascade(
                params, cfg, batch,
                jnp.asarray([len_list[i] for i in idxs]), beam=beam,
                lm_weight=lm_weight, use_lexicon=use_lexicon)
            for k, i in enumerate(idxs):
                hyps[i] = sub[k]
            n_rescored += n_r
        print(f"  cascade: {n_rescored}/{n_clips} clips beam-rescored")
    else:
        hyps = []
        for rois, T in zip(roi_list, len_list):
            padded = -(-T // 64) * 64
            rois = np.pad(rois, ((0, padded - T), (0, 0), (0, 0)))
            hyps.append(transcribe(
                params, cfg, rois[None], jnp.asarray([T]), beam=beam,
                lm_weight=lm_weight, use_lexicon=use_lexicon,
            )[0])
    for i, (hyp, ref) in enumerate(zip(hyps, refs)):
        print(f"  clip {i}: cer={cer(hyp, ref):.3f} "
              f"hyp={hyp!r} ref={ref!r}")
    print(f"corpus CER={corpus_cer(hyps, refs):.4f} "
          f"WER={corpus_wer(hyps, refs):.4f}")


def evaluate_dataview(params, cfg, dataview_path, split, beam,
                      lm_weight=0.0, use_lexicon=False, decode=None):
    """CER/WER over a clip-level split of a cached dataview.

    Decodes under the SAME knobs as the fixture path (beam / lm_weight /
    lexicon / cfg.decoder), so dataview-split CER is measurable under the
    flagship decode config. The ragged tail batch is padded to B by
    repeating the last sample (keeps one compiled shape) and the duplicate
    hypotheses are dropped before scoring — no sample silently vanishes.
    """
    import numpy as np

    from lipreading_tpu.data.dataset import BucketedDataset, batch_to_device
    from lipreading_tpu.data.dataview import Dataview, split_by_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import corpus_cer, corpus_wer

    view = Dataview(dataview_path)
    splits = split_by_clip(view, {"train": 0.9, "val": 0.1}, seed=0)
    if split not in splits or not splits[split]:
        # a silent fall-through to the WHOLE dataview would report train-
        # contaminated CER/WER as if held-out
        raise SystemExit(
            f"split {split!r} missing or empty; have "
            f"{ {k: len(v) for k, v in splits.items()} }"
        )
    idx = splits[split]
    ds = BucketedDataset(view, cfg.data, indices=idx)
    hyps, refs = [], []
    B = 8
    n_rescored = 0
    for lo in range(0, len(ds), B):
        take = list(range(lo, min(lo + B, len(ds))))
        n_real = len(take)
        take += [take[-1]] * (B - n_real)
        b = ds.make_batch(take)
        dev = batch_to_device(b, cfg.preprocess.normalize_mean,
                              cfg.preprocess.normalize_std)
        if decode == "cascade":
            from lipreading_tpu.infer import transcribe_cascade

            sub, flags = transcribe_cascade(
                params, cfg, dev["rois"], dev["frame_lengths"], beam=beam,
                lm_weight=lm_weight, use_lexicon=use_lexicon,
                return_flags=True)
            hyps.extend(sub[:n_real])
            # count rescores over the REAL rows only (the batch is padded
            # to B by duplicating the last sample)
            n_rescored += int(np.asarray(flags)[:n_real].sum())
        else:
            hyps.extend(transcribe(params, cfg, dev["rois"],
                                   dev["frame_lengths"], beam=beam,
                                   lm_weight=lm_weight,
                                   use_lexicon=use_lexicon)[:n_real])
        refs.extend(b.texts[:n_real])
    extra = (f"  rescored={n_rescored}/{len(hyps)}"
             if decode == "cascade" else "")
    print(f"{split} split: {len(hyps)} samples  "
          f"CER={corpus_cer(hyps, refs):.4f} "
          f"WER={corpus_wer(hyps, refs):.4f}{extra}")


if __name__ == "__main__":
    main(sys.argv[1:])
