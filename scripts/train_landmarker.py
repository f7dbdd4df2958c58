#!/usr/bin/env python
"""Distill the ERT cascade into the conv landmarker (ops/landmarker.py).

Usage:
  python scripts/train_landmarker.py [variant=default] [n_clips=48]
      [steps=4000] [seed=0] [variation=0.0] [out=assets/landmarker_conv.npz]

Teacher = the shipped detector+ERT assets for ``variant``; targets are the
ERT's own predictions on the detector's boxes (the deployment distribution).
Prints the distillation gate metrics (landmark px error vs the ERT, and the
downstream normalized-ROI max|diff| on held-out clips) before saving.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lipreading_tpu.config import parse_overrides


def main(argv):
    args = parse_overrides(argv)
    variant = args.pop("variant", "default")
    n_clips = int(args.pop("n_clips", 48))
    steps = int(args.pop("steps", 4000))
    seed = int(args.pop("seed", 0))
    variation = float(args.pop("variation", 0.0))
    sfx = "" if variant == "default" else f"_{variant}"
    out = args.pop("out", os.path.join("assets", f"landmarker_conv{sfx}.npz"))
    assert not args, f"unknown args {args}"

    import jax.numpy as jnp

    from lipreading_tpu.config import PreprocessConfig
    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops import landmarker as lmk
    from lipreading_tpu.ops.preprocess import preprocess_clips
    from lipreading_tpu.preproc_training import (
        conv_landmarker_error,
        load_assets,
        save_landmarker,
        train_conv_landmarker,
    )

    det_np, ert_np = load_assets(variant=variant)
    clips = [make_clip(seed * 100_000 + 31 + i, variation=variation)
             for i in range(n_clips)]
    print(f"distilling ERT ({variant}) -> conv landmarker on "
          f"{sum(c.num_frames for c in clips)} frames")
    lm = train_conv_landmarker(det_np, ert_np, clips, seed=seed, steps=steps)

    held = [make_clip(seed * 100_000 + 999_431 + i, variation=variation)
            for i in range(6)]
    err = conv_landmarker_error(lm, det_np, ert_np, held)
    print(f"held-out landmark error vs ERT: {err:.3f} px")

    # downstream gate: normalized ROI difference between the two paths
    det = params_to_jax(det_np)
    from lipreading_tpu.ops.ert import model_to_jax

    T = min(c.num_frames for c in held[:2])
    stack = jnp.asarray(np.stack([c.frames[:T] for c in held[:2]]))
    cfg_e = PreprocessConfig()
    cfg_c = PreprocessConfig(landmarker="conv")
    roi_e = np.asarray(preprocess_clips(det, model_to_jax(ert_np), stack, cfg_e))
    roi_c = np.asarray(preprocess_clips(
        det, lmk.params_to_jax(lm), stack, cfg_c
    ))
    d = np.abs(roi_e - roi_c)
    print(f"downstream ROI |diff|: mean {d.mean():.4f} max {d.max():.4f} "
          f"(normalized units; 1 gray level = {1/255/0.165:.4f})")

    save_landmarker(lm, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
