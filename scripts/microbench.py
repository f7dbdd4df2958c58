#!/usr/bin/env python
"""Kernel microbenchmarks (run on TPU; CPU works but is meaningless).

Prints a per-op table: fused-ROI Pallas vs XLA, ERT cascade, detector,
CTC loss scan vs Pallas (fwd and grad), CTC greedy decode XLA vs Pallas.

Usage: python scripts/microbench.py [frames=384] [reps=20]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides


def main(argv):
    args = parse_overrides(argv)
    n = int(args.get("frames", 384))
    reps = int(args.get("reps", 20))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops import roi as roi_ops
    from lipreading_tpu.ops.ctc import ctc_loss
    from lipreading_tpu.ops.ctc_pallas import ctc_loss_pallas
    from lipreading_tpu.ops.decode import ctc_greedy_ids
    from lipreading_tpu.ops.decode_pallas import ctc_greedy_ids_pallas
    from lipreading_tpu.ops.detector import detect, params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax, predict_batch
    from lipreading_tpu.ops.preprocess import (
        mouth_boxes_from_landmarks,
        preprocess_frames,
    )
    from lipreading_tpu.preproc_training import load_assets
    from lipreading_tpu.profiling import Timer

    print(f"backend={jax.default_backend()} frames={n} reps={reps}")
    det_np, ert_np = load_assets()
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    clips = [make_clip(100 + i) for i in range(max(1, n // 56))]
    frames = np.concatenate([c.frames for c in clips])[:n]
    n = frames.shape[0]
    fj = jnp.asarray(frames)
    gray = jax.jit(roi_ops.grayscale)(fj)
    boxes = jax.jit(lambda g: detect(det, g))(gray)
    lms = jax.jit(lambda g, b: predict_batch(ert, g, b))(gray, boxes)
    mb = jax.jit(lambda l: mouth_boxes_from_landmarks(l, 0.3, 160, 160))(lms)

    rng = np.random.default_rng(0)
    B, T, V, L = 16, 128, 31, 40
    logits = jnp.asarray(rng.normal(0, 2, (B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(3, V, (B, L)).astype(np.int32))
    in_lens = jnp.asarray(rng.integers(90, T + 1, (B,)).astype(np.int32))
    lab_lens = jnp.asarray(rng.integers(1, 20, (B,)).astype(np.int32))
    ctc_args = (labels, in_lens, lab_lens)

    rows = [
        ("grayscale", jax.jit(roi_ops.grayscale), (fj,), n),
        ("detector", jax.jit(lambda g: detect(det, g)), (gray,), n),
        ("ert_cascade", jax.jit(lambda g, b: predict_batch(ert, g, b)),
         (gray, boxes), n),
        ("roi_pallas", jax.jit(lambda g, m: roi_ops.sample_rois_pallas(g, m, 96)),
         (gray, mb), n),
        ("roi_xla", jax.jit(lambda g, m: roi_ops.sample_rois_xla(g, m, 96)),
         (gray, mb), n),
        ("preprocess_full", jax.jit(lambda f: preprocess_frames(det, ert, f)),
         (fj,), n),
        ("ctc_fwd_scan", jax.jit(lambda x: ctc_loss(x, *ctc_args).sum()),
         (logits,), B),
        ("ctc_fwd_pallas", jax.jit(lambda x: ctc_loss_pallas(x, *ctc_args).sum()),
         (logits,), B),
        ("ctc_grad_scan",
         jax.jit(jax.grad(lambda x: ctc_loss(x, *ctc_args).sum())), (logits,), B),
        ("ctc_grad_pallas",
         jax.jit(jax.grad(lambda x: ctc_loss_pallas(x, *ctc_args).sum())),
         (logits,), B),
        ("ctc_decode_xla", jax.jit(lambda x: ctc_greedy_ids(x, in_lens)),
         (logits,), B),
        ("ctc_decode_pallas",
         jax.jit(lambda x: ctc_greedy_ids_pallas(x, in_lens)), (logits,), B),
    ]

    # encoder self-attention: XLA einsum (materializes [B,H,T,T]) vs Pallas
    # flash (streamed blocks) — the gap widens with T (long clips)
    from lipreading_tpu.ops.flash_attention import (
        _reference_attend,
        flash_attention,
    )

    for Ta in (128, 512, 1024):
        Ba, H, Dh = 8, 4, 64
        qkv = [
            jnp.asarray(rng.normal(0, 1, (Ba, Ta, H, Dh)), jnp.bfloat16)
            for _ in range(3)
        ]
        lens = jnp.asarray(
            rng.integers(Ta // 2, Ta + 1, (Ba,)).astype(np.int32)
        )
        rows.append((
            f"attn_xla_T{Ta}",
            jax.jit(lambda q, k, v, l: _reference_attend(q, k, v, l)),
            (*qkv, lens), Ba * Ta,
        ))
        rows.append((
            f"attn_flash_T{Ta}",
            jax.jit(lambda q, k, v, l: flash_attention(q, k, v, l)),
            (*qkv, lens), Ba * Ta,
        ))
    print(f"{'op':18s} {'ms':>9s} {'items/s':>12s}")
    for name, fn, fargs, items in rows:
        t = Timer(fn).measure(*fargs, reps=reps)
        print(f"{name:18s} {t*1e3:9.3f} {items/t:12.0f}")


if __name__ == "__main__":
    main(sys.argv[1:])
