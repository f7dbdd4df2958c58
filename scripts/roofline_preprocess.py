#!/usr/bin/env python
"""Preprocess roofline: bytes-moved model vs measured per-stage time
(VERDICT r3 #9 — "show how close the ERT/ROI kernels run to memory-bound
peak, or find headroom").

Methodology (matters on this box): a single dispatch+readback through the
axon tunnel costs a jittery ~36-42 ms RTT — more than most stages' actual
device time — so single-call timings are floor-dominated garbage. Each
stage is therefore run ITERS times inside ONE jitted lax.scan (a one-element
perturbation of its smallest operand carries a data dependency between
iterations so XLA cannot hoist the work out of the loop), at two iteration
counts; the per-iteration time is the slope (t_hi - t_lo)/(hi - lo), which
cancels the constant RTT exactly.

For each stage of the ERT-path preprocess (grayscale -> detector -> ERT
cascade -> fused ROI) this prints: ms/iter, frames/s, the analytic
bytes-moved per frame (HBM reads+writes of the stage's real operands,
weights amortized over the batch), the achieved GB/s and % of HBM peak,
and the achieved GFLOP/s and % of MXU fp32 peak.

Plus two synthetic bounds:

  gather10     ten SEQUENTIAL dependent [N,128]-from-[N,25600] gathers
               (the cascade's per-stage pool gather and its dependency
               chain, with everything else stripped away)
  copy         a pure HBM stream (read+write [N,160,160] f32, the array
               itself is the scan carry) — the measured achievable
               bandwidth on this chip

Usage: python scripts/roofline_preprocess.py [frames=2048] [reps=5]
                                             [lo=8] [hi=72]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import PreprocessConfig, parse_overrides  # noqa: E402

HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s (public spec)


def main(argv):
    args = parse_overrides(argv)
    n = int(args.get("frames", 2048))
    reps = int(args.get("reps", 5))
    lo, hi = int(args.get("lo", 8)), int(args.get("hi", 72))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lipreading_tpu.flops import device_peak_flops
    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops import roi as roi_ops
    from lipreading_tpu.ops.detector import detect, params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax, predict_batch
    from lipreading_tpu.ops.preprocess import (
        make_preprocessor,
        mouth_boxes_from_landmarks,
    )
    from lipreading_tpu.preproc_training import load_assets
    from lipreading_tpu.profiling import Timer

    pre = PreprocessConfig()
    H = W = 160
    R = pre.roi_size
    S, P = pre.ert_cascades, pre.ert_pool
    K, nl = pre.ert_trees, 2 ** pre.ert_depth

    print(f"backend={jax.default_backend()} frames={n} reps={reps} "
          f"iters={lo}/{hi}", flush=True)
    mxu_peak = device_peak_flops("float32") or 98.5e12

    det_np, ert_np = load_assets()
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    base = make_clip(100).frames
    frames = np.tile(base, (-(-n // base.shape[0]), 1, 1, 1))[:n]
    fj = jnp.asarray(frames)

    gray = jax.jit(roi_ops.grayscale)(fj)
    boxes = jax.jit(lambda g: detect(det, g))(gray)
    lms = jax.jit(lambda g, b: predict_batch(ert, g, b))(gray, boxes)
    mouth = jax.jit(
        lambda l: mouth_boxes_from_landmarks(l, pre.roi_margin, H, W))(lms)
    jax.block_until_ready((gray, boxes, lms, mouth))

    # dispatch+readback floor, for the report (not subtracted — the
    # differential method cancels it)
    gfloor = jax.jit(lambda a: a.ravel()[0])
    floor = Timer(lambda a: float(gfloor(a))).measure(gray, reps=10)
    print(f"dispatch+readback floor: {floor * 1e3:.1f} ms/call "
          "(cancelled by differential timing below)", flush=True)

    def perturb(x, c):
        """One-element data dependency on the scan carry. The perturbed
        operand must feed ALL of the stage's downstream compute, else XLA's
        loop-invariant code motion can hoist the work out of the scan.
        Perturbing a pytree touches its first leaf only."""
        leaves, treedef = jax.tree_util.tree_flatten(x)
        l0 = leaves[0]
        idx = (0,) * l0.ndim
        leaves[0] = l0.at[idx].add((c * 1e-20).astype(l0.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def chained_sec(fn, xs, pi, cow_bytes=0.0, copy_bw=None):
        """Per-iteration seconds of fn(*xs), fn run `iters` times inside one
        jit with xs[pi] perturbed by the carry each iteration. When the
        perturbed operand is large and loop-invariant, XLA copies it each
        iteration (copy-on-write); pass cow_bytes (read+write) and the
        measured copy bandwidth to subtract that chain artifact."""
        def total(iters):
            @jax.jit
            def run(*a):
                def body(c, _):
                    aa = list(a)
                    aa[pi] = perturb(aa[pi], c)
                    o = fn(*aa)
                    leaf = jax.tree_util.tree_leaves(o)[0]
                    return jnp.asarray(leaf, jnp.float32).ravel()[0] * 1e-20, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
                return c
            return Timer(lambda *a: float(run(*a))).measure(*xs, reps=reps)
        sec = (total(hi) - total(lo)) / (hi - lo)
        if cow_bytes and copy_bw:
            sec = max(sec - cow_bytes / copy_bw, 1e-9)
        return sec

    # --- per-frame bytes-moved models (f32 unless noted) ----------------
    f4 = 4.0
    by = {
        # read u8 RGB, write f32 luma
        "grayscale": H * W * 3 + H * W * f4,
        # read luma; write 64x64 resize + conv trunk activations
        "detector": H * W * f4 + (64 * 64 + 32 * 32 * 8 + 16 * 16 * 16
                                  + 8 * 8 * 32 + 4) * f4,
        # take mode, per stage: pool gather touches P cache sectors (32 B
        # each, 4 B useful), split values/bits/onehot/delta intermediates;
        # leaves weights ([K*nl,136] f32 x S) amortize over the batch
        "ert_take": S * (P * 32.0 + (2 * K * (nl - 1) + K * nl + 136 + P) * f4)
        + S * K * nl * 136 * f4 / n,
        # matmul mode (TPU default since round 4), lower bound: the image
        # is re-read by the one-hot contraction each stage; the [P,H]/[P,W]
        # selectors and [P,W] rows partially fuse, so real traffic sits
        # between this and +3*P*(H+W) per stage
        "ert_matmul": S * (H * W * f4 + P * f4)
        + S * K * nl * 136 * f4 / n,
        # Pallas path: interp weights built in VMEM (no HBM traffic);
        # read luma, write ROI
        "roi_pallas": H * W * f4 + R * R * f4,
        # XLA path additionally materializes W_y/W_x [R,H]/[R,W] per frame
        "roi_xla": H * W * f4 + R * R * f4 + (R * H + R * W) * f4,
    }
    fl = {
        "grayscale": H * W * 5.0,
        "detector": 2.0 * 64 * H * W + 2.0 * 64 * W * 64
        + 2.0 * 32 * 32 * 9 * 8 + 2.0 * 16 * 16 * 9 * 8 * 16
        + 2.0 * 8 * 8 * 9 * 16 * 32 + 2.0 * 8 * 8 * 32 * 4,
        "ert_take": S * (2.0 * K * nl * 136),
        # matmul mode adds the one-hot contractions: bph,bhw->bpw + the
        # [B,P,W] reduce (2*P*H*W + 2*P*W per frame per stage)
        "ert_matmul": S * (2.0 * K * nl * 136 + 2.0 * P * H * W
                           + 2.0 * P * W),
        "roi_pallas": 2.0 * R * H * W + 2.0 * R * W * R,
        "roi_xla": 2.0 * R * H * W + 2.0 * R * W * R,
    }

    def add(name, sec):
        fps = n / sec
        b = by.get(name)
        f = fl.get(name)
        gbs = fps * b / 1e9 if b else 0.0
        gf = fps * f / 1e9 if f else 0.0
        print(f"{name:>12}: {sec * 1e3:8.2f} ms/iter  {fps:10,.0f} fps"
              + (f"  {b / 1e3:7.1f} KB/f  {gbs:7.1f} GB/s"
                 f" ({100 * gbs * 1e9 / HBM_PEAK:5.2f}% BW)" if b else "")
              + (f"  {gf:8.1f} GFLOP/s ({100 * gf * 1e9 / mxu_peak:5.3f}%"
                 " MXU)" if f else ""), flush=True)

    # measure the achievable stream bandwidth FIRST: it calibrates the
    # copy-on-write correction for stages whose only operand is the big
    # input buffer. Pure stream: the array itself is the scan carry —
    # exactly one read + one write per iteration, no perturbation needed.
    def copy_sec(iters):
        @jax.jit
        def run(a):
            def body(c, _):
                return c * 1.0000001 + 0.5, None
            c, _ = jax.lax.scan(body, a, None, length=iters)
            return c[0, 0, 0]
        return Timer(lambda a: float(run(a))).measure(gray, reps=reps)

    copy_slope = (copy_sec(hi) - copy_sec(lo)) / (hi - lo)
    copy_bw = n * H * W * 8.0 / copy_slope

    # perturb index: an operand that feeds ALL downstream compute. For
    # ert/roi that is the small boxes buffer (cheap CoW); grayscale and the
    # fused pipeline only have the frames buffer, whose per-iteration CoW
    # (read+write of the u8 input) is subtracted at the measured stream BW.
    fj_cow = 2.0 * fj.size  # u8: size == bytes
    add("grayscale", chained_sec(
        roi_ops.grayscale, (fj,), 0, cow_bytes=fj_cow, copy_bw=copy_bw))
    # detect's downstream compute all hangs off the weights: pass the
    # params pytree as the perturbed operand (first leaf, tiny CoW)
    add("detector", chained_sec(
        lambda d, g: detect(d, g), (det, gray), 0))
    for mode in ("take", "matmul"):
        add(f"ert_{mode}", chained_sec(
            lambda g, b, _m=mode: predict_batch(ert, g, b, gather=_m),
            (gray, boxes), 1))
    add("roi_pallas", chained_sec(
        lambda g, b: roi_ops.sample_rois_pallas(g, b, R), (gray, mouth), 1))
    add("roi_xla", chained_sec(
        lambda g, b: roi_ops.sample_rois_xla(g, b, R), (gray, mouth), 1))

    pp = make_preprocessor(det, ert, pre)
    add("full_ert", chained_sec(
        lambda x: pp(x), (fj,), 0, cow_bytes=fj_cow, copy_bw=copy_bw))

    # --- synthetic bounds ----------------------------------------------
    def gather10(g, idx0):
        vals = jnp.take_along_axis(g, idx0, axis=1)
        for _ in range(S - 1):
            # next stage's positions depend on this stage's values: keep
            # the dependency chain, strip everything else
            idx = (idx0 + vals.astype(jnp.int32)) % (H * W)
            vals = jnp.take_along_axis(g, idx, axis=1)
        return vals

    gflat = gray.reshape(n, H * W)
    idx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, H * W, (n, P)), jnp.int32)
    sec = chained_sec(gather10, (gflat, idx0), 1)
    rate = n * P * S / sec
    print(f"{'gather10':>12}: {sec * 1e3:8.2f} ms/iter  "
          f"{n / sec:10,.0f} fps  ({rate / 1e6:,.0f}M gathered elem/s; "
          f"cascade pool-gather floor = {n / sec:,.0f} fps)", flush=True)

    print(f"{'copy':>12}: {copy_slope * 1e3:8.2f} ms/iter  "
          f"{n / copy_slope:10,.0f} fps  "
          f"achieved stream bandwidth {copy_bw / 1e9:,.1f} GB/s "
          f"({100 * copy_bw / HBM_PEAK:.1f}% of 819 GB/s peak)",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
