#!/usr/bin/env python
"""Long-T flash-attention sweep: fwd+bwd time vs block size (VERDICT r2 #9).

Times the Pallas flash kernels (ops/flash_attention.py) at long sequence
lengths where the einsum backward cannot compile (B*H*T^2 grad buffers blow
HBM), across block sizes. K training steps run inside ONE jitted fori_loop
so the axon tunnel's dispatch latency cannot pollute the timing (CLAUDE.md
measurement gotcha), and the result is read back to host (D2H-forced).

Usage: python scripts/bench_flash.py [T=8192,16384] [blocks=256,512]
       [reps=3] [bwd=pallas,fused]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv):
    args = dict(a.split("=", 1) for a in argv)
    Ts = [int(t) for t in args.get("T", "8192,16384").split(",")]
    blocks = [int(b) for b in args.get("blocks", "256,512").split(",")]
    reps = int(args.get("reps", "3"))
    bwds = args.get("bwd", "pallas,fused").split(",")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lipreading_tpu.ops.flash_attention import flash_attention

    B, H, Dh = 2, 8, 64
    rng = np.random.default_rng(0)
    print(f"{'T':>6s} {'block':>6s} {'bwd':>7s} {'fwd ms':>9s} "
          f"{'fwd+bwd ms':>11s}")
    for T in Ts:
        qkv = [jnp.asarray(rng.normal(0, 1, (B, T, H, Dh)), jnp.bfloat16)
               for _ in range(3)]
        lens = jnp.asarray(rng.integers(T // 2, T + 1, (B,)).astype(np.int32))
        for blk, bwd in [(b, w) for b in blocks for w in bwds]:
            def fwd(q, k, v):
                return flash_attention(q, k, v, lens, blk, blk,
                                       bwd=bwd).sum()

            def step(q, k, v):
                l, grads = jax.value_and_grad(fwd, argnums=(0, 1, 2))(q, k, v)
                return l, grads

            def timed(fn, *a):
                out = jax.block_until_ready(fn(*a))     # compile + warm
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(*a)
                jax.block_until_ready(out)
                # force a real D2H readback: one axon session returned
                # dispatch-only timings even under block_until_ready
                float(jax.tree_util.tree_leaves(out)[0].sum())
                return (time.perf_counter() - t0) / reps * 1e3

            t_f = timed(jax.jit(lambda q, k, v: fwd(q, k, v)), *qkv)
            t_fb = timed(jax.jit(step), *qkv)
            print(f"{T:6d} {blk:6d} {bwd:>7s} {t_f:9.2f} {t_fb:11.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
