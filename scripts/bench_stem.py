#!/usr/bin/env python
"""Train-step throughput of the conv3d vs patchify frontends (round-3 MFU
work; BASELINE.md round-3 profile row).

Times K full train steps (fwd + bwd + AdamW) inside ONE jitted
lax.fori_loop, so the measurement is immune to the axon tunnel's dispatch
noise (CLAUDE.md: the tunnel sometimes returns dispatch-only or
seconds-inflated timings per call; a single dispatch running K real steps
amortizes both). On a real host the per-step dispatch this hides is
microseconds.

Usage: python scripts/bench_stem.py [B=64] [T=64] [K=10] [stems=conv3d,patchify]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides, preset  # noqa: E402


def bench_stem(stem: str, B: int, T: int, L: int, K: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lipreading_tpu import flops as F
    from lipreading_tpu.models.lipreader import compute_loss, init_model
    from lipreading_tpu.train.loop import make_optimizer

    cfg = preset("transformer-attn")
    cfg.model.frontend = stem
    params = init_model(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    batch = dict(
        rois=jnp.asarray(rng.standard_normal((B, T, 96, 96)), dtype),
        frame_lengths=jnp.full((B,), T, jnp.int32),
        targets=jnp.asarray(np.pad(
            rng.integers(3, 30, (B, L)).astype(np.int32), ((0, 0), (0, 1)))),
        target_lengths=jnp.full((B,), L, jnp.int32),
        ctc_labels=jnp.asarray(rng.integers(3, 30, (B, L + 1)).astype(np.int32)),
        ctc_lengths=jnp.full((B,), L, jnp.int32),
    )
    key = jax.random.PRNGKey(1)

    def one_step(p, o, k):
        (loss, _), grads = jax.value_and_grad(
            lambda q: compute_loss(q, cfg, batch, train=True, rng=k),
            has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def run(p, o):
        def body(i, carry):
            p, o, _ = carry
            return one_step(p, o, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, (p, o, jnp.zeros(())))

    p2, o2, loss = run(params, opt)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    _, _, loss = run(params, opt)
    loss_v = float(loss)                            # force real D2H
    dt = (time.perf_counter() - t0) / K
    step_flops = F.train_step_flops(cfg, B, T, L)
    m = F.mfu(step_flops / dt, cfg.model.dtype)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    return dict(stem=stem, ms_per_step=dt * 1e3, fps=B * T / dt,
                mfu=m, loss=loss_v, params_m=n_params / 1e6)


def main(argv):
    args = parse_overrides(argv)
    B = int(args.pop("B", 64))
    T = int(args.pop("T", 64))
    L = int(args.pop("L", 13))
    K = int(args.pop("K", 10))
    stems = args.pop("stems", "conv3d,patchify").split(",")
    for stem in stems:
        r = bench_stem(stem, B, T, L, K)
        mfu = f"{r['mfu'] * 100:.1f}%" if r["mfu"] else "n/a"
        print(f"{stem:<10} {r['ms_per_step']:8.2f} ms/step  "
              f"{r['fps']:9.0f} fps  MFU {mfu}  "
              f"({r['params_m']:.1f}M params, loss {r['loss']:.3f})",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
