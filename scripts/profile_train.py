#!/usr/bin/env python
"""Component-level wall-time split of the flagship train step (VERDICT r2
next-step #1: "capture a real trace ... write down the per-op time split").

jax.profiler traces do not survive the axon tunnel (compiles run
terminal-side), so this measures the honest way that does work here: each
component is jitted fwd+bwd in isolation at the exact shapes the full
B=64/T=64 step uses, timed with a forced D2H readback (CLAUDE.md:
dispatch-only timings lie), and compared against its analytic FLOPs
(flops.py, pinned vs XLA cost_analysis) for a per-component MFU.

Usage:  python scripts/profile_train.py [preset=transformer-attn] [B=64]
            [T=64] [reps=20] [key=value ...]

Writes the table to stdout; paste into docs/KERNELS.md when it changes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides, preset  # noqa: E402


def timeit(fn, *args, reps=20):
    out = fn(*args)                 # compile
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    # force a real D2H readback: one transient tunnel state returned
    # dispatch-only timings even under block_until_ready (CLAUDE.md)
    leaves = jax.tree.leaves(out)
    if leaves:
        import numpy as _np

        _np.asarray(leaves[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


def main(argv):
    args = parse_overrides(argv)
    name = args.pop("preset", "transformer-attn")
    B = int(args.pop("B", 64))
    T = int(args.pop("T", 64))
    L = int(args.pop("L", 13))
    reps = int(args.pop("reps", 20))
    cfg = preset(name)
    if args:
        cfg = cfg.override(**args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lipreading_tpu import flops as F
    from lipreading_tpu.models import transformer as tf
    from lipreading_tpu.models.frontend3d import frontend_apply
    from lipreading_tpu.models.lipreader import (
        _act_dtype,
        attention_logits,
        compute_loss,
        cross_entropy_loss,
        ctc_logits,
        init_model,
    )
    from lipreading_tpu.ops.ctc import ctc_loss_best
    from lipreading_tpu.train.loop import make_optimizer

    dtype = _act_dtype(cfg)
    m = cfg.model
    rng = np.random.default_rng(0)
    params = init_model(jax.random.PRNGKey(0), cfg)
    rois = jnp.asarray(rng.standard_normal((B, T, 96, 96), np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    feats = jnp.asarray(
        rng.standard_normal((B, T, m.frontend_dim), np.float32), dtype)
    enc = jnp.asarray(rng.standard_normal((B, T, m.tf_dim), np.float32), dtype)
    targets = jnp.asarray(
        np.pad(rng.integers(3, 30, (B, L)).astype(np.int32),
               ((0, 0), (0, 1))))
    tlen = jnp.full((B,), L, jnp.int32)
    labels = jnp.asarray(rng.integers(3, 30, (B, L + 1)).astype(np.int32))
    llen = jnp.full((B,), L, jnp.int32)
    key = jax.random.PRNGKey(1)

    rows = []

    def row(name, secs, flops3x):
        """flops3x: analytic fwd+bwd(+update) FLOPs for the measured call."""
        mfu = F.mfu(flops3x / secs, m.dtype)
        rows.append((name, secs * 1e3, (mfu or 0.0) * 100))
        print(f"#   {name}: {secs * 1e3:.2f} ms", flush=True)

    # --- full step (fwd + bwd + AdamW), K steps in ONE jitted fori_loop:
    # per-dispatch timing over the axon tunnel is unreliable (CLAUDE.md) ---
    batch = dict(
        rois=rois.astype(dtype), frame_lengths=lengths, targets=targets,
        target_lengths=tlen + 2, ctc_labels=labels, ctc_lengths=llen,
    )
    tx0 = make_optimizer(cfg)
    opt0f = tx0.init(params)

    def one_step(p, o, k):
        (loss, _), grads = jax.value_and_grad(
            lambda q: compute_loss(q, cfg, batch, train=True, rng=k),
            has_aux=True)(p)
        updates, o = tx0.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def run_full(p, o):
        def body(i, carry):
            p, o, _ = carry
            return one_step(p, o, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, reps, body, (p, o, jnp.zeros(())))

    _, _, fl = run_full(params, opt0f)
    jax.block_until_ready(fl)
    t0 = time.perf_counter()
    _, _, fl = run_full(params, opt0f)
    float(fl)                                              # real D2H
    t_full = (time.perf_counter() - t0) / reps
    row("full step", t_full, 3 * B * F.model_fwd_flops(cfg, T, L))

    # --- frontend fwd+bwd (remat adds an extra fwd in bwd: 4x fwd total) ---
    fr_mult = 4 if cfg.train.remat else 3

    if m.frontend == "patchify":
        from lipreading_tpu.models.frontend3d import patchify_apply

        def _fe_apply(q, r):
            return patchify_apply(q, r, m, dtype)
    else:
        def _fe_apply(q, r):
            return frontend_apply(q, r, dtype)

    @jax.jit
    def frontend_fb(fp, r):
        def loss(q):
            return _fe_apply(q, r).astype(jnp.float32).sum()

        if cfg.train.remat:
            loss = jax.checkpoint(loss)
        return jax.grad(loss)(fp)

    t = timeit(frontend_fb, params["frontend"], rois.astype(dtype), reps=reps)
    row("frontend fwd+bwd", t, fr_mult * B * F.frontend_flops(cfg, T))

    # --- encoder fwd+bwd from features ---
    if cfg.encoder == "transformer":
        @jax.jit
        def enc_fb(ep, f):
            def loss(q):
                return tf.encoder_apply(
                    q, f, lengths, m.tf_heads, dtype=dtype,
                    flash=m.flash_attention,
                ).astype(jnp.float32).sum()

            return jax.grad(loss)(ep)

        t = timeit(enc_fb, params["encoder"], feats, reps=reps)
        row("encoder fwd+bwd", t,
            3 * B * F.transformer_encoder_flops(cfg, T))

        # --- attention decoder fwd+bwd from enc states ---
        if cfg.decoder in ("attention", "hybrid"):
            @jax.jit
            def dec_fb(dp, e):
                def loss(q):
                    att = tf.decoder_apply(q, targets[:, :-1], e, lengths,
                                           m.tf_heads, dtype=dtype)
                    return cross_entropy_loss(att, targets[:, 1:], tlen + 2)

                return jax.grad(loss)(dp)

            t = timeit(dec_fb, params["att_decoder"], enc, reps=reps)
            row("decoder fwd+bwd", t,
                3 * B * F.transformer_decoder_flops(cfg, T, L))

    # --- CTC head + loss fwd+bwd from enc states ---
    if cfg.decoder in ("ctc", "hybrid"):
        @jax.jit
        def ctc_fb(hp, e):
            def loss(q):
                lg = ctc_logits({"ctc_head": hp}, e)
                return ctc_loss_best(lg, labels, lengths, llen).mean()

            return jax.grad(loss)(hp)

        t = timeit(ctc_fb, params["ctc_head"], enc, reps=reps)
        row("ctc head+loss fwd+bwd", t, 3 * B * F.ctc_head_flops(cfg, T))

    # --- optimizer update alone ---
    tx = make_optimizer(cfg)
    opt0 = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt_fb(g, o, p):
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o

    t = timeit(opt_fb, grads, opt0, params, reps=reps)
    row("optimizer (AdamW)", t, 0.0)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# {cfg.name}  B={B} T={T} L={L}  params={n_params/1e6:.1f}M  "
          f"dtype={m.dtype}  backend={jax.default_backend()}")
    print(f"{'component':<26} {'ms':>8} {'MFU %':>7} {'% of step':>10}")
    t_full_ms = rows[0][1]
    for name, ms, mfu in rows:
        print(f"{name:<26} {ms:8.2f} {mfu:7.1f} {100 * ms / t_full_ms:9.1f}%")
    parts = sum(ms for name, ms, _ in rows[1:])
    print(f"{'sum of parts':<26} {parts:8.2f} {'':>7} "
          f"{100 * parts / t_full_ms:9.1f}%")


if __name__ == "__main__":
    main(sys.argv[1:])
