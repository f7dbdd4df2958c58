"""GPipe-style pipeline parallelism for the transformer encoder.

The third exclusive use of the mesh ``model`` axis (after tensor parallelism
and ring/sequence parallelism): encoder LAYERS are split into contiguous
stages over the axis, the batch is split into microbatches, and activations
flow stage-to-stage over the ICI ring (``jax.lax.ppermute``) on a classic
GPipe fill/drain schedule (M + S - 1 ticks, bubble fraction (S-1)/(M+S-1)).

TPU-first design notes (how this maps to the hardware, not a port of any
NCCL send/recv pipeline):

* One ``shard_map`` over the (data, model) mesh runs DP x PP in a single
  SPMD program. Every stage executes the same code each tick; stage
  identity is ``lax.axis_index``, so XLA compiles ONE program, not S.
* The schedule is a ``lax.scan`` over ticks — compiler-friendly static
  control flow; the only collective is a neighbour ``ppermute`` per tick,
  which rides ICI (plus one masked ``psum`` to broadcast the final
  outputs off the last stage).
* Autodiff of the scan gives the backward pipeline for free: gradients
  ppermute in reverse stage order (ppermute's transpose is the inverse
  permutation), so fwd+bwd is the standard GPipe schedule without any
  hand-written backward.
* Stage arithmetic reuses models.transformer.mha/mlp verbatim — the
  CPU-mesh test pins pipeline == unsharded encoder (eval) to float
  tolerance, and grads likewise.

As with sequence parallelism, params stay REPLICATED over the pipe axis
(storage-wise); each stage's shard_map in_spec slices only its own layers,
so per-stage compute and activation residency shard while checkpoints,
importer, and decode paths keep the canonical layout.

Ref: SURVEY.md §3 parallelism table ("keep mesh-axis plumbing generic");
GPipe (1811.06965) schedule, re-expressed as scan + ppermute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lipreading_tpu.models import nn
from lipreading_tpu.models import transformer as tf


def stack_layer_params(layers):
    """List of per-layer param dicts -> one pytree with leading dim L."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _stage_apply(slab, h, mask, lengths, heads: int, dtype, keys, rate: float,
                 flash: bool = False, flash_bwd: str = "auto"):
    """Apply this stage's layers (slab leaves are [L_local, ...]) to h.

    Arithmetic is models.transformer.encoder_apply's loop body verbatim
    (pre-LN attn + MLP residual blocks) so pipeline == unsharded holds.
    ``flash=True`` streams attention through the Pallas flash kernel
    (cfg.model.flash_attention) instead of materializing [mb, H, T, T].
    """
    n_local = jax.tree.leaves(slab)[0].shape[0]
    for i in range(n_local):
        lp = jax.tree.map(lambda a: a[i], slab)
        hn = nn.layernorm(lp["ln1"], h)
        if flash:
            attn = tf.mha_flash(lp["attn"], hn, lengths, heads, dtype,
                                bwd=flash_bwd)
        else:
            attn = tf.mha(lp["attn"], hn, hn, mask, heads, dtype)
        h = h + nn.dropout(keys[2 * i], attn, rate,
                           deterministic=keys[2 * i] is None)
        ff = tf.mlp(lp["mlp"], nn.layernorm(lp["ln2"], h), dtype)
        h = h + nn.dropout(keys[2 * i + 1], ff, rate,
                           deterministic=keys[2 * i + 1] is None)
    return h


def pipeline_encoder_apply(params, x, lengths, heads: int, mesh: Mesh,
                           axis: str = "model", dtype=None,
                           data_axis: str | None = "data",
                           microbatches: int = 0,
                           dropout_rng=None, rate: float = 0.0,
                           flash: bool = False, flash_bwd: str = "auto"):
    """Pipeline-parallel transformer encoder: [B, T, in] -> [B, T, tf_dim].

    ``axis`` (size S) carries the stages: tf_layers must divide by S and the
    per-data-shard batch by ``microbatches`` (default S). The projection and
    final LayerNorm are positionwise and run outside the pipeline body under
    plain GSPMD. When the mesh also carries ``data_axis``, DP x PP composes
    in one shard_map (the training layout under cfg.mesh.pipeline_parallel).

    Training dropout derives per-(stage, tick) keys by folding indices into
    ``dropout_rng`` — independent masks per layer/microbatch, not
    bit-identical to the unsharded encoder's masks (eval is exact).
    """
    S = mesh.shape[axis]
    L = len(params["layers"])
    assert L % S == 0, f"tf_layers={L} not divisible by pipe stages {S}"
    B, T, _ = x.shape
    da = data_axis if (data_axis and mesh.shape.get(data_axis, 1) > 1
                       and B % mesh.shape[data_axis] == 0) else None
    Bl = B // (mesh.shape[da] if da else 1)
    M = microbatches or S
    assert Bl % M == 0, f"local batch {Bl} not divisible by microbatches {M}"
    mb = Bl // M
    L_local = L // S
    train = dropout_rng is not None and rate > 0.0

    # positionwise pre/post stay outside the pipeline (no communication)
    h0 = nn.dense(params["proj"], x, dtype)
    h0 = h0 + params["pos"][:T][None].astype(h0.dtype)
    stacked = stack_layer_params(params["layers"])

    def fn(slab, hb, ln, *rng_args):
        s = jax.lax.axis_index(axis)
        # hb/ln enter varying over the data axis only (their in_specs do not
        # mention the pipe axis); promote over the pipe axis so the schedule
        # state mixes cleanly with stage-varying values
        x_mb = jax.lax.pcast(hb.reshape(M, mb, T, hb.shape[-1]), (axis,),
                             to="varying")
        len_mb = jax.lax.pcast(ln.reshape(M, mb), (axis,), to="varying")
        buf0 = jnp.zeros_like(x_mb[0])
        ys0 = jnp.zeros_like(x_mb)

        def tick(carry, t):
            buf, ys = carry
            inj = x_mb[jnp.clip(t, 0, M - 1)]
            buf = jnp.where(s == 0, inj, buf)
            mb_idx = jnp.clip(t - s, 0, M - 1)
            l_cur = len_mb[mb_idx]                       # [mb]
            mask = (None if flash
                    else nn.length_mask(l_cur, T)[:, None, None, :])
            if train:
                k = jax.random.fold_in(jax.random.fold_in(rng_args[0], s), t)
                if da is not None:
                    # decorrelate dropout across data-parallel shards (same
                    # fold as parallel/ring.py) — without this every DP shard
                    # applies bit-identical masks to the same microbatch slot
                    k = jax.random.fold_in(k, jax.lax.axis_index(da))
                keys = list(jax.random.split(k, 2 * L_local))
            else:
                keys = [None] * (2 * L_local)
            out = _stage_apply(slab, buf, mask, l_cur, heads, dtype, keys,
                               rate, flash=flash, flash_bwd=flash_bwd)
            o_idx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(ys, o_idx, 0, keepdims=False)
            rec = jnp.where(t >= S - 1, out, prev)
            ys = jax.lax.dynamic_update_index_in_dim(ys, rec, o_idx, 0)
            perm = [(i, (i + 1) % S) for i in range(S)]
            buf = jax.lax.ppermute(out, axis, perm)
            return (buf, ys), None

        (_, ys), _ = jax.lax.scan(
            tick, (buf0, ys0), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; masked psum broadcasts
        # them across the pipe axis (one ICI collective)
        ys = jnp.where(s == S - 1, ys, jnp.zeros_like(ys))
        ys = jax.lax.psum(ys, axis)
        return ys.reshape(Bl, T, ys.shape[-1])

    in_specs = [P(axis), P(da, None, None), P(da)]
    args = [stacked, h0, lengths]
    if train:
        in_specs.append(P())
        args.append(dropout_rng)
    out = jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(da, None, None),
        # the Pallas interpreter (CPU fallback) mixes varying and unvaried
        # values in its internal dynamic_slice, which check_vma rejects;
        # vma checking stays on for the dense path
        check_vma=not flash,
    )(*args)
    return nn.layernorm(params["ln_out"], out)
