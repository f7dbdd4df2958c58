"""CTC greedy decode as a Pallas kernel (BASELINE.json:5 "Pallas
beam-search/CTC decode kernels" — the frame-synchronous CTC half; the
label-synchronous beam half is the jitted-scan beam search in ops/decode.py,
and CTC *prefix* beam runs host-side in ops/ctc_beam.py).

Per grid program (one utterance): argmax over the vocab for every frame
(VPU reduction over lanes), collapse repeats / drop blanks, and compact the
kept labels to the front of the output row — all in VMEM, no host round
trip. Compaction uses an in-kernel sequential scatter over time (T is small;
the win is avoiding XLA's sort-based compaction and keeping everything in
one kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lens_ref, logits_ref, ids_ref, outlen_ref, *, blank: int):
    T, V = logits_ref.shape[1:]
    n = lens_ref[pl.program_id(0)]

    logits = logits_ref[0]                                  # [T, V]
    # argmax with first-max tie-break, kept 2-D throughout (TPU vectors)
    mx = jnp.max(logits, axis=1, keepdims=True)             # [T, 1]
    vidx = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
    raw2 = jnp.min(jnp.where(logits == mx, vidx, V), axis=1,
                   keepdims=True).astype(jnp.int32)         # [T, 1]

    tidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    prev = jnp.where(tidx == 0, blank, pltpu.roll(raw2, shift=1, axis=0))
    keep = (raw2 != blank) & (raw2 != prev) & (tidx < n)    # [T, 1]
    keep_i = keep.astype(jnp.int32)
    count = jnp.sum(keep_i)

    # compaction position of each kept frame: exclusive prefix sum, computed
    # as a strictly-lower-triangular matmul (mosaic has no cumsum primitive;
    # [T, T] x [T, 1] is one MXU pass and exact in f32 for T < 2^23)
    ti = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    tri = (tj < ti).astype(jnp.float32)
    pos = jnp.dot(tri, keep.astype(jnp.float32),
                  preferred_element_type=jnp.float32).astype(jnp.int32)

    # scatter-free compaction: out[o] = sum_t raw[t] * [keep[t] & pos[t]==o]
    oidx = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)   # [t, o]
    hit = (pos == oidx) & keep                              # [T, T]
    out_row = jnp.sum(hit.astype(jnp.int32) * raw2, axis=0,
                      keepdims=True)                        # [1, T]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    ids_ref[0] = jnp.where(col < count, out_row, blank)
    outlen_ref[0] = jnp.full((1, outlen_ref.shape[2]), count, jnp.int32)


def ctc_greedy_ids_pallas(
    logits: jnp.ndarray,
    lengths: jnp.ndarray,
    blank: int = 0,
    interpret: bool | None = None,
):
    """[B, T, V] logits + [B] lengths -> (ids [B, T], out_lengths [B])."""
    import functools

    B, T, V = logits.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, V), lambda b, *_: (b, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, T), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0)),
        ],
    )
    ids, outlen = pl.pallas_call(
        functools.partial(_kernel, blank=blank),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), logits.astype(jnp.float32))
    return ids[:, 0, :], outlen[:, 0, 0]
