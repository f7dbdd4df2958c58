"""GRU layers under lax.scan (ref: nn.GRU bidirectional — SURVEY.md §3).

TPU-first structure: the input-side projection for ALL timesteps is one big
[T*B, in] @ [in, 3H] matmul (MXU-friendly), so the sequential scan only
carries the [B, H] @ [H, 3H] recurrence — the minimum serial work a GRU
admits. Gate equations follow the PyTorch/cuDNN variant exactly so the
reference's ``nn.GRU`` state_dicts import bit-compatibly
(train/importer.py):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

Weight layout: w_ih [in, 3H], w_hh [H, 3H], gates ordered (r, z, n) along
the 3H axis (= torch's weight_ih_l{k}.T / weight_hh_l{k}.T row order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lipreading_tpu.models.nn import flip_sequences, uniform_init


def gru_cell_init(key, in_dim: int, hidden: int):
    import math

    ks = jax.random.split(key, 4)
    s = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform_init(ks[0], (in_dim, 3 * hidden), s),
        "w_hh": uniform_init(ks[1], (hidden, 3 * hidden), s),
        "b_ih": uniform_init(ks[2], (3 * hidden,), s),
        "b_hh": uniform_init(ks[3], (3 * hidden,), s),
    }


def gru_cell_step(p, h, x_proj, dtype=None):
    """One step given the precomputed input projection x_proj = x@w_ih+b_ih.

    h: [B, H]; x_proj: [B, 3H]. Returns h'.
    """
    H = h.shape[-1]
    w_hh = p["w_hh"].astype(dtype) if dtype else p["w_hh"]
    b_hh = p["b_hh"].astype(dtype) if dtype else p["b_hh"]
    h_proj = h @ w_hh + b_hh
    xr, xz, xn = x_proj[:, :H], x_proj[:, H:2 * H], x_proj[:, 2 * H:]
    hr, hz, hn = h_proj[:, :H], h_proj[:, H:2 * H], h_proj[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_layer(p, x, h0=None, dtype=None):
    """Unidirectional GRU over [B, T, in] -> [B, T, H] (and final h [B, H])."""
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    w_ih = p["w_ih"].astype(dtype) if dtype else p["w_ih"]
    b_ih = p["b_ih"].astype(dtype) if dtype else p["b_ih"]
    x_proj = x @ w_ih + b_ih                       # [B, T, 3H], one big matmul
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)

    def step(h, xp_t):
        h = gru_cell_step(p, h, xp_t, dtype)
        return h, h

    h_last, ys = jax.lax.scan(step, h0, jnp.moveaxis(x_proj, 1, 0))
    return jnp.moveaxis(ys, 0, 1), h_last


def bigru_init(key, in_dim: int, hidden: int, layers: int):
    """Multi-layer bidirectional GRU parameter pytree."""
    params = []
    for layer in range(layers):
        k_f, k_b, key = jax.random.split(key, 3)
        d = in_dim if layer == 0 else 2 * hidden
        params.append({
            "fwd": gru_cell_init(k_f, d, hidden),
            "bwd": gru_cell_init(k_b, d, hidden),
        })
    return {"layers": params}


def bigru(p, x, lengths, dtype=None, dropout_rng=None, rate=0.0):
    """[B, T, in] + [B] lengths -> [B, T, 2H].

    The backward direction runs on length-aware reversed sequences so padding
    never contaminates valid states (torch pack_padded semantics). Dropout
    (training only) applies between stacked layers, as torch.nn.GRU does.
    """
    from lipreading_tpu.models.nn import dropout

    y = x
    n = len(p["layers"])
    keys = (jax.random.split(dropout_rng, n) if dropout_rng is not None
            else [None] * n)
    for i, lp in enumerate(p["layers"]):
        if i > 0:
            y = dropout(keys[i - 1], y, rate,
                        deterministic=dropout_rng is None)
        f, _ = gru_layer(lp["fwd"], y, dtype=dtype)
        rev = flip_sequences(y, lengths)
        b, _ = gru_layer(lp["bwd"], rev, dtype=dtype)
        b = flip_sequences(b, lengths)
        y = jnp.concatenate([f, b], axis=-1)
    return y
