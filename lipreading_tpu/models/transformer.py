"""Transformer encoder-decoder (ref: nn.Transformer-style path — SURVEY.md §3;
"Deep Lip Reading: a comparison of models" 1806.06053 design space).

Pre-LN blocks, multi-head attention as einsums (MXU-shaped: heads folded into
one [B, T, H*Dh] projection), sinusoidal positions, fp32 softmax under bf16
activations. Decoder exposes both a full teacher-forced pass (training: one
fused program, causal mask, no step loop) and an incremental single-step with
KV cache (inference: used by greedy/beam decoding in ops/decode.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from lipreading_tpu.config import ModelConfig
from lipreading_tpu.models import nn


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    i = np.arange(dim // 2)[None, :]
    angle = pos / np.power(10000.0, 2 * i / dim)
    out = np.zeros((max_len, dim), np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return out


def mha_init(key, dim: int, heads: int):
    ks = jax.random.split(key, 4)
    return {
        "q": nn.dense_init(ks[0], dim, dim),
        "k": nn.dense_init(ks[1], dim, dim),
        "v": nn.dense_init(ks[2], dim, dim),
        "o": nn.dense_init(ks[3], dim, dim),
    }


def mha(p, q_in, kv_in, mask, heads: int, dtype=None):
    """mask: [B, 1, Tq, Tk] additive-legal boolean (True = attend)."""
    H = heads
    B, Tq, D = q_in.shape
    Tk = kv_in.shape[1]
    Dh = D // H
    q = nn.dense(p["q"], q_in, dtype).reshape(B, Tq, H, Dh)
    k = nn.dense(p["k"], kv_in, dtype).reshape(B, Tk, H, Dh)
    v = nn.dense(p["v"], kv_in, dtype).reshape(B, Tk, H, Dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
    scores = jnp.where(mask, scores.astype(jnp.float32), -1e30)
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Tq, D)
    return nn.dense(p["o"], out, dtype)


def mha_flash(p, x, lengths, heads: int, dtype=None, bwd: str = "auto"):
    """Encoder self-attention through the Pallas flash kernel: identical
    projections to mha(), the softmax/weighted-sum core streamed blockwise
    (ops/flash_attention.py) so [B, H, T, T] never materializes.
    ``bwd`` selects the backward policy (cfg.model.flash_bwd)."""
    from lipreading_tpu.ops.flash_attention import flash_attention

    B, T, D = x.shape
    Dh = D // heads
    q = nn.dense(p["q"], x, dtype).reshape(B, T, heads, Dh)
    k = nn.dense(p["k"], x, dtype).reshape(B, T, heads, Dh)
    v = nn.dense(p["v"], x, dtype).reshape(B, T, heads, Dh)
    out = flash_attention(q, k, v, lengths, bwd=bwd).reshape(B, T, D)
    return nn.dense(p["o"], out, dtype)


def mlp_init(key, dim: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {"in": nn.dense_init(k1, dim, hidden), "out": nn.dense_init(k2, hidden, dim)}


def mlp(p, x, dtype=None):
    return nn.dense(p["out"], jax.nn.gelu(nn.dense(p["in"], x, dtype)), dtype)


def encoder_layer_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 2)
    return {
        "ln1": nn.layernorm_init(cfg.tf_dim),
        "attn": mha_init(ks[0], cfg.tf_dim, cfg.tf_heads),
        "ln2": nn.layernorm_init(cfg.tf_dim),
        "mlp": mlp_init(ks[1], cfg.tf_dim, cfg.tf_mlp),
    }


def decoder_layer_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 3)
    return {
        "ln1": nn.layernorm_init(cfg.tf_dim),
        "self": mha_init(ks[0], cfg.tf_dim, cfg.tf_heads),
        "ln2": nn.layernorm_init(cfg.tf_dim),
        "cross": mha_init(ks[1], cfg.tf_dim, cfg.tf_heads),
        "ln3": nn.layernorm_init(cfg.tf_dim),
        "mlp": mlp_init(ks[2], cfg.tf_dim, cfg.tf_mlp),
    }


def encoder_init(key, cfg: ModelConfig, in_dim: int):
    ks = jax.random.split(key, cfg.tf_layers + 1)
    return {
        "proj": nn.dense_init(ks[0], in_dim, cfg.tf_dim),
        "layers": [encoder_layer_init(ks[i + 1], cfg) for i in range(cfg.tf_layers)],
        "ln_out": nn.layernorm_init(cfg.tf_dim),
        "pos": jnp.asarray(sinusoidal_positions(1024, cfg.tf_dim)),
    }


def encoder_apply(p, x, lengths, heads: int, dtype=None,
                  dropout_rng=None, rate=0.0, flash: bool = False,
                  flash_bwd: str = "auto"):
    """[B, T, in] -> [B, T, tf_dim]; self-attention masked to valid frames.

    ``flash=True`` streams the attention core through the Pallas flash
    kernel (cfg.model.flash_attention) — same math, O(T·Dh) memory;
    ``flash_bwd`` picks its backward policy (cfg.model.flash_bwd)."""
    B, T, _ = x.shape
    det = dropout_rng is None

    def drop(k, v):
        return nn.dropout(k, v, rate, deterministic=det)

    keys = (jax.random.split(dropout_rng, 2 * len(p["layers"]))
            if not det else [None] * (2 * len(p["layers"])))
    h = nn.dense(p["proj"], x, dtype)
    h = h + p["pos"][:T][None].astype(h.dtype)
    valid = nn.length_mask(lengths, T)                     # [B, T]
    mask = valid[:, None, None, :]                         # [B, 1, 1(Tq), Tk]
    for i, lp in enumerate(p["layers"]):
        hn = nn.layernorm(lp["ln1"], h)
        attn = (mha_flash(lp["attn"], hn, lengths, heads, dtype,
                          bwd=flash_bwd) if flash
                else mha(lp["attn"], hn, hn, mask, heads, dtype))
        h = h + drop(keys[2 * i], attn)
        h = h + drop(keys[2 * i + 1],
                     mlp(lp["mlp"], nn.layernorm(lp["ln2"], h), dtype))
    return nn.layernorm(p["ln_out"], h)


def decoder_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, cfg.tf_dec_layers + 2)
    return {
        "embed": nn.embedding_init(ks[0], cfg.vocab_size, cfg.tf_dim),
        "layers": [
            decoder_layer_init(ks[i + 1], cfg) for i in range(cfg.tf_dec_layers)
        ],
        "ln_out": nn.layernorm_init(cfg.tf_dim),
        "out": nn.dense_init(ks[-1], cfg.tf_dim, cfg.vocab_size),
        "pos": jnp.asarray(sinusoidal_positions(1024, cfg.tf_dim)),
    }


def decoder_apply(p, targets_in, enc, enc_lengths, heads: int, dtype=None,
                  dropout_rng=None, rate=0.0):
    """Teacher-forced pass: [B, L] ids -> [B, L, V] next-token logits."""
    B, L = targets_in.shape
    T = enc.shape[1]
    det = dropout_rng is None

    def drop(k, v):
        return nn.dropout(k, v, rate, deterministic=det)

    keys = (jax.random.split(dropout_rng, 3 * len(p["layers"]))
            if not det else [None] * (3 * len(p["layers"])))
    h = nn.embedding(p["embed"], targets_in, dtype) * math.sqrt(enc.shape[-1])
    h = h + p["pos"][:L][None].astype(h.dtype)
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]  # [1, 1, L, L]
    enc_mask = nn.length_mask(enc_lengths, T)[:, None, None, :]
    for i, lp in enumerate(p["layers"]):
        hn = nn.layernorm(lp["ln1"], h)
        h = h + drop(keys[3 * i], mha(lp["self"], hn, hn, causal, heads, dtype))
        h = h + drop(keys[3 * i + 1],
                     mha(lp["cross"], nn.layernorm(lp["ln2"], h), enc,
                         enc_mask, heads, dtype))
        h = h + drop(keys[3 * i + 2],
                     mlp(lp["mlp"], nn.layernorm(lp["ln3"], h), dtype))
    h = nn.layernorm(p["ln_out"], h)
    return nn.dense(p["out"], h, dtype).astype(jnp.float32)


def decoder_init_cache(p, batch: int, max_len: int, heads: int,
                       dtype=jnp.float32):
    """KV cache pytree for incremental decoding.

    Every leaf is batch-leading so beam search can gather/tile beams with a
    uniform tree_map (ops/decode.py); ``pos`` is a per-sample vector (always
    uniform — decoding is in lockstep — but batch-leading by construction).
    """
    dim = p["embed"]["table"].shape[1]
    dh = dim // heads
    return {
        "layers": [
            {
                "k": jnp.zeros((batch, max_len, heads, dh), dtype),
                "v": jnp.zeros((batch, max_len, heads, dh), dtype),
            }
            for _ in p["layers"]
        ],
        "pos": jnp.zeros((batch,), jnp.int32),
    }


def decoder_cross_kv(p, enc, heads: int, dtype=None):
    """Precompute per-layer cross-attention K/V from the encoder output.

    Cross K/V depend only on ``enc``, which is constant across decode steps
    — recomputing them inside the step loop was the decode path's FLOP hog
    (per step, per layer: two [B, T, D] x [D, D] projections; at B*W=256,
    T=64, D=256, 4 layers that is ~17 GFLOP per step, ~50x the step's
    useful work). Hoisting them out makes each step O(T*D) instead of
    O(T*D^2). Returns a list of {"k", "v"} leaves [B, T, H, Dh]; rows are
    identical across the beams of one sample (enc is tiled by repeat), so
    beam search never needs to gather them — pass as a closed-over constant.
    """
    B, T, D = enc.shape
    dh = D // heads
    out = []
    for lp in p["layers"]:
        cp = lp["cross"]
        out.append({
            "k": nn.dense(cp["k"], enc, dtype).reshape(B, T, heads, dh),
            "v": nn.dense(cp["v"], enc, dtype).reshape(B, T, heads, dh),
        })
    return out


def decoder_step(p, cache, token, enc, enc_lengths, heads: int, dtype=None,
                 cross_kv=None):
    """Incremental single step: token [B] -> (cache', logits [B, V]).

    Self-attention reads/writes the KV cache at the current position.
    ``cross_kv`` (from :func:`decoder_cross_kv`) supplies precomputed
    cross-attention K/V; when None they are recomputed from ``enc`` each
    step (identical arithmetic, V-fold more FLOPs — kept for callers
    without a hoisting site).
    """
    B = token.shape[0]
    T = enc.shape[1]
    dim = p["embed"]["table"].shape[1]
    dh = dim // heads
    pos = cache["pos"][0]                                   # lockstep scalar
    maxlen = cache["layers"][0]["k"].shape[1]

    h = nn.embedding(p["embed"], token, dtype) * math.sqrt(enc.shape[-1])
    h = h + jax.lax.dynamic_index_in_dim(
        p["pos"], pos, axis=0, keepdims=False
    ).astype(h.dtype)
    h = h[:, None, :]                                      # [B, 1, D]
    enc_mask = nn.length_mask(enc_lengths, T)[:, None, None, :]
    new_layers = []
    pos_mask = (jnp.arange(maxlen) <= pos)[None, None, None, :]  # [1,1,1,maxlen]

    for li, (lp, lc) in enumerate(zip(p["layers"], cache["layers"])):
        hn = nn.layernorm(lp["ln1"], h)                    # [B, 1, D]
        sp = lp["self"]
        q = nn.dense(sp["q"], hn, dtype).reshape(B, 1, heads, dh)
        k_t = nn.dense(sp["k"], hn, dtype).reshape(B, heads, dh)
        v_t = nn.dense(sp["v"], hn, dtype).reshape(B, heads, dh)
        k_all = jax.lax.dynamic_update_index_in_dim(
            lc["k"], k_t.astype(lc["k"].dtype), pos, axis=1
        )
        v_all = jax.lax.dynamic_update_index_in_dim(
            lc["v"], v_t.astype(lc["v"].dtype), pos, axis=1
        )
        new_layers.append({"k": k_all, "v": v_all})
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_all.astype(q.dtype)
        ) / math.sqrt(dh)
        scores = jnp.where(pos_mask, scores.astype(jnp.float32), -1e30)
        w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v_all.astype(q.dtype))
        h = h + nn.dense(sp["o"], attn.reshape(B, 1, dim), dtype)
        if cross_kv is None:
            h = h + mha(lp["cross"], nn.layernorm(lp["ln2"], h), enc,
                        enc_mask, heads, dtype)
        else:
            cp = lp["cross"]
            hn2 = nn.layernorm(lp["ln2"], h)
            qc = nn.dense(cp["q"], hn2, dtype).reshape(B, 1, heads, dh)
            kc, vc = cross_kv[li]["k"], cross_kv[li]["v"]
            sc = jnp.einsum("bqhd,bkhd->bhqk", qc, kc.astype(qc.dtype))
            sc = sc / math.sqrt(dh)
            sc = jnp.where(enc_mask, sc.astype(jnp.float32), -1e30)
            wc = jax.nn.softmax(sc, axis=-1).astype(qc.dtype)
            ac = jnp.einsum("bhqk,bkhd->bqhd", wc, vc.astype(qc.dtype))
            h = h + nn.dense(cp["o"], ac.reshape(B, 1, dim), dtype)
        h = h + mlp(lp["mlp"], nn.layernorm(lp["ln3"], h), dtype)

    h = nn.layernorm(p["ln_out"], h)
    logits = nn.dense(p["out"], h, dtype)[:, 0, :].astype(jnp.float32)
    cache = {"layers": new_layers, "pos": cache["pos"] + 1}
    return cache, logits
