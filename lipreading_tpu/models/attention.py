"""Attention GRU decoder (ref: EncoderRNN/AttnDecoder path — SURVEY.md §3,
"Attention decoder": char-level autoregressive GRU with Bahdanau-style
attention over encoder states, teacher-forced in training).

TPU shape: teacher-forced training runs the whole target sequence under ONE
lax.scan (no per-char Python loop as in the reference §4.2); each step is
embedding -> attention (two matmuls + masked softmax) -> GRU cell -> logits.
Inference reuses the same single-step function inside greedy/beam decoding
(ops/decode.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lipreading_tpu.config import ModelConfig
from lipreading_tpu.models import nn
from lipreading_tpu.models.gru import gru_cell_init, gru_cell_step


def attn_decoder_init(key, cfg: ModelConfig, enc_dim: int):
    ks = jax.random.split(key, 6)
    H = cfg.decoder_hidden
    A = cfg.attn_dim
    return {
        "embed": nn.embedding_init(ks[0], cfg.vocab_size, H),
        "attn_enc": nn.dense_init(ks[1], enc_dim, A, bias=False),
        "attn_dec": nn.dense_init(ks[2], H, A),
        "attn_v": nn.dense_init(ks[3], A, 1, bias=False),
        "gru": gru_cell_init(ks[4], H + enc_dim, H),
        "out": nn.dense_init(ks[5], H + enc_dim, cfg.vocab_size),
    }


def precompute_attention(p, enc, dtype=None):
    """Encoder-side attention projection, computed once per sequence."""
    return nn.dense(p["attn_enc"], enc, dtype=dtype)       # [B, T, A]


def attend(p, h, enc, enc_proj, enc_mask, dtype=None):
    """Bahdanau scores: v^T tanh(W_e enc + W_d h). Returns (context, weights)."""
    q = nn.dense(p["attn_dec"], h, dtype=dtype)            # [B, A]
    e = jnp.tanh(enc_proj + q[:, None, :])                 # [B, T, A]
    scores = nn.dense(p["attn_v"], e, dtype=dtype)[..., 0]  # [B, T]
    scores = jnp.where(enc_mask, scores.astype(jnp.float32), -1e30)
    w = jax.nn.softmax(scores, axis=-1).astype(enc.dtype)
    ctx = jnp.einsum("bt,btd->bd", w, enc)
    return ctx, w


def decoder_step(p, h, token, enc, enc_proj, enc_mask, dtype=None):
    """One autoregressive step. Returns (h', logits [B, V])."""
    emb = nn.embedding(p["embed"], token, dtype=dtype)     # [B, H]
    ctx, _ = attend(p, h, enc, enc_proj, enc_mask, dtype)
    x = jnp.concatenate([emb, ctx], axis=-1)
    w_ih = p["gru"]["w_ih"].astype(dtype) if dtype else p["gru"]["w_ih"]
    x_proj = x @ w_ih + (p["gru"]["b_ih"].astype(dtype) if dtype else p["gru"]["b_ih"])
    h = gru_cell_step(p["gru"], h, x_proj, dtype)
    logits = nn.dense(p["out"], jnp.concatenate([h, ctx], axis=-1), dtype=dtype)
    return h, logits.astype(jnp.float32)


def teacher_forced_logits(p, enc, enc_lengths, targets, dtype=None,
                          teacher_forcing: float = 1.0, rng=None):
    """Training pass: [B, T, D] encoder states + [B, L] target ids (sos-framed)
    -> [B, L-1, V] next-token logits (positions 1..L-1).

    ``teacher_forcing`` < 1 enables scheduled sampling (the reference's
    AttnDecoder draws a teacher-forcing coin per step — SURVEY.md §3): with
    prob (1 - ratio) the decoder consumes its own argmax prediction instead
    of the ground-truth token. Requires ``rng``.
    """
    B, T, _ = enc.shape
    enc_mask = nn.length_mask(enc_lengths, T)
    enc_proj = precompute_attention(p, enc, dtype)
    H = p["gru"]["w_hh"].shape[0]
    h0 = jnp.zeros((B, H), enc.dtype)
    use_ss = teacher_forcing < 1.0 and rng is not None

    def step(carry, xs):
        h, prev_pred = carry
        tok, key = xs
        if use_ss:
            coin = jax.random.uniform(key, (B,))
            tok = jnp.where(coin < teacher_forcing, tok, prev_pred)
        h, logits = decoder_step(p, h, tok, enc, enc_proj, enc_mask, dtype)
        pred = jnp.argmax(logits, axis=-1).astype(targets.dtype)
        return (h, pred), logits

    # inputs are targets[:, :-1] (sos..last-1); predictions align to 1..L-1
    toks = jnp.moveaxis(targets[:, :-1], 1, 0)             # [L-1, B]
    L1 = toks.shape[0]
    keys = (jax.random.split(rng, L1) if use_ss
            else jnp.zeros((L1, 2), jnp.uint32))
    prev0 = jnp.full((B,), 0, targets.dtype)
    (_, _), logits = jax.lax.scan(step, (h0, prev0), (toks, keys))
    return jnp.moveaxis(logits, 0, 1)                      # [B, L-1, V]
