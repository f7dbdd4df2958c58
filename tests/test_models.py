"""Model variant smoke + decode tests (BASELINE configs 3-4 model families)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import preset
from lipreading_tpu.infer import transcribe
from lipreading_tpu.models.lipreader import compute_loss, init_model


def tiny(cfg):
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.gru_hidden = 24
    cfg.model.gru_layers = 1
    cfg.model.tf_layers = 1
    cfg.model.tf_dec_layers = 1
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 2
    cfg.model.tf_mlp = 64
    cfg.model.dtype = "float32"
    cfg.train.max_decode_len = 8
    cfg.train.beam_width = 3
    return cfg


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    B, T, R, L = 2, 10, 96, 8
    return {
        "rois": jnp.asarray(rng.normal(0, 1, (B, T, R, R)).astype(np.float32)),
        "frame_lengths": jnp.asarray([10, 7]),
        "targets": jnp.asarray(rng.integers(3, 30, (B, L)).astype(np.int32)),
        "target_lengths": jnp.asarray([6, 5]),
        "ctc_labels": jnp.asarray(rng.integers(3, 30, (B, L)).astype(np.int32)),
        "ctc_lengths": jnp.asarray([4, 3]),
    }


@pytest.mark.parametrize(
    "enc,dec",
    [("bigru", "ctc"), ("bigru", "attention"), ("bigru", "hybrid"),
     ("transformer", "hybrid"), ("transformer", "ctc")],
)
def test_variants_loss_and_decode(enc, dec, batch):
    cfg = tiny(preset("bigru-ctc"))
    cfg.encoder, cfg.decoder = enc, dec
    if dec == "hybrid":
        cfg.train.ctc_weight = cfg.train.att_weight = 0.5
    params = init_model(jax.random.PRNGKey(0), cfg)
    loss, metrics = jax.jit(lambda p, b: compute_loss(p, cfg, b))(params, batch)
    assert np.isfinite(float(loss))
    assert set(metrics) >= {"loss"}
    outs = transcribe(params, cfg, batch["rois"], batch["frame_lengths"], beam=1)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
    if dec != "ctc":
        outs_b = transcribe(params, cfg, batch["rois"], batch["frame_lengths"],
                            beam=3)
        assert len(outs_b) == 2


def test_loss_gradients_finite(batch):
    cfg = tiny(preset("bigru-ctc"))
    cfg.decoder = "hybrid"
    cfg.train.ctc_weight = cfg.train.att_weight = 0.5
    params = init_model(jax.random.PRNGKey(1), cfg)
    g = jax.grad(lambda p: compute_loss(p, cfg, batch)[0])(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # every parameter receives gradient somewhere
    nonzero = sum(float(np.abs(np.asarray(x)).sum()) > 0 for x in leaves)
    assert nonzero / len(leaves) > 0.9


def test_beam_not_worse_than_greedy():
    """Beam search sequence log-prob must be >= greedy's under the model."""
    from lipreading_tpu.models.lipreader import encode
    from lipreading_tpu.infer import _attention_step_fn
    from lipreading_tpu.ops.decode import beam_search, greedy_decode
    import jax.numpy as jnp

    cfg = tiny(preset("transformer-attn"))
    cfg.encoder, cfg.decoder = "transformer", "attention"
    params = init_model(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    rois = jnp.asarray(rng.normal(0, 1, (2, 10, 96, 96)).astype(np.float32))
    lengths = jnp.asarray([10, 8])
    enc = encode(params, cfg, rois, lengths, jnp.float32)

    def seq_logp(ids, lens):
        """Score a decoded sequence under teacher forcing."""
        from lipreading_tpu.models.transformer import decoder_apply

        sos = jnp.full((ids.shape[0], 1), 1, jnp.int32)
        inp = jnp.concatenate([sos, ids], axis=1)[:, :-1]
        logits = decoder_apply(params["att_decoder"], inp, enc, lengths,
                               cfg.model.tf_heads, jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(logp, ids[..., None], axis=-1)[..., 0]
        mask = jnp.arange(ids.shape[1])[None] < lens[:, None]
        return (tok_lp * mask).sum(axis=1)

    state, step, _ = _attention_step_fn(params, cfg, enc, lengths, jnp.float32)
    g_ids, g_len = greedy_decode(step, state, 2, 8, 1, 2)
    enc_t = jnp.repeat(enc, 3, axis=0)
    len_t = jnp.repeat(lengths, 3, axis=0)
    state_t, step_t, _ = _attention_step_fn(params, cfg, enc_t, len_t, jnp.float32)
    b_ids, b_len = beam_search(step_t, state_t, 2, 3, 8, 1, 2,
                               length_penalty=0.0)
    # include eos in scored length
    g_s = np.asarray(seq_logp(g_ids, jnp.minimum(g_len + 1, 8)))
    b_s = np.asarray(seq_logp(b_ids, jnp.minimum(b_len + 1, 8)))
    assert (b_s >= g_s - 1e-4).all(), (b_s, g_s)


def test_ctc_beam_transcribe_path():
    """transcribe() with decoder=ctc and beam>1 uses prefix beam search."""
    from lipreading_tpu.infer import transcribe

    cfg = tiny(preset("bigru-ctc"))
    params = init_model(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    rois = jnp.asarray(rng.normal(0, 1, (2, 10, 96, 96)).astype(np.float32))
    lengths = jnp.asarray([10, 8])
    greedy = transcribe(params, cfg, rois, lengths, beam=1)
    beamed = transcribe(params, cfg, rois, lengths, beam=8)
    assert len(beamed) == 2 and all(isinstance(s, str) for s in beamed)
    # both decode the same random model; outputs may differ but must exist
    assert isinstance(greedy[0], str)


@pytest.mark.slow
def test_remat_matches_no_remat(batch):
    """jax.checkpoint on the frontend must not change loss or grads."""
    import dataclasses

    cfg = tiny(preset("bigru-ctc"))
    params = init_model(jax.random.PRNGKey(6), cfg)
    cfg_r = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, remat=True))
    l0, g0 = jax.value_and_grad(
        lambda p: compute_loss(p, cfg, batch)[0]
    )(params)
    l1, g1 = jax.value_and_grad(
        lambda p: compute_loss(p, cfg_r, batch)[0]
    )(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_patchify_frontend_trains_and_decodes(batch):
    """cfg.model.frontend="patchify" (round-3 MXU stem): same [B, T, D]
    contract as the conv3d stack — loss finite, grads finite, decode runs."""
    import dataclasses

    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.models.lipreader import compute_loss, init_model

    cfg = preset("transformer-attn")
    cfg.model.frontend = "patchify"
    cfg.model.patch_dim = 64
    cfg.model.tf_layers = 1
    cfg.model.tf_dec_layers = 1
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 2
    cfg.model.tf_mlp = 64
    cfg.model.frontend_dim = 32
    cfg.model.dtype = "float32"
    params = init_model(jax.random.PRNGKey(0), cfg)
    loss, grads = jax.value_and_grad(
        lambda p: compute_loss(p, cfg, batch, train=False)[0]
    )(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    hyps = transcribe(params, cfg, batch["rois"], batch["frame_lengths"],
                      beam=1)
    assert len(hyps) == batch["rois"].shape[0]


def test_cascade_decode_endpoints(batch):
    """transcribe_cascade: margin=inf rescoring == full beam transcribe;
    margin=0 == pure greedy; n_rescored reports honestly."""
    from lipreading_tpu.infer import transcribe_cascade
    from lipreading_tpu.ops.decode import ctc_greedy_ids
    from lipreading_tpu.infer import ctc_log_probs
    from lipreading_tpu.text import Vocab

    cfg = tiny(preset("bigru-ctc"))
    params = init_model(jax.random.PRNGKey(1), cfg)
    full = transcribe(params, cfg, batch["rois"], batch["frame_lengths"],
                      beam=3)
    hi, n_hi = transcribe_cascade(params, cfg, batch["rois"],
                                  batch["frame_lengths"], beam=3,
                                  margin=float("inf"))
    assert hi == full and n_hi == batch["rois"].shape[0]

    # pure-greedy endpoint: every trigger off (the OOV trigger would fire
    # on this random-weight model's out-of-lexicon output)
    lo, n_lo = transcribe_cascade(params, cfg, batch["rois"],
                                  batch["frame_lengths"], beam=3, margin=0.0,
                                  oov_trigger=False)
    assert n_lo == 0
    vocab = Vocab()
    logp = ctc_log_probs(params, cfg, batch["rois"], batch["frame_lengths"])
    gi, gl = ctc_greedy_ids(logp, batch["frame_lengths"],
                            blank=vocab.blank_id)
    gi, gl = np.asarray(gi), np.asarray(gl)
    greedy = [vocab.decode(gi[b, : gl[b]]) for b in range(gi.shape[0])]
    assert lo == greedy


def test_roi_augment_trains_and_is_train_only(batch):
    """train.roi_augment jitters ROIs during training only: the train loss
    changes vs augment=0, the eval loss is bit-identical."""
    cfg = tiny(preset("bigru-ctc"))
    params = init_model(jax.random.PRNGKey(0), cfg)
    cfg2 = preset("bigru-ctc")
    cfg2 = tiny(cfg2)
    cfg2.train.roi_augment = 0.2
    rng = jax.random.PRNGKey(5)
    l0 = float(compute_loss(params, cfg, batch, train=True, rng=rng)[0])
    l1 = float(compute_loss(params, cfg2, batch, train=True, rng=rng)[0])
    assert np.isfinite(l1) and l0 != l1
    e0 = float(compute_loss(params, cfg, batch, train=False)[0])
    e1 = float(compute_loss(params, cfg2, batch, train=False)[0])
    assert e0 == e1


@pytest.mark.parametrize("frontend", ["conv3d", "patchify"])
def test_framewise_norm_pad_invariance(frontend):
    """cfg.model.framewise_norm: per-frame GroupNorm statistics make valid
    frames' CTC log-probs INVARIANT to the pad bucket. Default-off stats
    pool over the time axis (torch-reference semantics, the parity
    anchor) — measured on the releases: logits shift ~1 nat between pad
    buckets 64/128 and a v3 transcript flipped, because zero-padded frames
    dilute the statistics."""
    from lipreading_tpu.infer import ctc_log_probs

    cfg = tiny(preset("bigru-ctc" if frontend == "conv3d"
                      else "transformer-patchify"))
    cfg.model.frontend = frontend
    cfg.model.framewise_norm = True
    params = init_model(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(1)
    T = 12
    rois = rng.normal(0, 1, (1, T, 96, 96)).astype(np.float32)

    def logp(P, c):
        rp = np.zeros((1, P, 96, 96), np.float32)
        rp[:, :T] = rois
        return np.asarray(ctc_log_probs(params, c, jnp.asarray(rp),
                                        jnp.asarray([T])))[0, :T]

    a, b = logp(16, cfg), logp(48, cfg)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)

    # default-off reproduces the time-pooled (pad-sensitive) semantics
    import dataclasses as dc

    cfg_off = dc.replace(cfg, model=dc.replace(cfg.model,
                                               framewise_norm=False))
    a0, b0 = logp(16, cfg_off), logp(48, cfg_off)
    assert np.abs(a0 - b0).max() > 1e-6


def test_decoder_cross_kv_hoist_parity():
    """Hoisted cross-attention K/V (decoder_cross_kv) must be bit-identical
    to the per-step recompute path — the decode-throughput overhaul
    (BASELINE.md round-4 "Decode-path overhaul" row) must not change a
    single logit."""
    from lipreading_tpu.models import transformer as tf

    cfg = tiny(preset("transformer-attn"))
    m = cfg.model
    p = tf.decoder_init(jax.random.PRNGKey(7), m)
    B, T, L = 3, 12, 6
    enc = jax.random.normal(jax.random.PRNGKey(8), (B, T, m.tf_dim))
    lens = jnp.asarray([12, 9, 5], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(9), (L, B), 3, m.vocab_size)

    def run(use_ckv):
        cache = tf.decoder_init_cache(p, B, L, m.tf_heads, jnp.float32)
        ckv = tf.decoder_cross_kv(p, enc, m.tf_heads) if use_ckv else None
        outs = []
        for t in range(L):
            cache, lg = tf.decoder_step(p, cache, toks[t], enc, lens,
                                        m.tf_heads, cross_kv=ckv)
            outs.append(lg)
        return jnp.stack(outs)

    a, b = run(False), run(True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kv_cache_dtype_decode_identity():
    """A bf16 KV cache is bit-identical to an fp32 cache under bf16
    activations: decoder_step computes K/V in the act dtype and downcasts
    cache reads back to it, so the fp32 cache only ever held exact-bf16
    values (fp32->bf16 of an exact-bf16 value is exact). infer.py therefore
    allocates the cache in the activation dtype — half the per-step beam
    gather traffic for zero arithmetic change. This pins the argument."""
    from lipreading_tpu.models import transformer as tf

    cfg = tiny(preset("transformer-attn"))
    m = cfg.model
    p = tf.decoder_init(jax.random.PRNGKey(17), m)
    B, T, L = 3, 12, 8
    enc = jax.random.normal(
        jax.random.PRNGKey(18), (B, T, m.tf_dim)).astype(jnp.bfloat16)
    lens = jnp.asarray([12, 9, 5], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(19), (L, B), 3, m.vocab_size)
    ckv = tf.decoder_cross_kv(p, enc, m.tf_heads, jnp.bfloat16)

    def run(cache_dtype):
        cache = tf.decoder_init_cache(p, B, L, m.tf_heads, cache_dtype)
        outs = []
        for t in range(L):
            cache, lg = tf.decoder_step(p, cache, toks[t], enc, lens,
                                        m.tf_heads, jnp.bfloat16,
                                        cross_kv=ckv)
            outs.append(lg)
        return jnp.stack(outs)

    a, b = run(jnp.float32), run(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
