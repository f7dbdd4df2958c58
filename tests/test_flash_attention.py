"""Pallas flash attention == einsum attention (values AND gradients), and the
encoder flag routes through it unchanged. CPU runs in interpret mode; the
same kernel compiles for TPU (bench in docs/KERNELS.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import preset
from lipreading_tpu.models import transformer as tf
from lipreading_tpu.models.lipreader import compute_loss, encode, init_model
from lipreading_tpu.ops.flash_attention import (
    _reference_attend,
    flash_attention,
)


def _qkv(B=2, T=40, H=2, Dh=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(0, 1, (B, T, H, Dh)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("lengths", [[40, 40], [40, 23], [17, 1]])
def test_flash_matches_reference(lengths):
    q, k, v = _qkv()
    ln = jnp.asarray(lengths, jnp.int32)
    want = _reference_attend(q, k, v, ln)
    got = flash_attention(q, k, v, ln, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_odd_shapes_and_default_blocks():
    """T not a multiple of any block size; Dh below the 128-lane tile."""
    q, k, v = _qkv(B=1, T=13, H=3, Dh=8, seed=3)
    ln = jnp.asarray([11], jnp.int32)
    want = _reference_attend(q, k, v, ln)
    got = flash_attention(q, k, v, ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bwd", ["pallas", "fused"])
def test_flash_gradients_match(bwd):
    q, k, v = _qkv(T=24)
    ln = jnp.asarray([24, 15], jnp.int32)
    w = jnp.asarray(np.random.default_rng(9).normal(0, 1, q.shape), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, ln, block_q=8, block_k=8,
                                bwd=bwd) * w).sum()

    def loss_ref(q, k, v):
        return (_reference_attend(q, k, v, ln) * w).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_odd_shapes():
    """Backward kernels under padding: T not a block multiple, Dh < 128,
    default block sizes, ragged lengths."""
    q, k, v = _qkv(B=2, T=13, H=3, Dh=8, seed=5)
    ln = jnp.asarray([13, 7], jnp.int32)
    w = jnp.asarray(np.random.default_rng(11).normal(0, 1, q.shape),
                    jnp.float32)

    def loss_ref(q, k, v):
        return (_reference_attend(q, k, v, ln) * w).sum()

    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for bwd in ("xla", "pallas", "fused"):
        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, ln, bwd=bwd) * w).sum()

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_flash_fused_bwd_cap_falls_back(monkeypatch):
    """bwd="fused" above the dq-scratch cap silently uses the two-pass
    kernels — same gradients, no error."""
    from lipreading_tpu.ops import flash_attention as fa

    q, k, v = _qkv(T=24)
    ln = jnp.asarray([24, 15], jnp.int32)
    w = jnp.asarray(np.random.default_rng(13).normal(0, 1, q.shape),
                    jnp.float32)

    def loss(q, k, v):
        return (fa.flash_attention(q, k, v, ln, block_q=8, block_k=8,
                                   bwd="fused") * w).sum()

    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(fa, "FUSED_DQ_SCRATCH_CAP", 0)
    g_fallback = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_fallback):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def _enc_setup(seed=0):
    cfg = preset("transformer-attn")
    cfg.model.tf_layers = 2
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 4
    cfg.model.tf_mlp = 64
    cfg.model.frontend_dim = 16
    cfg.model.dtype = "float32"
    params = tf.encoder_init(jax.random.PRNGKey(seed), cfg.model, 16)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 16)), jnp.float32)
    return cfg, params, x


def test_encoder_flash_flag_matches():
    cfg, params, x = _enc_setup()
    lengths = jnp.asarray([32, 21], jnp.int32)
    want = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads)
    got = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads, flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_encoder_flash_bwd_config_knob():
    """cfg.model.flash_bwd threads to the kernel: encoder grads under
    flash_bwd="fused" match the einsum encoder's."""
    cfg, params, x = _enc_setup()
    lengths = jnp.asarray([32, 21], jnp.int32)

    def loss(p, flash, bwd):
        out = tf.encoder_apply(p, x, lengths, cfg.model.tf_heads,
                               flash=flash, flash_bwd=bwd)
        return (out * out).sum()

    g_ref = jax.grad(loss)(params, False, "auto")
    g_fused = jax.grad(loss)(params, True, "fused")
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_end_to_end_flash_training_step():
    """compute_loss under jit with cfg.model.flash_attention: value + grads
    finite and equal to the einsum encoder."""
    cfg = preset("transformer-attn")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.tf_layers = 1
    cfg.model.tf_dec_layers = 1
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 2
    cfg.model.tf_mlp = 64
    cfg.model.dtype = "float32"
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    batch = {
        "rois": jnp.asarray(rng.normal(0, 1, (B, T, 96, 96)), jnp.float32),
        "frame_lengths": jnp.asarray([T, T - 5], jnp.int32),
        "targets": jnp.asarray(rng.integers(3, 30, (B, 8)), jnp.int32),
        "target_lengths": jnp.asarray([6, 6], jnp.int32),
        "ctc_labels": jnp.asarray(rng.integers(3, 30, (B, 6)), jnp.int32),
        "ctc_lengths": jnp.asarray([4, 4], jnp.int32),
    }

    def loss_of(flag):
        cfg.model.flash_attention = flag
        l, _ = jax.jit(
            lambda p, b: compute_loss(p, cfg, b, train=False)
        )(params, batch)
        return float(l)

    base, flash = loss_of(False), loss_of(True)
    assert abs(base - flash) < 1e-4, (base, flash)

    cfg.model.flash_attention = True
    g = jax.grad(lambda p: compute_loss(p, cfg, batch, train=False)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
