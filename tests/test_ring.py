"""Ring attention (time-axis sharding) == unsharded encoder, CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import MeshConfig, preset
from lipreading_tpu.models import transformer as tf
from lipreading_tpu.parallel.mesh import make_mesh
from lipreading_tpu.parallel.ring import ring_encoder_apply


def _setup(T=32, B=2, mp=8, seed=0):
    cfg = preset("transformer-attn")
    cfg.model.tf_layers = 2
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 4
    cfg.model.tf_mlp = 64
    cfg.model.frontend_dim = 16
    params = tf.encoder_init(jax.random.PRNGKey(seed), cfg.model,
                             cfg.model.frontend_dim)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, T, 16)).astype(np.float32))
    mesh = make_mesh(MeshConfig(data_parallel=8 // mp, model_parallel=mp))
    return cfg, params, x, mesh


@pytest.mark.parametrize("mp", [2, 4, 8])
def test_ring_encoder_matches_unsharded(mp):
    cfg, params, x, mesh = _setup(mp=mp)
    lengths = jnp.asarray([32, 21])       # one full, one padded sample
    want = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads)
    got = ring_encoder_apply(params, x, lengths, cfg.model.tf_heads, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_encoder_under_jit_and_sharded_input():
    """jit + explicitly sharded input arrays (the long-clip deployment
    shape: activations never materialize unsharded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params, x, mesh = _setup(mp=8)
    lengths = jnp.asarray([32, 32])
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model", None)))

    f = jax.jit(lambda p, a, l: ring_encoder_apply(
        p, a, l, cfg.model.tf_heads, mesh))
    got = f(params, xs, lengths)
    assert not got.sharding.is_fully_replicated     # stays time-sharded
    want = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_rejects_ragged_T():
    cfg, params, x, mesh = _setup(T=30, mp=8)
    with pytest.raises(AssertionError):
        ring_encoder_apply(params, x, jnp.asarray([30, 30]),
                           cfg.model.tf_heads, mesh)
