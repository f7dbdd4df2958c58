"""GPipe pipeline parallelism (parallel/pipeline.py) == unsharded encoder,
CPU mesh; plus a DP x PP train step through the Trainer.

Ref: SURVEY.md §3 parallelism table; GPipe schedule (1811.06965) as
scan + ppermute. Forward is exact; fp32 grads differ only by summation
order (pinned at fp64 equality during development, 8e-11 max abs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import MeshConfig, preset
from lipreading_tpu.models import transformer as tf
from lipreading_tpu.parallel.mesh import make_mesh
from lipreading_tpu.parallel.pipeline import pipeline_encoder_apply


def _setup(layers=4, T=24, B=8, mp=4, seed=0):
    cfg = preset("transformer-attn")
    cfg.model.tf_layers = layers
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 4
    cfg.model.tf_mlp = 64
    cfg.model.frontend_dim = 16
    params = tf.encoder_init(jax.random.PRNGKey(seed), cfg.model,
                             cfg.model.frontend_dim)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, T, 16)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(T // 3, T + 1, (B,)))
    mesh = make_mesh(MeshConfig(data_parallel=8 // mp, model_parallel=mp))
    return cfg, params, x, lengths, mesh


@pytest.mark.parametrize("mp,mb", [(2, 2), (4, 2), (4, 4), (8, 8)])
def test_pipeline_matches_unsharded(mp, mb):
    layers = 8 if mp == 8 else 4
    cfg, params, x, lengths, mesh = _setup(layers=layers, mp=mp)
    want = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads)
    got = pipeline_encoder_apply(params, x, lengths, cfg.model.tf_heads,
                                 mesh, microbatches=mb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_unsharded():
    cfg, params, x, lengths, mesh = _setup(mp=4)

    def loss_pp(p):
        out = pipeline_encoder_apply(p, x, lengths, cfg.model.tf_heads,
                                     mesh, microbatches=2)
        return jnp.sum(out ** 2)

    def loss_ref(p):
        return jnp.sum(tf.encoder_apply(p, x, lengths,
                                        cfg.model.tf_heads) ** 2)

    g1 = jax.grad(loss_pp)(params)
    g2 = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # fp32 summation-order noise only (fp64 agreement is 8e-11)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_pipeline_rejects_ragged_layers():
    cfg, params, x, lengths, mesh = _setup(layers=3, mp=4)
    with pytest.raises(AssertionError):
        pipeline_encoder_apply(params, x, lengths, cfg.model.tf_heads, mesh)


def test_pipeline_under_jit():
    cfg, params, x, lengths, mesh = _setup(mp=4)
    f = jax.jit(lambda p, a, l: pipeline_encoder_apply(
        p, a, l, cfg.model.tf_heads, mesh, microbatches=4))
    got = f(params, x, lengths)
    want = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_flash_matches_unsharded():
    """flash=True routes stages through the Pallas flash kernel (interpret
    mode on CPU) — same math as the masked dense path."""
    cfg, params, x, lengths, mesh = _setup(mp=4)
    want = tf.encoder_apply(params, x, lengths, cfg.model.tf_heads)
    got = pipeline_encoder_apply(params, x, lengths, cfg.model.tf_heads,
                                 mesh, microbatches=2, flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_dropout_decorrelated_across_dp():
    """With dropout>0 under DP x PP, each data shard must draw its own
    dropout masks: identical inputs on every shard must NOT produce
    identical outputs across shards (the key folds in axis_index(data))."""
    cfg, params, x, lengths, mesh = _setup(mp=2)  # dp4 x pp2
    B = x.shape[0]
    # identical data in every DP shard: tile the first shard's rows
    per = B // 4
    x_rep = jnp.tile(x[:per], (4, 1, 1))
    len_rep = jnp.tile(lengths[:per], (4,))
    out = pipeline_encoder_apply(
        params, x_rep, len_rep, cfg.model.tf_heads, mesh, microbatches=2,
        dropout_rng=jax.random.PRNGKey(3), rate=0.5)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    shards = out.reshape(4, per, *out.shape[1:])
    # same inputs, same weights — any difference comes from dropout keys
    assert not np.allclose(shards[0], shards[1]), (
        "DP shards applied bit-identical dropout masks")


@pytest.mark.slow
def test_dp2_pp4_train_step_matches_dp8(tmp_path):
    """One hybrid train step: dp2 x pp4 loss == dp8 loss (dropout off —
    the pipeline derives per-stage dropout keys, so only the deterministic
    path is bit-comparable)."""
    from tests.test_sharding import fake_batch, tiny_cfg

    from lipreading_tpu.train.loop import Trainer

    losses = {}
    for name, mp, pp in (("dp8", 1, False), ("dp2pp4", 4, True)):
        cfg = tiny_cfg(8 // mp)
        cfg.encoder = "transformer"
        cfg.decoder = "hybrid"
        cfg.model.tf_layers = 4
        cfg.model.dropout = 0.0
        cfg.mesh.model_parallel = mp
        cfg.mesh.pipeline_parallel = pp
        tr = Trainer(cfg, str(tmp_path / name))
        m = tr.train_step(fake_batch())
        losses[name] = m["loss"]
    assert np.isfinite(losses["dp2pp4"])
    np.testing.assert_allclose(losses["dp2pp4"], losses["dp8"],
                               rtol=1e-4, atol=1e-4)
