"""Sequence parallelism wired into the training path (CLAUDE.md round-2
follow-up): cfg.mesh.sequence_parallel=True routes encode() through the
ring-attention time-sharded encoder (parallel/ring.py) — DP x SP composed in
one shard_map, exact attention, trained end to end.

Complements test_ring.py (which pins the standalone building block)."""

import numpy as np
import pytest

import jax

from lipreading_tpu.config import preset
from lipreading_tpu.models.lipreader import encode, init_model
from lipreading_tpu.parallel.mesh import make_mesh
from lipreading_tpu.train.loop import Trainer

from test_sharding import fake_batch, tiny_cfg


def sp_cfg(dp, sp, dropout=0.0):
    cfg = tiny_cfg(dp)
    cfg.mesh.model_parallel = sp
    cfg.mesh.sequence_parallel = sp > 1
    cfg.model.dropout = dropout
    return cfg


@pytest.mark.slow
def test_sp_train_step_matches_unsharded(tmp_path):
    """dp4 x sp2 (time-sharded encoder) step == 8x1 pure-DP step: the ring
    encoder is exact attention, so with dropout off the loss is the same
    math in a different layout."""
    batch = fake_batch()     # T=12, divisible by sp=2
    losses = {}
    for dp, sp in ((8, 1), (4, 2)):
        cfg = sp_cfg(dp, sp)
        tr = Trainer(cfg, str(tmp_path / f"sp{sp}"))
        m = tr.train_step(batch)
        losses[(dp, sp)] = float(m["loss"])
    assert abs(losses[(8, 1)] - losses[(4, 2)]) < 1e-4, losses


def test_sp_multiple_steps_with_dropout(tmp_path):
    """The per-shard dropout path (keys folded with shard indices) trains
    stably — loss finite across steps, grads flow through ppermute."""
    cfg = sp_cfg(4, 2, dropout=0.1)
    tr = Trainer(cfg, str(tmp_path / "spd"))
    for i in range(2):
        m = tr.train_step(fake_batch(seed=i, T=16))
        assert np.isfinite(float(m["loss"]))


def test_encode_sp_matches_unsharded_eval():
    """Inference-shaped equivalence: encode() with the flag == without."""
    cfg = sp_cfg(2, 4)
    params = init_model(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(cfg.mesh)
    rng = np.random.default_rng(0)
    rois = np.asarray(rng.normal(0, 1, (2, 16, 96, 96)), np.float32)
    lengths = np.asarray([16, 11], np.int32)
    want = encode(params, cfg, rois, lengths)            # flag ignored: no mesh
    got = encode(params, cfg, rois, lengths, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sp_requires_transformer(tmp_path):
    cfg = sp_cfg(4, 2)
    cfg.encoder = "bigru"
    cfg.decoder = "ctc"
    with pytest.raises(ValueError, match="sequence_parallel"):
        Trainer(cfg, str(tmp_path / "bad"))
