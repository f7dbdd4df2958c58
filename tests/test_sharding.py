"""Multi-device data parallelism on the 8-device CPU mesh (BASELINE config 5,
tested the TPU-idiomatic way — SURVEY.md §5 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import preset
from lipreading_tpu.data.dataset import Batch
from lipreading_tpu.parallel.mesh import make_mesh, shard_batch
from lipreading_tpu.train.loop import Trainer


def tiny_cfg(dp):
    cfg = preset("dp-v5e8")
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
    cfg.data.batch_size = 8
    cfg.train.warmup_steps = 5
    cfg.mesh.data_parallel = dp
    return cfg


def fake_batch(B=8, T=12, R=96, seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        rois_u8=rng.integers(0, 255, (B, T, R, R)).astype(np.uint8),
        frame_lengths=np.full((B,), T, np.int32),
        targets=np.pad(rng.integers(3, 30, (B, 6)).astype(np.int32),
                       ((0, 0), (0, 2))),
        target_lengths=np.full((B,), 6, np.int32),
        ctc_labels=rng.integers(3, 30, (B, 8)).astype(np.int32),
        ctc_lengths=np.full((B,), 4, np.int32),
        texts=["x"] * B,
    )


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8, "conftest must force an 8-device CPU mesh"
    mesh = make_mesh(tiny_cfg(8).mesh)
    assert mesh.devices.shape == (8, 1)


@pytest.mark.slow
def test_dp8_train_step_runs_and_matches_dp1(tmp_path):
    batch = fake_batch()
    losses = {}
    for dp in (1, 8):
        cfg = tiny_cfg(dp)
        tr = Trainer(cfg, str(tmp_path / f"dp{dp}"))
        m = tr.train_step(batch)
        losses[dp] = float(m["loss"])
    # same global computation regardless of sharding
    assert abs(losses[1] - losses[8]) < 1e-4, losses


def test_sharded_batch_placement():
    cfg = tiny_cfg(8)
    mesh = make_mesh(cfg.mesh)
    x = jnp.zeros((8, 4))
    sharded = shard_batch({"x": x}, mesh)
    s = sharded["x"].sharding
    assert s.is_fully_replicated is False
    # each device holds 1/8 of the batch dim
    shard_shapes = {tuple(d.data.shape) for d in sharded["x"].addressable_shards}
    assert shard_shapes == {(1, 4)}


def test_dp8_multiple_steps_stable(tmp_path):
    cfg = tiny_cfg(8)
    tr = Trainer(cfg, str(tmp_path / "run"))
    for i in range(3):
        m = tr.train_step(fake_batch(seed=i))
        assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_tensor_parallel_matches_dp(tmp_path):
    """4x2 (data x model) TP+DP step == 8x1 pure-DP step (same math,
    different layout; GSPMD inserts the collectives)."""
    batch = fake_batch()
    losses = {}
    for dp, mp in ((8, 1), (4, 2)):
        cfg = tiny_cfg(dp)
        cfg.mesh.model_parallel = mp
        tr = Trainer(cfg, str(tmp_path / f"mp{mp}"))
        m = tr.train_step(batch)
        losses[(dp, mp)] = float(m["loss"])
    assert abs(losses[(8, 1)] - losses[(4, 2)]) < 1e-4, losses


@pytest.mark.slow
def test_tp_checkpoint_save_restore(tmp_path):
    """TP save -> restore -> step: bit-identical to an uninterrupted run AND
    params/opt stay tensor-parallel sharded after restore (VERDICT r1: the
    old restore() replicated unconditionally)."""
    cfg = tiny_cfg(4)
    cfg.mesh.model_parallel = 2
    tr = Trainer(cfg, str(tmp_path / "tp"))
    for i in range(2):
        tr.train_step(fake_batch(seed=i))
    tr.save()

    tr2 = Trainer(cfg, str(tmp_path / "tp"), seed=123)   # different init
    tr2.restore()
    assert tr2.step == 2
    w = tr2.params["encoder"]["layers"][0]["mlp"]["in"]["w"]
    assert not w.sharding.is_fully_replicated, "restore dropped TP sharding"
    shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    assert shapes == {(w.shape[0], w.shape[1] // 2)}
    # opt-state mu/nu restored sharded like their params
    mu_leaf = jax.tree.leaves(
        jax.tree.map(lambda x: x, tr2.opt_state),
    )
    import optax  # noqa: F401
    adam_state = tr2.opt_state[1][0]
    mu_w = adam_state.mu["encoder"]["layers"][0]["mlp"]["in"]["w"]
    assert not mu_w.sharding.is_fully_replicated
    # continues identically to the uninterrupted trainer
    m1 = tr.train_step(fake_batch(seed=5))
    m2 = tr2.train_step(fake_batch(seed=5))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6


def test_tp_params_actually_sharded(tmp_path):
    cfg = tiny_cfg(4)
    cfg.mesh.model_parallel = 2
    tr = Trainer(cfg, str(tmp_path / "tp"))
    w = tr.params["encoder"]["layers"][0]["mlp"]["in"]["w"]
    assert not w.sharding.is_fully_replicated
    # each shard holds half the mlp hidden dim
    shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    assert shapes == {(w.shape[0], w.shape[1] // 2)}
