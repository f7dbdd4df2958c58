"""Auxiliary-subsystem guarantees (SURVEY.md §6).

* transfer discipline: the jitted train step must not trigger implicit
  host<->device transfers (the XLA-level analogue of race detection — guards
  against accidental host syncs/staging in the hot loop);
* determinism: same seed -> bit-identical params and losses (the basis of
  the resumable-training story and CI reproducibility).
"""

import numpy as np
import pytest

import jax

from lipreading_tpu.config import preset
from lipreading_tpu.data.dataset import Batch
from lipreading_tpu.train.loop import Trainer


def tiny_cfg():
    cfg = preset("bigru-ctc")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.gru_hidden = 24
    cfg.model.gru_layers = 1
    cfg.model.dtype = "float32"
    cfg.train.warmup_steps = 5
    cfg.mesh.data_parallel = 1
    return cfg


def fake_batch(seed=0, B=2, T=10):
    rng = np.random.default_rng(seed)
    return Batch(
        rois_u8=rng.integers(0, 255, (B, T, 96, 96)).astype(np.uint8),
        frame_lengths=np.full((B,), T, np.int32),
        targets=np.pad(rng.integers(3, 30, (B, 5)).astype(np.int32),
                       ((0, 0), (0, 2))),
        target_lengths=np.full((B,), 5, np.int32),
        ctc_labels=rng.integers(3, 30, (B, 6)).astype(np.int32),
        ctc_lengths=np.full((B,), 3, np.int32),
        texts=["x"] * B,
    )


def test_no_implicit_transfers_in_train_step(tmp_path):
    """After explicit device staging, stepping must not implicitly transfer."""
    cfg = tiny_cfg()
    tr = Trainer(cfg, str(tmp_path / "run"))
    from lipreading_tpu.data.dataset import batch_to_device

    dev = batch_to_device(fake_batch(), cfg.preprocess.normalize_mean,
                          cfg.preprocess.normalize_std)
    dev = jax.device_put(dev)
    rng = jax.device_put(jax.random.PRNGKey(0))
    tr._jit_step(tr.params, tr.opt_state, dev, rng)  # compile outside guard
    tr2 = Trainer(cfg, str(tmp_path / "run2"))
    with jax.transfer_guard("disallow"):
        tr2._jit_step(tr2.params, tr2.opt_state, dev, rng)


def test_training_deterministic(tmp_path):
    losses = {}
    for run in ("a", "b"):
        cfg = tiny_cfg()
        tr = Trainer(cfg, str(tmp_path / run))
        ls = [float(tr.train_step(fake_batch(i))["loss"]) for i in range(3)]
        losses[run] = ls
    assert losses["a"] == losses["b"]


def test_init_deterministic():
    from lipreading_tpu.models.lipreader import init_model

    cfg = tiny_cfg()
    p1 = init_model(jax.random.PRNGKey(7), cfg)
    p2 = init_model(jax.random.PRNGKey(7), cfg)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preprocess_padded_matches_unpadded(assets):
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import (
        preprocess_frames,
        preprocess_padded,
    )

    det_np, ert_np = assets
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    frames = make_clip(31).frames[:20]                 # non-multiple of bucket
    want = np.asarray(preprocess_frames(det, ert, jnp.asarray(frames)))
    got = preprocess_padded(det, ert, frames, bucket=16)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decode_deterministic(assets):
    """fp32 decode must be bit-deterministic (the decode half of the
    'bit-for-bit transcripts at fp32' gate — BASELINE.json:5)."""
    import jax
    import jax.numpy as jnp

    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.models.lipreader import init_model

    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(4)
    rois = jnp.asarray(rng.normal(0, 1, (3, 12, 96, 96)).astype(np.float32))
    lengths = jnp.asarray([12, 9, 12])
    a = transcribe(params, cfg, rois, lengths, beam=1)
    b = transcribe(params, cfg, rois, lengths, beam=1)
    assert a == b


def test_fused_trainer_checkpoint_roundtrip(tmp_path, assets):
    import jax

    from lipreading_tpu.data.pipeline import FixtureVideoDataset, VideoBatchIterator
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.train.loop import FusedTrainer

    det_np, ert_np = assets
    cfg = tiny_cfg()
    cfg.data.batch_size = 2
    ds = FixtureVideoDataset(1, seed=6, cfg=cfg.data)
    it = VideoBatchIterator(ds, 2, seed=0)
    tr = FusedTrainer(cfg, str(tmp_path / "a"), params_to_jax(det_np),
                      model_to_jax(ert_np))
    tr.train_step(next(it))
    tr.save()
    tr2 = FusedTrainer(cfg, str(tmp_path / "a"), params_to_jax(det_np),
                       model_to_jax(ert_np), seed=99)
    tr2.restore()
    assert tr2.step == 1
    for x, y in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_profiling_capture_and_timer(tmp_path):
    import jax.numpy as jnp

    from lipreading_tpu.profiling import Timer, annotate, capture

    def f(x):
        with annotate("bench-region"):
            return (x * 2).sum()

    t = Timer(f).measure(jnp.ones((64, 64)), reps=3)
    assert t > 0
    with capture(str(tmp_path / "trace")):
        f(jnp.ones((8, 8)))
    import os

    # a trace directory with at least one event file must exist
    found = any("trace" in r for r, _, fs in os.walk(tmp_path) for f_ in fs)
    assert os.path.isdir(tmp_path / "trace")
