"""Tracked (detection-robust) dataview builds + valid-mask-aware training
(CLAUDE.md round-2 follow-up): the builder applies the reference's skip-frame
semantics (no-detection frames dropped — SURVEY.md §4.1), or keeps the
per-frame mask; the fused trainer compacts confident frames on device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import DataConfig, preset
from lipreading_tpu.data.dataview import build_fixture_dataview
from lipreading_tpu.fixtures import blank_out_frames, make_clip
from lipreading_tpu.ops.tracking import compact_valid_frames
from lipreading_tpu.preproc_training import load_presence


def _need_presence():
    if load_presence() is None:
        pytest.skip("presence head not trained")


def test_compact_valid_frames_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (3, 10, 4)).astype(np.float32)
    valid = rng.random((3, 10)) > 0.35
    lengths = np.asarray([10, 7, 0], np.int32)
    got_x, got_l = jax.jit(compact_valid_frames)(
        jnp.asarray(x), jnp.asarray(valid), jnp.asarray(lengths)
    )
    got_x, got_l = np.asarray(got_x), np.asarray(got_l)
    for b in range(3):
        keep = valid[b, : lengths[b]]
        want = x[b, : lengths[b]][keep]
        assert got_l[b] == want.shape[0]
        np.testing.assert_array_equal(got_x[b, : got_l[b]], want)


def test_compact_preserves_order_and_dtype():
    x = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    valid = jnp.asarray([[True, False, True, True, False, True, False, True]])
    out, n = compact_valid_frames(x, valid, jnp.asarray([8]))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out[0, : int(n[0])]),
                                  [0, 2, 3, 5, 7])


@pytest.fixture(scope="module")
def small_cfg():
    cfg = DataConfig()
    return cfg


def _cutaway_transform(gaps_by_clip):
    """frame_transform hook: blank the given frame indices of each clip."""

    def tf(c, frames):
        gaps = gaps_by_clip.get(c, [])
        if not gaps:
            return frames
        clip_like = type("C", (), {"frames": frames})
        return blank_out_frames(clip_like, gaps, seed=100 + c)

    return tf


@pytest.mark.slow
def test_tracked_build_drops_cutaway_frames(tmp_path, small_cfg):
    """Skip-frame semantics: a tracked build of a clip with a faceless gap
    yields samples shorter by exactly the gap frames inside their span."""
    _need_presence()
    gaps = {0: [2, 3, 4]}
    plain = build_fixture_dataview(
        str(tmp_path / "plain"), n_clips=1, seed=11, data_cfg=small_cfg,
        tracked=True,
    )
    corrupted = build_fixture_dataview(
        str(tmp_path / "tracked"), n_clips=1, seed=11, data_cfg=small_cfg,
        tracked=True, frame_transform=_cutaway_transform(gaps),
    )
    # with no corruption every frame is confident: nothing dropped
    full_p = [s for s in plain.samples if s["file"].endswith("_full.npz")][0]
    full_c = [s for s in corrupted.samples
              if s["file"].endswith("_full.npz")][0]
    assert full_p["num_frames"] == full_c["num_frames"] + 3, (
        full_p, full_c,
    )


@pytest.mark.slow
def test_tracked_build_keep_invalid_stores_mask(tmp_path, small_cfg):
    _need_presence()
    gaps = {0: [5, 6]}
    view = build_fixture_dataview(
        str(tmp_path / "masked"), n_clips=1, seed=12, data_cfg=small_cfg,
        tracked=True, keep_invalid=True,
        frame_transform=_cutaway_transform(gaps),
    )
    full = [i for i, s in enumerate(view.samples)
            if s["file"].endswith("_full.npz")][0]
    v = view.frame_valid(full)
    assert v.shape[0] == view.num_frames(full)        # frames kept in place
    assert not v[5] and not v[6]
    assert v.sum() == v.shape[0] - 2
    assert view.samples[full]["num_valid"] == int(v.sum())
    # untracked reader contract: all-ones mask
    plain_idx = 0
    assert view.frame_valid(plain_idx).dtype == bool


@pytest.mark.slow
def test_fused_tracked_train_step(tmp_path, assets):
    """Raw corrupted video -> tracked ROIs -> on-device compaction -> loss,
    one jit program; loss finite and lengths actually shrink."""
    _need_presence()
    from lipreading_tpu.data.pipeline import VideoBatch
    from lipreading_tpu.train.loop import FusedTrainer

    presence = load_presence()
    cfg = preset("transformer-attn")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.tf_layers = 1
    cfg.model.tf_dec_layers = 1
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 2
    cfg.model.tf_mlp = 64
    cfg.model.dtype = "float32"
    cfg.mesh.data_parallel = 1
    cfg.train.warmup_steps = 1

    clip = make_clip(31)
    T = 12
    frames = blank_out_frames(clip, [4, 5], seed=9)[:T]
    B = 2
    rng = np.random.default_rng(0)
    batch = VideoBatch(
        frames=np.stack([frames, clip.frames[:T]]),
        frame_lengths=np.asarray([T, T], np.int32),
        targets=np.pad(rng.integers(3, 30, (B, 5)).astype(np.int32),
                       ((0, 0), (0, 3))),
        target_lengths=np.full((B,), 5, np.int32),
        ctc_labels=rng.integers(3, 30, (B, 6)).astype(np.int32),
        ctc_lengths=np.full((B,), 3, np.int32),
        texts=["x"] * B,
    )
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax

    tr = FusedTrainer(cfg, str(tmp_path / "run"),
                      params_to_jax(assets[0]), model_to_jax(assets[1]),
                      presence=presence, tracked=True)
    m = tr.train_step(batch)
    assert np.isfinite(float(m["loss"])), m


@pytest.mark.slow
def test_fused_tracked_all_invalid_sample_zero_weighted(tmp_path, assets):
    """A sample whose frames ALL fail the presence gate (new_len==0) must
    not supervise the loss (ADVICE r2: the clamped lengths used to read
    garbage frame 0). Pin: the loss is bit-identical when the faceless
    sample's pixel content changes."""
    _need_presence()
    from lipreading_tpu.data.pipeline import VideoBatch
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.train.loop import FusedTrainer

    presence = load_presence()
    cfg = preset("transformer-attn")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.tf_layers = 1
    cfg.model.tf_dec_layers = 1
    cfg.model.tf_dim = 32
    cfg.model.tf_heads = 2
    cfg.model.tf_mlp = 64
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.mesh.data_parallel = 1
    cfg.train.warmup_steps = 1

    clip = make_clip(33)
    T = 12
    B = 2
    rng = np.random.default_rng(1)
    labels = dict(
        targets=np.pad(rng.integers(3, 30, (B, 5)).astype(np.int32),
                       ((0, 0), (0, 3))),
        target_lengths=np.full((B,), 5, np.int32),
        ctc_labels=rng.integers(3, 30, (B, 6)).astype(np.int32),
        ctc_lengths=np.full((B,), 3, np.int32),
        texts=["x"] * B,
    )

    def batch_with_faceless(seed):
        faceless = blank_out_frames(clip, range(T), seed=seed)[:T]
        return VideoBatch(
            frames=np.stack([faceless, clip.frames[:T]]),
            frame_lengths=np.asarray([T, T], np.int32),
            **labels,
        )

    losses = []
    for i, seed in enumerate((9, 10)):   # two different faceless backgrounds
        tr = FusedTrainer(cfg, str(tmp_path / f"run{i}"),
                          params_to_jax(assets[0]), model_to_jax(assets[1]),
                          presence=presence, tracked=True)
        losses.append(float(tr.train_step(batch_with_faceless(seed))["loss"]))
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1], (
        f"faceless sample's pixels leaked into the loss: {losses}")


@pytest.mark.slow
def test_host_batching_compacts_masked_frames(tmp_path, small_cfg):
    """keep_invalid=True dataview -> BucketedDataset applies skip-frame
    semantics at read time: batches carry only confident frames, lengths
    equal num_valid, and bucketing uses the compacted length."""
    _need_presence()
    from lipreading_tpu.data.dataset import BucketedDataset
    from lipreading_tpu.config import DataConfig as DC

    gaps = {0: [5, 6, 7]}
    view = build_fixture_dataview(
        str(tmp_path / "masked"), n_clips=1, seed=13, data_cfg=small_cfg,
        tracked=True, keep_invalid=True,
        frame_transform=_cutaway_transform(gaps),
    )
    full = [i for i, s in enumerate(view.samples)
            if s["file"].endswith("_full.npz")][0]
    v = view.frame_valid(full)
    assert view.num_valid(full) == int(v.sum()) < view.num_frames(full)
    np.testing.assert_array_equal(view.roi_u8_compact(full),
                                  view.roi_u8(full)[v])

    ds = BucketedDataset(view, DC(), indices=[full])
    # bucket chosen by the compacted length, not the stored frame count
    assert ds.sample_bucket[0] == ds._bucket_for(view.num_valid(full))
    b = ds.make_batch([0])
    assert int(b.frame_lengths[0]) == min(view.num_valid(full),
                                          ds.sample_bucket[0])
    np.testing.assert_array_equal(
        b.rois_u8[0, : b.frame_lengths[0]],
        view.roi_u8_compact(full)[: b.frame_lengths[0]],
    )
