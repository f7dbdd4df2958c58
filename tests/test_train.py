"""Training loop, dataview, checkpoint/resume (BASELINE config 3 machinery)."""

import os

import numpy as np
import pytest

from lipreading_tpu.config import preset
from lipreading_tpu.data.dataset import BatchIterator, BucketedDataset
from lipreading_tpu.data.dataview import (
    Dataview,
    build_fixture_dataview,
    roi_to_u8,
    u8_to_roi,
)
from lipreading_tpu.train.loop import Trainer


def tiny_cfg():
    cfg = preset("bigru-ctc")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.gru_hidden = 32
    cfg.model.gru_layers = 1
    cfg.model.dtype = "float32"
    cfg.data.batch_size = 2
    cfg.data.time_buckets = (16, 24, 32, 64)
    cfg.train.learning_rate = 1e-3
    cfg.train.warmup_steps = 10
    cfg.train.log_every = 20
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.mesh.data_parallel = 1
    return cfg


@pytest.fixture(scope="module")
def dataview(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dv"))
    cfg = tiny_cfg()
    return build_fixture_dataview(path, n_clips=2, seed=42, data_cfg=cfg.data,
                                  use_ground_truth_landmarks=True)


def test_dataview_roundtrip(dataview):
    view = Dataview(dataview.path)
    assert len(view) == len(dataview)
    roi = view.roi_u8(0)
    assert roi.dtype == np.uint8 and roi.shape[1:] == (96, 96)
    assert view.text(0)
    # u8 <-> normalized roundtrip within quantization error
    from lipreading_tpu.config import PreprocessConfig

    pre = PreprocessConfig()
    norm = u8_to_roi(roi, pre)
    back = roi_to_u8(norm, pre)
    assert (back == roi).all()


def test_iterator_deterministic_and_resumable(dataview):
    cfg = tiny_cfg()
    ds = BucketedDataset(dataview, cfg.data)
    a = BatchIterator(ds, 2, seed=7)
    texts_a = [tuple(next(a).texts) for _ in range(6)]
    b = BatchIterator(ds, 2, seed=7)
    texts_b = [tuple(next(b).texts) for _ in range(6)]
    assert texts_a == texts_b
    # resume from mid-stream state
    c = BatchIterator(ds, 2, seed=7)
    for _ in range(3):
        next(c)
    d = BatchIterator.from_state(ds, 2, c.state)
    assert [tuple(next(c).texts) for _ in range(3)] == [
        tuple(next(d).texts) for _ in range(3)
    ]


def test_batch_shapes_static_per_bucket(dataview):
    cfg = tiny_cfg()
    ds = BucketedDataset(dataview, cfg.data)
    it = BatchIterator(ds, 2, seed=0)
    shapes = set()
    for _ in range(6):
        b = next(it)
        shapes.add(b.rois_u8.shape)
        assert b.rois_u8.shape[1] in cfg.data.time_buckets
        assert (b.frame_lengths <= b.rois_u8.shape[1]).all()
    assert len(shapes) <= len(cfg.data.time_buckets)


@pytest.mark.slow
def test_overfit_loss_decreases(dataview, tmp_path):
    cfg = tiny_cfg()
    ds = BucketedDataset(dataview, cfg.data)
    it = BatchIterator(ds, 2, seed=0)
    tr = Trainer(cfg, str(tmp_path / "run"))
    first = tr.train_step(next(it))
    losses = [float(first["loss"])]
    for _ in range(59):
        losses.append(float(tr.train_step(next(it))["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_warm_start_finetune(dataview, tmp_path):
    """warm_start seeds the params from a pretrained tree with a FRESH
    optimizer at step 0 (scripts/train.py init_from=), and training
    proceeds from those weights."""
    import jax

    cfg = tiny_cfg()
    ds = BucketedDataset(dataview, cfg.data)
    it = BatchIterator(ds, 2, seed=0)
    tr = Trainer(cfg, str(tmp_path / "pre"))
    for _ in range(3):
        tr.train_step(next(it))
    pretrained = jax.tree.map(np.asarray, tr.params)

    tr2 = Trainer(cfg, str(tmp_path / "ft"), seed=123)   # different init
    tr2.warm_start(pretrained)
    assert tr2.step == 0
    for a, b in zip(jax.tree.leaves(tr2.params), jax.tree.leaves(pretrained)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    m = tr2.train_step(next(BatchIterator(ds, 2, seed=0)))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_checkpoint_save_restore(dataview, tmp_path):
    import jax

    cfg = tiny_cfg()
    ds = BucketedDataset(dataview, cfg.data)
    it = BatchIterator(ds, 2, seed=0)
    tr = Trainer(cfg, str(tmp_path / "run"))
    for _ in range(3):
        tr.train_step(next(it))
    tr.save(it)

    tr2 = Trainer(cfg, str(tmp_path / "run"), seed=123)  # different init
    it_state = tr2.restore()
    assert tr2.step == 3
    assert it_state["pos"] == it.state["pos"]
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored trainer must continue training identically
    it3 = BatchIterator.from_state(ds, 2, it_state)
    m1 = tr.train_step(next(it))
    m2 = tr2.train_step(next(it3))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6


def test_metrics_jsonl_written(dataview, tmp_path):
    cfg = tiny_cfg()
    cfg.train.log_every = 1
    ds = BucketedDataset(dataview, cfg.data)
    it = BatchIterator(ds, 2, seed=0)
    tr = Trainer(cfg, str(tmp_path / "run"))
    tr.fit(it, steps=2)
    log = os.path.join(str(tmp_path / "run"), "logs", "metrics.jsonl")
    assert os.path.exists(log)
    import json

    recs = [json.loads(line) for line in open(log)]
    assert any("loss" in r for r in recs)


def test_split_by_clip(dataview):
    from lipreading_tpu.data.dataview import clip_id_of, split_by_clip

    splits = split_by_clip(dataview, {"train": 0.5, "val": 0.5}, seed=0)
    assert set(splits) == {"train", "val"}
    assert sorted(splits["train"] + splits["val"]) == list(range(len(dataview)))
    # no clip straddles splits
    tr_clips = {clip_id_of(dataview.samples[i]) for i in splits["train"]}
    va_clips = {clip_id_of(dataview.samples[i]) for i in splits["val"]}
    assert not (tr_clips & va_clips)


def test_bucketed_dataset_split_subset(dataview):
    from lipreading_tpu.data.dataview import split_by_clip

    cfg = tiny_cfg()
    splits = split_by_clip(dataview, {"train": 0.5, "val": 0.5}, seed=0)
    ds = BucketedDataset(dataview, cfg.data, indices=splits["train"])
    assert len(ds) == len(splits["train"])
    b = ds.make_batch(list(range(min(2, len(ds)))))
    want = {dataview.text(i) for i in splits["train"]}
    assert set(b.texts) <= want


def test_evaluate_dataview_split_plumbing(dataview, capsys):
    """scripts/evaluate.py dataview mode: split eval runs end to end."""
    import importlib.util
    import jax

    from lipreading_tpu.models.lipreader import init_model

    spec = importlib.util.spec_from_file_location(
        "eval_script", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "evaluate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = tiny_cfg()
    params = init_model(jax.random.PRNGKey(0), cfg)
    # the tiny fixture dataview has too few clips for a val split; eval the
    # train split and assert the empty-split guard fires loudly for "val"
    # (ADVICE r1: the old code silently evaluated the WHOLE dataview)
    mod.evaluate_dataview(params, cfg, dataview.path, "train", beam=1)
    out = capsys.readouterr().out
    assert "CER=" in out
    # decode=cascade: the serving path (batched greedy + trigger-gated beam
    # rescoring) is plumbed through dataview eval and reports its rescore
    # count
    mod.evaluate_dataview(params, cfg, dataview.path, "train", beam=4,
                          decode="cascade")
    out = capsys.readouterr().out
    assert "CER=" in out and "rescored=" in out, out
    with pytest.raises(SystemExit, match="missing or empty"):
        mod.evaluate_dataview(params, cfg, dataview.path, "val", beam=1)


def test_evaluate_cli_dataview_subprocess(dataview):
    """The documented CLI — `python scripts/evaluate.py dataview=... `
    with the flagship decode knobs — runs green AS A SCRIPT (VERDICT r2
    weak #1: evaluate_dataview used to be defined after the __main__
    block, so the script path died with NameError while the importlib
    test above stayed green)."""
    import subprocess
    import sys

    from lipreading_tpu.data.dataview import split_by_clip

    root = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""          # keep the axon backend out
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "evaluate.py"),
         "workdir=/nonexistent", "release=nonexistent",
         f"dataview={dataview.path}", "split=train",
         "lm_weight=0.4", "lexicon=1", "beam=4",
         "model.frontend_channels=4,8,12", "model.frontend_dim=32",
         "model.gru_hidden=32", "model.gru_layers=1", "model.dtype=float32"],
        env=env, cwd=root, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CER=" in r.stdout, r.stdout
    # ragged-tail handling: every split sample is scored, none dropped
    import re as _re

    m = _re.search(r"(\d+) samples", r.stdout)
    n_train = len(split_by_clip(dataview, {"train": 0.9, "val": 0.1},
                                seed=0)["train"])
    assert m and int(m.group(1)) == n_train, r.stdout


def test_variation_dataview_builds(tmp_path):
    """Styled-corpus dataview with robust assets (round-2 robustness path)."""
    import os as _os

    from lipreading_tpu.preproc_training import ASSETS_DIR

    if not _os.path.exists(_os.path.join(ASSETS_DIR, "ert_robust.npz")):
        pytest.skip("robust assets not built")
    cfg = tiny_cfg()
    view = build_fixture_dataview(
        str(tmp_path / "dv"), n_clips=1, seed=77, data_cfg=cfg.data,
        variation=0.6, assets_variant="robust",
    )
    assert len(view) >= 2
    roi = view.roi_u8(0)
    # a mouth is in frame: the ROI must have real contrast
    assert roi.std() > 10


def test_merge_dataviews(dataview, tmp_path):
    """Corpus composition: merged view preserves samples (prefixed ids),
    keeps source clips distinct for split_by_clip, rejects meta mismatch."""
    from lipreading_tpu.data.dataview import merge_dataviews, split_by_clip

    cfg = tiny_cfg()
    other = build_fixture_dataview(
        str(tmp_path / "b"), n_clips=1, seed=77, data_cfg=cfg.data,
        use_ground_truth_landmarks=True,
    )
    merged = merge_dataviews(str(tmp_path / "m"),
                             [dataview.path, other.path])
    assert len(merged) == len(dataview) + len(other)
    np.testing.assert_array_equal(merged.roi_u8(0), dataview.roi_u8(0))
    np.testing.assert_array_equal(merged.roi_u8(len(dataview)),
                                  other.roi_u8(0))
    assert merged.text(len(dataview)) == other.text(0)
    # clip ids carry the source prefix: seed-42 clip0 != seed-77 clip0
    from lipreading_tpu.data.dataview import clip_id_of

    ids = {clip_id_of(s) for s in merged.samples}
    assert len(ids) == 3  # 2 clips from the fixture view + 1 from other
    splits = split_by_clip(merged, {"train": 0.67, "val": 0.33}, seed=0)
    assert set(splits) == {"train", "val"}

    import dataclasses

    from lipreading_tpu.config import PreprocessConfig

    bad_dir = str(tmp_path / "bad")
    bad = build_fixture_dataview(
        bad_dir, n_clips=1, seed=78, data_cfg=cfg.data,
        pre_cfg=PreprocessConfig(roi_size=64),
        use_ground_truth_landmarks=True,
    )
    with pytest.raises(ValueError, match="roi_size"):
        merge_dataviews(str(tmp_path / "m2"), [dataview.path, bad.path])


def test_merge_dataviews_remerge_replaces_stale_files(dataview, tmp_path):
    """Re-merging different sources into the same out_dir must not pair new
    index entries with a previous merge's ROI bytes (files are replaced)."""
    from lipreading_tpu.data.dataview import merge_dataviews

    cfg = tiny_cfg()
    a = build_fixture_dataview(str(tmp_path / "a"), n_clips=1, seed=91,
                               data_cfg=cfg.data,
                               use_ground_truth_landmarks=True)
    c = build_fixture_dataview(str(tmp_path / "c"), n_clips=1, seed=92,
                               data_cfg=cfg.data,
                               use_ground_truth_landmarks=True)
    out = str(tmp_path / "m")
    merge_dataviews(out, [a.path])
    m2 = merge_dataviews(out, [c.path])     # same d00_ prefixed filenames
    np.testing.assert_array_equal(m2.roi_u8(0), c.roi_u8(0))
    assert m2.text(0) == c.text(0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        merge_dataviews(str(tmp_path / "m3"), [])
