"""Boundary-condition battery for the subtle ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.ops.ctc import ctc_loss
from lipreading_tpu.ops.ctc_pallas import ctc_loss_pallas
from lipreading_tpu.ops.decode import beam_search, ctc_greedy_ids


def test_ctc_input_length_one():
    """T=1 with a single-label target: NLL = -logp(label at t0)."""
    logits = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 1, 5))
                         .astype(np.float32))
    labels = jnp.asarray([[3], [2]], jnp.int32)
    in_lens = jnp.asarray([1, 1])
    lab_lens = jnp.asarray([1, 1])
    want = -jax.nn.log_softmax(logits[:, 0], axis=-1)[
        jnp.arange(2), labels[:, 0]]
    for fn in (ctc_loss, ctc_loss_pallas):
        got = fn(logits, labels, in_lens, lab_lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5)


def test_ctc_empty_label_is_all_blank_prob():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 1, (1, 4, 6)).astype(np.float32))
    labels = jnp.zeros((1, 3), jnp.int32)
    want = -jax.nn.log_softmax(logits, axis=-1)[0, :, 0].sum()
    for fn in (ctc_loss, ctc_loss_pallas):
        got = fn(logits, labels, jnp.asarray([4]), jnp.asarray([0]))
        np.testing.assert_allclose(float(got[0]), float(want), rtol=1e-5)


def test_ctc_label_longer_than_frames_is_impossible():
    """A label that cannot fit in the frames must get ~zero probability."""
    logits = jnp.zeros((1, 2, 6))
    labels = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    nll = ctc_loss(logits, labels, jnp.asarray([2]), jnp.asarray([4]))
    assert float(nll[0]) > 1e20  # -log(0)


def test_beam_search_no_eos_hits_max_len():
    """A model that never emits eos: beams run to max_len, lengths==max_len."""
    V, B, W, L = 6, 2, 3, 5
    table = np.full((V, V), -10.0, np.float32)
    table[:, 3] = 0.0   # always prefer token 3; eos (2) never wins
    tbl = jnp.asarray(table)

    def step(state, toks):
        return state, tbl[toks]

    ids, lens = beam_search(step, {"h": jnp.zeros((B * W, 1))}, B, W, L, 1, 2,
                            length_penalty=0.0)
    assert (np.asarray(lens) == L).all()
    assert (np.asarray(ids) == 3).all()


def test_ctc_greedy_all_blank():
    logits = np.full((1, 5, 4), -5.0, np.float32)
    logits[..., 0] = 5.0   # blank wins everywhere
    ids, n = ctc_greedy_ids(jnp.asarray(logits), jnp.asarray([5]))
    assert int(n[0]) == 0


def test_roi_nonsquare_frames():
    """The sampler spec holds for H != W frames."""
    from lipreading_tpu.oracle.roi import sample_roi
    from lipreading_tpu.ops.roi import sample_rois_xla

    rng = np.random.default_rng(2)
    gray = rng.uniform(0, 255, (120, 200)).astype(np.float32)
    box = (150, 60, 50)
    want = sample_roi(gray, (box[0], box[1], box[2], box[2]), 96)
    want = ((want / 255.0) - np.float32(0.421)) / np.float32(0.165)
    got = np.asarray(sample_rois_xla(
        jnp.asarray(gray)[None], jnp.asarray([box], jnp.int32), 96))[0]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_mouth_box_nonsquare_clamping():
    from lipreading_tpu.ops.preprocess import mouth_boxes_from_landmarks

    lm = np.zeros((1, 68, 2), np.float32)
    lm[0, 48:68, 0] = np.linspace(180, 260, 20)    # mouth past right edge
    lm[0, 48:68, 1] = np.linspace(100, 118, 20)
    box = np.asarray(mouth_boxes_from_landmarks(jnp.asarray(lm), 0.3, 120, 200))
    x0, y0, s = box[0]
    assert x0 + s <= 200 and y0 + s <= 120 and x0 >= 0 and y0 >= 0


def test_dataset_truncates_overlong_samples(tmp_path):
    """Samples longer than the largest bucket get head-truncated, not crash."""
    from lipreading_tpu.config import DataConfig, PreprocessConfig
    from lipreading_tpu.data.dataset import BucketedDataset
    from lipreading_tpu.data.dataview import DataviewWriter, Dataview

    cfg = DataConfig(time_buckets=(8, 16))
    w = DataviewWriter(str(tmp_path), cfg, PreprocessConfig())
    w.add("clip00000_cue00", np.zeros((40, 96, 96), np.uint8), "long sample")
    w.finalize()
    ds = BucketedDataset(Dataview(str(tmp_path)), cfg)
    b = ds.make_batch([0])
    assert b.rois_u8.shape[1] == 16
    assert b.frame_lengths[0] == 16


def test_vocab_unknown_char_raises():
    from lipreading_tpu.text import Vocab

    v = Vocab()
    # normalize strips unknowns before encode; raw encode of normalized text
    # never sees them — verify the normalize contract
    assert v.decode(v.encode("Héllo, wörld!")) == "h llo w rld"
