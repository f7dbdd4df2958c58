"""Quality regression gate: the shipped checkpoint must lip-read held-out
fixture clips (the repo's analogue of 'CER/WER parity vs reference ckpt' —
BASELINE.json:2; the real reference checkpoints don't exist in this
environment, SURVEY.md §0)."""

import numpy as np
import pytest


def test_release_model_heldout_cer(assets):
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import corpus_cer
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import load_release_model

    rel = load_release_model()
    if rel is None:
        pytest.skip("no release checkpoint in assets/")
    params, cfg = rel
    det_np, ert_np = assets
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)

    hyps, refs = [], []
    for i in range(3):  # small on CPU; bench/eval scripts cover more
        clip = make_clip(424242 + i, cfg.data)
        rois = preprocess_padded(det, ert, clip.frames, cfg.preprocess)
        T = rois.shape[0]
        pad = -(-T // 64) * 64
        rois = np.pad(rois, ((0, pad - T), (0, 0), (0, 0)))
        hyps.append(transcribe(params, cfg, rois[None],
                               jnp.asarray([T]), beam=1)[0])
        refs.append(clip.text)
    cer = corpus_cer(hyps, refs)
    assert cer < 0.30, (cer, list(zip(hyps, refs)))


def test_universal_release_covers_both_appearances():
    """The universal release (ONE model for canonical AND styled clips,
    trained on per-clip variation in [0, 0.7) behind the robust stack; v2 =
    1800 merged clips / 16k steps) must lip-read held-out clips of BOTH
    appearances. Measured at export (TPU, beam 8 + LM, 12 clips): canonical
    CER 0.0058, styled(0.6) CER 0.0233 (v1: 0.0000 / 0.0523) — this CPU
    gate uses 2+2 clips, greedy, as a drift pin."""
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import corpus_cer
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import load_assets, load_release_model

    rel = load_release_model("transformer_hybrid_universal")
    if rel is None:
        pytest.skip("universal release not shipped")
    params, cfg = rel
    det_np, ert_np = load_assets(variant="robust")
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)

    hyps, refs = [], []
    for variation in (0.0, 0.6):
        for i in range(2):
            clip = make_clip(515151 + i, cfg.data, variation=variation)
            rois = preprocess_padded(det, ert, clip.frames, cfg.preprocess)
            T = rois.shape[0]
            pad = -(-T // 64) * 64
            rois = np.pad(rois, ((0, pad - T), (0, 0), (0, 0)))
            hyps.append(transcribe(params, cfg, rois[None],
                                   jnp.asarray([T]), beam=1)[0])
            refs.append(clip.text)
    cer = corpus_cer(hyps, refs)
    assert cer < 0.25, (cer, list(zip(hyps, refs)))


def test_universal3_release_covers_both_appearances():
    """Universal-v3 (patchify stem + train.roi_augment, same 1800-clip
    merged corpus as v2 + conv-landmarker-path views) must keep covering
    BOTH appearances. Measured at export (TPU, beam 8 + LM 0.4, seed
    717171): canonical CER 0.0058 == v2's pin, styled(0.6)@24 clips CER
    0.0120 vs v2's 0.0300 — the ROI augmentation recovers (and beats) the
    appearance robustness the non-overlapping 8x8 patch embed lost in the
    unaugmented v3 run (0.0420). This CPU gate: 2+2 clips, greedy."""
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import corpus_cer
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import load_assets, load_release_model

    rel = load_release_model("transformer_hybrid_universal3")
    if rel is None:
        pytest.skip("universal3 release not shipped")
    params, cfg = rel
    assert cfg.model.frontend == "patchify"      # the stem the release trains
    det_np, ert_np = load_assets(variant="robust")
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)

    hyps, refs = [], []
    for variation in (0.0, 0.6):
        for i in range(2):
            clip = make_clip(515151 + i, cfg.data, variation=variation)
            rois = preprocess_padded(det, ert, clip.frames, cfg.preprocess)
            T = rois.shape[0]
            pad = -(-T // 64) * 64
            rois = np.pad(rois, ((0, pad - T), (0, 0), (0, 0)))
            hyps.append(transcribe(params, cfg, rois[None],
                                   jnp.asarray([T]), beam=1)[0])
            refs.append(clip.text)
    cer = corpus_cer(hyps, refs)
    assert cer < 0.25, (cer, list(zip(hyps, refs)))


def test_conv_landmarker_downstream_gate():
    """VERDICT r2 #4: the fast conv-landmarker path is gated on the metric
    that matters — downstream transcript CER vs the ERT path behind the SAME
    release model (SURVEY.md plan-B framing), not just landmark px error.
    Measured at export (TPU, universal3, beam 8 + LM 0.4, seed 717171):
    canonical ERT 0.0058 vs conv 0.0116; styled@24 robust-ERT 0.0120 vs
    robust-conv 0.0300 — at 3.6x preprocessing throughput. This CPU pin:
    greedy transcripts behind the two paths agree on held-out clips."""
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import corpus_cer
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.landmarker import params_to_jax as lmk_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import (load_assets, load_landmarker,
                                                 load_release_model)

    rel = load_release_model("transformer_hybrid_universal3")
    lm_np = load_landmarker()
    if rel is None or lm_np is None:
        pytest.skip("universal3 release or conv landmarker not shipped")
    params, cfg = rel
    det_np, ert_np = load_assets()
    det = params_to_jax(det_np)
    paths = {"ert": model_to_jax(ert_np), "conv": lmk_to_jax(lm_np)}

    cers = {}
    for name, lmk in paths.items():
        # the landmarker is selected by cfg (ops/preprocess.py:63), the
        # model object just has to match it
        pcfg = cfg.override(**{"preprocess.landmarker": name}).preprocess
        hyps, refs = [], []
        for i in range(3):
            clip = make_clip(424242 + i, cfg.data)
            rois = preprocess_padded(det, lmk, clip.frames, pcfg)
            T = rois.shape[0]
            pad = -(-T // 64) * 64
            rois = np.pad(rois, ((0, pad - T), (0, 0), (0, 0)))
            hyps.append(transcribe(params, cfg, rois[None],
                                   jnp.asarray([T]), beam=1)[0])
            refs.append(clip.text)
        cers[name] = corpus_cer(hyps, refs)
    # the gate: the fast path may not degrade transcripts materially
    assert cers["conv"] <= cers["ert"] + 0.05, cers


@pytest.mark.parametrize("release", ["transformer_hybrid_universal",
                                     "transformer_hybrid_universal3"])
def test_cascade_matches_full_beam_on_release(release):
    """Cascade decoding == full joint beam on release-eval clips at the
    default margins. For v2 this INCLUDES the one clip the beam corrects
    (seed 717171+11: greedy reads 'thir', the LM trigger routes it to the
    beam which reads 'this') — pinned so margin defaults cannot silently
    decay. v3 (patchify) must preserve the equality under the same
    margins, whatever its trigger rate."""
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe, transcribe_cascade
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import load_assets, load_release_model

    rel = load_release_model(release)
    if rel is None:
        pytest.skip(f"no {release} release in assets/")
    params, cfg = rel
    det_np, ert_np = load_assets()
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)

    rois_l, lens = [], []
    T_max = 0
    for i in (2, 7, 11):        # easy clip, low-margin clip, beam-corrected
        clip = make_clip(717171 + i, cfg.data)
        r = preprocess_padded(det, ert, clip.frames, cfg.preprocess)
        rois_l.append(r)
        lens.append(r.shape[0])
        T_max = max(T_max, r.shape[0])
    P = -(-T_max // 64) * 64
    rois = np.stack([np.pad(r, ((0, P - r.shape[0]), (0, 0), (0, 0)))
                     for r in rois_l])
    lens = jnp.asarray(lens)
    full = transcribe(params, cfg, rois, lens, beam=8, lm_weight=0.4)
    casc, n_res = transcribe_cascade(params, cfg, rois, lens, beam=8,
                                     lm_weight=0.4, rescore_bucket=4)
    assert casc == full, (casc, full)
    if release == "transformer_hybrid_universal":
        assert 1 <= n_res < 3      # the trigger fires, but not on everything
    else:
        # v3's greedy errs on all three hard clips (single-letter drops:
        # 'tht'/'whd'/'wen'); the triggers catch every one — perfect
        # RECALL is the property that keeps casc == full. Measured on the
        # full 12-clip eval set (r3): triggers fire on exactly the 8
        # greedy-error clips, zero false positives, so the cascade
        # degrades gracefully to full-beam cost only where greedy is
        # actually wrong.
        assert n_res == 3


def test_universal4_release_framewise_and_both_appearances():
    """Universal-v4 (patchify + model.framewise_norm=1, ctc/att 0.5/0.5,
    16k steps on the 2250-clip mixed corpus incl. robust-conv views): the
    first release to carry the pad-invariance root fix IN ITS WEIGHTS
    (VERDICT r3 missing #2). Two pins:

    1. both-appearances coverage (as the v2/v3 gates);
    2. pad invariance on the RELEASE weights: the same clip decodes
       IDENTICALLY padded to bucket 64 and bucket 128 — the property the
       time-pooled GroupNorm releases provably lack (their log-probs shift
       ~1 nat between buckets, BASELINE.md round-3), and the reason
       same-bucket batching crutches demote to a no-op for this model.
    """
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import corpus_cer
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_padded
    from lipreading_tpu.preproc_training import load_assets, load_release_model

    rel = load_release_model("transformer_hybrid_universal4")
    if rel is None:
        pytest.skip("universal4 release not shipped")
    params, cfg = rel
    assert cfg.model.frontend == "patchify"
    assert cfg.model.framewise_norm
    det_np, ert_np = load_assets(variant="robust")
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)

    hyps, refs = [], []
    pad_pairs = []
    for variation in (0.0, 0.6):
        for i in range(2):
            clip = make_clip(515151 + i, cfg.data, variation=variation)
            rois = preprocess_padded(det, ert, clip.frames, cfg.preprocess)
            T = rois.shape[0]
            out = []
            for bucket in (64, 128):
                pad = -(-T // bucket) * bucket
                r = np.pad(rois, ((0, pad - T), (0, 0), (0, 0)))
                out.append(transcribe(params, cfg, r[None],
                                      jnp.asarray([T]), beam=1)[0])
            pad_pairs.append(tuple(out))
            hyps.append(out[0])
            refs.append(clip.text)
    cer = corpus_cer(hyps, refs)
    assert cer < 0.25, (cer, list(zip(hyps, refs)))
    for a, b in pad_pairs:
        assert a == b, ("pad-bucket sensitivity in a framewise release",
                        a, b)
