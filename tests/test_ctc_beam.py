"""CTC prefix beam search vs exact path enumeration on tiny lattices."""

import numpy as np
import pytest

from lipreading_tpu.ops.ctc_beam import (
    ctc_beam_decode_batch,
    ctc_brute_force_best,
    ctc_prefix_beam_search,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    T, V = 5, 4
    logits = rng.normal(0, 2, (T, V))
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    want_ids, want_lp = ctc_brute_force_best(lp)
    # unbounded beam keeps every prefix -> exact inference
    got_ids, got_lp = ctc_prefix_beam_search(lp, beam_width=4096, prune_topk=V)
    assert got_ids == want_ids
    np.testing.assert_allclose(got_lp, want_lp, rtol=1e-6)
    # a practical beam width still finds the same argmax labeling here
    ids32, _ = ctc_prefix_beam_search(lp, beam_width=32, prune_topk=V)
    assert ids32 == want_ids


def test_beam_beats_greedy_on_adversarial_lattice():
    """Classic case where greedy argmax is wrong: probability mass of one
    labeling is split across many paths."""
    # V=2 (blank, 'a'); each frame slightly favors blank, but all non-empty
    # paths collapse to 'a' and together outweigh the all-blank path.
    lp = np.log(np.asarray([
        [0.6, 0.4],
        [0.4, 0.6],
        [0.6, 0.4],
    ]))
    ids, _ = ctc_prefix_beam_search(lp, beam_width=8, prune_topk=2)
    greedy = [0, 1, 0]  # argmax per frame -> 'a'
    # brute force to know the truth
    want_ids, _ = ctc_brute_force_best(lp)
    assert ids == want_ids


def test_batch_decode_respects_lengths():
    rng = np.random.default_rng(5)
    lp = rng.normal(0, 1, (2, 6, 5))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    outs = ctc_beam_decode_batch(lp, np.asarray([6, 3]), beam_width=8)
    assert len(outs) == 2
    # decoding only the prefix must equal decoding the truncated lattice
    want, _ = ctc_prefix_beam_search(lp[1, :3], beam_width=8)
    assert outs[1] == want
