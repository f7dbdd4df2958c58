"""Char n-gram LM + shallow fusion (lm.py; ref design space: beam search
with an external LM, 1806.06053)."""

import numpy as np
import pytest

from lipreading_tpu.fixtures import sample_text
from lipreading_tpu.lm import (
    advance_context,
    initial_context,
    lm_perplexity,
    train_char_lm,
)
from lipreading_tpu.text import Vocab


@pytest.fixture(scope="module")
def lm_table():
    texts = [sample_text(np.random.default_rng(i)) for i in range(600)]
    return train_char_lm(texts, order=3)


def test_lm_beats_uniform(lm_table):
    heldout = [sample_text(np.random.default_rng(50_000 + i)) for i in range(50)]
    ppl = lm_perplexity(lm_table, 3, heldout)
    assert ppl < 10.0, ppl   # uniform over 31 symbols would be 31


def test_lm_rows_normalized(lm_table):
    # seen-context rows are proper distributions
    v = Vocab()
    ctx = tuple(v.encode("th"))
    idx = int(ctx[0]) * v.size + int(ctx[1])
    row = np.exp(lm_table[idx])
    assert abs(row.sum() - 1.0) < 1e-3
    # 'e' likely after 'th' in this lexicon
    assert lm_table[idx, v.encode("e")[0]] > lm_table[idx, v.encode("q")[0]]


def test_context_rolling():
    import jax.numpy as jnp

    v = Vocab()
    ctx = initial_context(2, order=3)
    tok = jnp.asarray(v.encode("ab"))
    ctx2 = advance_context(ctx, tok[:1].repeat(2), 3, v.size)
    assert int(ctx2[0]) == (int(ctx[0]) * v.size + int(tok[0])) % v.size**2


def test_fusion_biases_beam(lm_table):
    """With an overwhelming LM weight, the joint beam must follow the LM's
    preferred continuation rather than the (flat) acoustic scores."""
    import jax.numpy as jnp

    from lipreading_tpu.ops.joint_decode import joint_beam_search

    v = Vocab()
    B, beam, T = 1, 4, 6
    BW = B * beam
    V = v.size

    def flat_att(state, toks):
        return state, jnp.zeros((BW, V))

    ids, n = joint_beam_search(
        flat_att, {"h": jnp.zeros((BW, 1))},
        jnp.zeros((BW, T, V)), jnp.full((BW,), T, jnp.int32),
        B, beam, max_len=8, sos=v.sos_id, eos=v.eos_id, blank=v.blank_id,
        ctc_weight=0.0, lm=(jnp.asarray(lm_table), 3), lm_weight=50.0,
    )
    out = v.decode(np.asarray(ids)[0, : int(n[0])])
    # the LM must produce in-distribution text (lexicon words), not noise
    assert len(out) > 0
