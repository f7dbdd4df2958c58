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


def test_transcribe_lm_weight_reaches_joint_decode(monkeypatch, lm_table):
    """Regression: lm_weight must actually reach joint_beam_search (a silent
    patch failure once made LM fusion a no-op in the transcribe path)."""
    import jax
    import jax.numpy as jnp

    from lipreading_tpu import infer
    from lipreading_tpu.config import preset
    from lipreading_tpu.models.lipreader import init_model
    from tests.test_models import tiny

    # ship a fake LM into the cache so _load_lm returns one
    infer._LM_CACHE["lm"] = (jnp.asarray(lm_table), 3)
    seen = {}
    import lipreading_tpu.ops.joint_decode as jd

    real = jd.joint_beam_search

    def spy(*args, **kw):
        seen["lm"] = kw.get("lm")
        seen["lm_weight"] = kw.get("lm_weight")
        return real(*args, **kw)

    monkeypatch.setattr(jd, "joint_beam_search", spy)
    # infer imports joint_beam_search inside the function from the module, so
    # the monkeypatch on the module attribute is what it resolves
    cfg = tiny(preset("transformer-attn"))
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    rois = jnp.asarray(rng.normal(0, 1, (1, 10, 96, 96)).astype(np.float32))
    infer.decode_ids(params, cfg, rois, jnp.asarray([10]), beam=2,
                     lm_weight=0.5)
    assert seen["lm"] is not None and seen["lm_weight"] == 0.5
    infer._LM_CACHE.clear()
