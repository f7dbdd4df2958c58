"""Joint CTC/attention one-pass beam search (ops/joint_decode.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.ops.ctc_beam import ctc_prefix_beam_search
from lipreading_tpu.ops.joint_decode import joint_beam_search


def _strip_eos(ids, n, eos=2):
    return [int(x) for x in ids[:n] if x != eos]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lambda1_equals_ctc_prefix_beam(seed):
    """With ctc_weight=1 and a flat attention model, joint decoding must find
    the same labeling as exact CTC prefix beam search."""
    rng = np.random.default_rng(seed)
    B, T, V = 2, 7, 6
    logits = rng.normal(0, 1.5, (B, T, V)).astype(np.float32)
    logits[:, :, 1] = -20.0   # sos/eos never in the CTC lattice
    logits[:, :, 2] = -20.0
    lens = np.asarray([7, 5], np.int32)
    beam = 16
    BW = B * beam

    def flat_att(state, toks):
        return state, jnp.zeros((BW, V))

    ids, out_len = joint_beam_search(
        flat_att, {"h": jnp.zeros((BW, 1))},
        jnp.repeat(jnp.asarray(logits), beam, axis=0),
        jnp.repeat(jnp.asarray(lens), beam, axis=0),
        B, beam, max_len=8, sos=1, eos=2, blank=0,
        ctc_weight=1.0, length_penalty=0.0,
    )
    ids = np.asarray(ids)
    out_len = np.asarray(out_len)
    for b in range(B):
        lp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(logits[b, : lens[b]]), axis=-1))
        want, _ = ctc_prefix_beam_search(lp, beam_width=4096, prune_topk=V)
        assert _strip_eos(ids[b], out_len[b]) == want


def test_lambda0_matches_attention_beam():
    """With ctc_weight=0 the joint search must reproduce the plain attention
    beam search (same scoring, same tie-breaking)."""
    from lipreading_tpu.ops.decode import beam_search

    rng = np.random.default_rng(3)
    B, T, V, beam = 2, 5, 7, 4
    BW = B * beam
    # a stateful toy "decoder": logits depend on the previous token
    table = jnp.asarray(rng.normal(0, 1.5, (V, V)).astype(np.float32))

    def step(state, toks):
        return state, table[toks]

    state = {"h": jnp.zeros((BW, 1))}
    a_ids, a_len = beam_search(step, state, B, beam, 6, 1, 2,
                               length_penalty=0.0)
    lattice = jnp.zeros((BW, T, V))
    j_ids, j_len = joint_beam_search(
        step, state, lattice, jnp.full((BW,), T, jnp.int32),
        B, beam, 6, 1, 2, blank=0, ctc_weight=0.0, length_penalty=0.0,
    )
    np.testing.assert_array_equal(np.asarray(a_len), np.asarray(j_len))
    for b in range(B):
        assert _strip_eos(np.asarray(a_ids)[b], a_len[b]) == \
            _strip_eos(np.asarray(j_ids)[b], j_len[b])


def test_hybrid_transcribe_uses_joint():
    """transcribe() on a hybrid model with beam > 1 goes through the joint
    path and returns strings."""
    from lipreading_tpu.config import preset
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.models.lipreader import init_model
    from tests.test_models import tiny

    cfg = tiny(preset("transformer-attn"))
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    rois = jnp.asarray(rng.normal(0, 1, (2, 10, 96, 96)).astype(np.float32))
    lengths = jnp.asarray([10, 8])
    outs = transcribe(params, cfg, rois, lengths, beam=3)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
