"""Pallas CTC greedy-decode kernel vs the XLA version (interpret on CPU)."""

import numpy as np

import jax.numpy as jnp

from lipreading_tpu.ops.decode import ctc_greedy_ids
from lipreading_tpu.ops.decode_pallas import ctc_greedy_ids_pallas


def test_matches_xla_decode():
    rng = np.random.default_rng(0)
    B, T, V = 5, 32, 31
    logits = rng.normal(0, 2, (B, T, V)).astype(np.float32)
    lens = np.asarray([32, 20, 11, 1, 32], np.int32)
    a_ids, a_len = ctc_greedy_ids(jnp.asarray(logits), jnp.asarray(lens))
    b_ids, b_len = ctc_greedy_ids_pallas(jnp.asarray(logits), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(a_len), np.asarray(b_len))
    np.testing.assert_array_equal(np.asarray(a_ids), np.asarray(b_ids))


def test_collapse_semantics():
    # hand-built lattice: argmax path = [b, a, a, b, a, c, c] -> "a a c"
    V = 5
    path = [0, 1, 1, 0, 1, 2, 2]
    logits = np.full((1, len(path), V), -5.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 5.0
    ids, n = ctc_greedy_ids_pallas(
        jnp.asarray(logits), jnp.asarray([len(path)], np.int32)
    )
    assert int(n[0]) == 3
    assert list(np.asarray(ids)[0, :3]) == [1, 1, 2]
