"""Pallas CTC lattice kernels vs the scan reference (interpret mode on CPU;
the same code compiles via mosaic on TPU — bench.py exercises that)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.ops.ctc import ctc_loss
from lipreading_tpu.ops.ctc_pallas import ctc_loss_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_scan(seed):
    rng = np.random.default_rng(seed)
    B, T, V, L = 4, 20, 12, 6
    logits = rng.normal(0, 2, (B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    in_lens = rng.integers(2 * L + 2, T + 1, (B,)).astype(np.int32)
    lab_lens = np.asarray([L, 3, 1, 0], np.int32)
    args = (jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(in_lens), jnp.asarray(lab_lens))
    want = np.asarray(ctc_loss(*args))
    got = np.asarray(ctc_loss_pallas(*args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grad_matches_scan():
    rng = np.random.default_rng(2)
    B, T, V, L = 3, 16, 9, 5
    logits = rng.normal(0, 1.5, (B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    in_lens = np.asarray([16, 13, 12], np.int32)
    lab_lens = np.asarray([5, 2, 3], np.int32)
    rest = (jnp.asarray(labels), jnp.asarray(in_lens), jnp.asarray(lab_lens))
    gw = jax.grad(lambda x: ctc_loss(x, *rest).sum())(jnp.asarray(logits))
    gg = jax.grad(lambda x: ctc_loss_pallas(x, *rest).sum())(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=1e-3, atol=1e-5)
    # zero grads past each sample's input length
    assert np.abs(np.asarray(gg)[1, 13:]).max() == 0.0


def test_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    B, T, V, L = 3, 18, 10, 4
    logits = rng.normal(0, 2, (B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    in_lens = np.asarray([18, 15, 11], np.int32)
    lab_lens = np.asarray([4, 2, 3], np.int32)
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    want = torch.nn.CTCLoss(blank=0, reduction="none")(
        lp, torch.tensor(labels), torch.tensor(in_lens), torch.tensor(lab_lens)
    ).numpy()
    got = np.asarray(ctc_loss_pallas(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(in_lens), jnp.asarray(lab_lens),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
