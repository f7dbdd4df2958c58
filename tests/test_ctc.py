"""CTC loss validated against torch.nn.CTCLoss (the reference's op —
torch-cpu is in-image purely as a test oracle, SURVEY.md §3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.ops.ctc import ctc_loss


def _torch_ctc(logits, labels, in_lens, lab_lens, blank=0):
    torch = pytest.importorskip("torch")
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)  # [T,B,V]
    loss = torch.nn.CTCLoss(blank=blank, reduction="none")(
        lp, torch.tensor(labels), torch.tensor(in_lens), torch.tensor(lab_lens)
    )
    return loss.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_ctc_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, T, V, L = 5, 24, 12, 7
    logits = rng.normal(0, 2, (B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    in_lens = rng.integers(L * 2 + 2, T + 1, (B,)).astype(np.int32)
    lab_lens = rng.integers(1, L + 1, (B,)).astype(np.int32)
    want = _torch_ctc(logits, labels, in_lens, lab_lens)
    got = np.asarray(
        ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                 jnp.asarray(in_lens), jnp.asarray(lab_lens))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_repeated_labels():
    rng = np.random.default_rng(2)
    B, T, V = 3, 20, 8
    logits = rng.normal(0, 1, (B, T, V)).astype(np.float32)
    labels = np.asarray([[1, 1, 2, 2], [3, 3, 3, 3], [1, 2, 1, 2]], np.int32)
    in_lens = np.asarray([20, 20, 18], np.int32)
    lab_lens = np.asarray([4, 4, 4], np.int32)
    want = _torch_ctc(logits, labels, in_lens, lab_lens)
    got = np.asarray(
        ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                 jnp.asarray(in_lens), jnp.asarray(lab_lens))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_gradient_finite():
    rng = np.random.default_rng(3)
    B, T, V, L = 2, 16, 10, 5
    logits = rng.normal(0, 1, (B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    in_lens = np.asarray([16, 12], np.int32)
    lab_lens = np.asarray([5, 3], np.int32)

    def f(x):
        return ctc_loss(x, jnp.asarray(labels), jnp.asarray(in_lens),
                        jnp.asarray(lab_lens)).sum()

    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    # grads at t >= input_length must be exactly zero
    assert np.abs(np.asarray(g)[1, 12:]).max() == 0.0


def test_ctc_grad_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    B, T, V, L = 3, 18, 9, 4
    logits = rng.normal(0, 1.5, (B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    in_lens = np.asarray([18, 15, 11], np.int32)
    lab_lens = np.asarray([4, 2, 3], np.int32)

    tl = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = torch.nn.CTCLoss(blank=0, reduction="sum")(
        lp, torch.tensor(labels), torch.tensor(in_lens), torch.tensor(lab_lens)
    )
    loss.backward()
    want = tl.grad.numpy()

    g = jax.grad(
        lambda x: ctc_loss(x, jnp.asarray(labels), jnp.asarray(in_lens),
                           jnp.asarray(lab_lens)).sum()
    )(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-3, atol=1e-4)


def test_viterbi_align_collapses_to_labels():
    """Forced alignment emits exactly the given labels when feasible."""
    from lipreading_tpu.ops.ctc import ctc_viterbi_align

    rng = np.random.default_rng(7)
    B, T, V, L = 3, 12, 8, 4
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(0, 2, (B, T, V)).astype(np.float32)), axis=-1)
    labels = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    in_len = jnp.asarray([12, 10, 9], np.int32)
    lab_len = jnp.asarray([4, 3, 2], np.int32)
    path = np.asarray(ctc_viterbi_align(logp, labels, in_len, lab_len))
    for b in range(B):
        row = path[b, : int(in_len[b])]
        # collapse: drop repeats then blanks
        col = [row[0]] + [c for i, c in enumerate(row[1:]) if c != row[i]]
        col = [c for c in col if c != 0]
        assert col == list(np.asarray(labels)[b, : int(lab_len[b])]), (b, row)
        assert (path[b, int(in_len[b]):] == 0).all()


def test_viterbi_align_matches_bruteforce_score():
    """The Viterbi path is the argmax over ALL feasible alignments (checked
    against exhaustive enumeration on a tiny lattice)."""
    import itertools

    from lipreading_tpu.ops.ctc import ctc_viterbi_align

    rng = np.random.default_rng(3)
    T, V = 6, 5
    labels = [2, 4]
    logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(0, 1.5, (1, T, V)).astype(np.float32)),
        axis=-1))

    def collapse(path):
        out = [path[0]] + [c for i, c in enumerate(path[1:]) if c != path[i]]
        return [c for c in out if c != 0]

    best, best_p = -1e30, None
    for path in itertools.product(range(V), repeat=T):
        if collapse(list(path)) != labels:
            continue
        score = sum(logp[0, t, path[t]] for t in range(T))
        if score > best:
            best, best_p = score, list(path)
    got = np.asarray(ctc_viterbi_align(
        jnp.asarray(logp), jnp.asarray([labels], np.int32),
        jnp.asarray([T], np.int32), jnp.asarray([2], np.int32)))[0]
    got_score = sum(logp[0, t, got[t]] for t in range(T))
    assert got_score == pytest.approx(best, abs=1e-4), (got, best_p)
