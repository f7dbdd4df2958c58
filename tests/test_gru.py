"""GRU layer validated against torch.nn.GRU (importer bit-compatibility)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lipreading_tpu.models.gru import bigru, bigru_init, gru_layer
from lipreading_tpu.models.nn import flip_sequences


def _torch_gru_params(tg, layer=0, reverse=False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "w_ih": jnp.asarray(getattr(tg, f"weight_ih{sfx}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(tg, f"weight_hh{sfx}").detach().numpy().T),
        "b_ih": jnp.asarray(getattr(tg, f"bias_ih{sfx}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(tg, f"bias_hh{sfx}").detach().numpy()),
    }


def test_gru_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    B, T, D, H = 3, 11, 6, 8
    tg = torch.nn.GRU(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    want, _ = tg(x)
    p = _torch_gru_params(tg)
    got, h_last = gru_layer(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), want[:, -1].detach().numpy(),
                               rtol=1e-5, atol=1e-5)


def test_bigru_matches_torch_full_length():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    B, T, D, H = 2, 9, 5, 7
    tg = torch.nn.GRU(D, H, batch_first=True, bidirectional=True, num_layers=2)
    x = torch.randn(B, T, D)
    want, _ = tg(x)
    params = {"layers": []}
    for layer in range(2):
        params["layers"].append({
            "fwd": _torch_gru_params(tg, layer, False),
            "bwd": _torch_gru_params(tg, layer, True),
        })
    lengths = jnp.asarray([T, T])
    got = bigru(params, jnp.asarray(x.numpy()), lengths)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_bigru_variable_lengths_match_packed():
    torch = pytest.importorskip("torch")
    torch.manual_seed(2)
    B, T, D, H = 3, 10, 4, 6
    lengths = [10, 7, 4]
    tg = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lengths, batch_first=True, enforce_sorted=False
    )
    out, _ = tg(packed)
    want, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True,
                                                     total_length=T)
    params = {"layers": [{
        "fwd": _torch_gru_params(tg, 0, False),
        "bwd": _torch_gru_params(tg, 0, True),
    }]}
    got = np.asarray(bigru(params, jnp.asarray(x.numpy()), jnp.asarray(lengths)))
    want = want.detach().numpy()
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(got[b, :L], want[b, :L], rtol=1e-4, atol=1e-5)


def test_flip_sequences():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    flipped = flip_sequences(x, jnp.asarray([3]))
    # valid prefix [0,1,2] reversed -> [2,1,0]; padding position clamps
    np.testing.assert_array_equal(
        np.asarray(flipped[0, :3, 0]), np.asarray([6.0, 3.0, 0.0])
    )
