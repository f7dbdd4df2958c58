"""Importer round-trip: torch modules of the reference's types -> our pytrees
-> identical outputs (the machinery behind the fp32 transcript parity gate,
SURVEY.md §6 Checkpoint/resume)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lipreading_tpu.models import nn as jnn  # noqa: E402
from lipreading_tpu.models.gru import bigru  # noqa: E402
from lipreading_tpu.train import importer  # noqa: E402


def test_linear_roundtrip():
    torch.manual_seed(0)
    m = torch.nn.Linear(6, 4)
    x = torch.randn(3, 6)
    want = m(x).detach().numpy()
    p = importer.import_linear(m.state_dict())
    got = np.asarray(jnn.dense(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_linear_prefixed():
    torch.manual_seed(1)
    model = torch.nn.Sequential(torch.nn.Linear(5, 7))
    sd = model.state_dict()
    p = importer.import_linear(sd, "0")
    x = torch.randn(2, 5)
    want = model(x).detach().numpy()
    got = np.asarray(jnn.dense(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv3d_roundtrip():
    torch.manual_seed(2)
    m = torch.nn.Conv3d(2, 5, kernel_size=(3, 3, 3), padding=(1, 1, 1))
    x = torch.randn(1, 2, 4, 8, 8)                    # NCDHW
    want = m(x).detach().numpy()                      # [1, 5, 4, 8, 8]
    p = importer.import_conv3d({f"c.{k}": v for k, v in m.state_dict().items()}, "c")
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))  # NDHWC
    got = np.asarray(jnn.conv3d(p, xj))
    got = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bigru_roundtrip():
    torch.manual_seed(3)
    B, T, D, H = 2, 7, 5, 6
    m = torch.nn.GRU(D, H, num_layers=2, batch_first=True, bidirectional=True)
    sd = {f"g.{k}": v for k, v in m.state_dict().items()}
    p = importer.import_bigru(sd, "g", layers=2)
    x = torch.randn(B, T, D)
    want, _ = m(x)
    got = np.asarray(
        bigru(p, jnp.asarray(x.numpy()), jnp.asarray([T, T]))
    )
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_embedding_roundtrip():
    torch.manual_seed(4)
    m = torch.nn.Embedding(11, 8)
    p = importer.import_embedding({f"e.{k}": v for k, v in m.state_dict().items()}, "e")
    ids = np.asarray([[1, 5, 10], [0, 2, 3]])
    want = m(torch.tensor(ids)).detach().numpy()
    got = np.asarray(jnn.embedding(p, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_frozen_batchnorm_fold():
    torch.manual_seed(5)
    m = torch.nn.BatchNorm3d(4)
    m.eval()
    with torch.no_grad():
        m.running_mean += torch.randn(4) * 0.3
        m.running_var *= torch.rand(4) + 0.5
        m.weight *= 1.3
        m.bias += 0.2
    x = torch.randn(2, 4, 3, 5, 5)
    want = m(x).detach().numpy()
    p = importer.import_batchnorm_as_scale_bias(
        {f"bn.{k}": v for k, v in m.state_dict().items()}, "bn"
    )
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = np.transpose(
        np.asarray(importer.apply_frozen_bn(p, xj)), (0, 4, 1, 2, 3)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_torch_ckpt_file_roundtrip(tmp_path):
    torch.manual_seed(6)
    model = torch.nn.Sequential(torch.nn.Linear(4, 9), torch.nn.ReLU(),
                                torch.nn.Linear(9, 3))
    path = str(tmp_path / "ckpt.pt")
    torch.save(model.state_dict(), path)
    sd = importer.load_torch_state_dict(path)
    p0 = importer.import_linear(sd, "0")
    p2 = importer.import_linear(sd, "2")
    x = torch.randn(5, 4)
    want = model(x).detach().numpy()
    h = jnp.maximum(jnn.dense(p0, jnp.asarray(x.numpy())), 0.0)
    got = np.asarray(jnn.dense(p2, h))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
