"""Analytic FLOPs accounting vs XLA's own cost analysis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import preset
from lipreading_tpu.flops import (
    model_fwd_flops,
    preprocess_flops,
    train_step_flops,
)
from lipreading_tpu.models.lipreader import compute_loss, init_model


def _xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


@pytest.mark.parametrize("enc,dec", [("bigru", "ctc"), ("bigru", "hybrid"),
                                     ("transformer", "hybrid")])
def test_model_flops_match_xla(enc, dec):
    """Analytic forward FLOPs within ~40% of XLA's count (XLA adds norm /
    softmax / CTC-lattice elementwise work we deliberately exclude)."""
    cfg = preset("bigru-ctc")
    cfg.encoder, cfg.decoder = enc, dec
    cfg.model.dtype = "float32"
    if dec == "hybrid":
        cfg.train.ctc_weight = cfg.train.att_weight = 0.5
    B, T, L = 2, 16, 10
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "rois": jnp.asarray(rng.normal(0, 1, (B, T, 96, 96)).astype(np.float32)),
        "frame_lengths": jnp.asarray([T, T]),
        "targets": jnp.asarray(rng.integers(3, 30, (B, L)).astype(np.int32)),
        "target_lengths": jnp.asarray([L, L]),
        "ctc_labels": jnp.asarray(rng.integers(3, 30, (B, 6)).astype(np.int32)),
        "ctc_lengths": jnp.asarray([6, 6]),
    }
    got = _xla_flops(lambda p, b: compute_loss(p, cfg, b, train=False)[0],
                     params, batch)
    want = B * model_fwd_flops(cfg, T, L)
    assert 0.6 < got / want < 1.7, (got, want, got / want)


def test_train_step_flops_is_3x_forward():
    cfg = preset("bigru-ctc")
    assert train_step_flops(cfg, 4, 32, 10) == pytest.approx(
        3 * 4 * model_fwd_flops(cfg, 32, 10)
    )


def test_preprocess_flops_positive_and_stable():
    cfg = preset("bigru-ctc")
    f = preprocess_flops(cfg.preprocess, 160, 160)
    assert 1e6 < f < 1e9           # per-frame; sanity band
    assert f == preprocess_flops(cfg.preprocess, 160, 160)


def test_trainer_logs_mfu_fields(tmp_path):
    """Trainer.fit logs tflops_per_sec (and mfu when on TPU)."""
    import json
    import os

    from lipreading_tpu.data.dataset import Batch
    from lipreading_tpu.train.loop import Trainer

    cfg = preset("bigru-ctc")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.gru_hidden = 24
    cfg.model.gru_layers = 1
    cfg.model.dtype = "float32"
    cfg.train.log_every = 1
    cfg.mesh.data_parallel = 1
    tr = Trainer(cfg, str(tmp_path / "run"))
    rng = np.random.default_rng(0)
    b = Batch(
        rois_u8=rng.integers(0, 255, (2, 8, 96, 96)).astype(np.uint8),
        frame_lengths=np.asarray([8, 8], np.int32),
        targets=rng.integers(3, 30, (2, 6)).astype(np.int32),
        target_lengths=np.asarray([5, 5], np.int32),
        ctc_labels=rng.integers(3, 30, (2, 3)).astype(np.int32),
        ctc_lengths=np.asarray([3, 3], np.int32),
        texts=["a", "b"],
    )
    class _It:
        epoch = 0

        def __next__(self):
            return b

    last = tr.fit(_It(), steps=2)
    assert "tflops_per_sec" in last and last["tflops_per_sec"] > 0
    log = os.path.join(str(tmp_path / "run"), "logs", "metrics.jsonl")
    rows = [json.loads(l) for l in open(log)]
    assert any("tflops_per_sec" in r for r in rows)


def test_patchify_frontend_flops_match_xla():
    """Patchify-stem analytic FLOPs vs XLA cost analysis (round-3 MFU stem)."""
    cfg = preset("transformer-attn")
    cfg.model.frontend = "patchify"
    cfg.model.dtype = "float32"
    B, T, L = 2, 16, 10
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "rois": jnp.asarray(rng.normal(0, 1, (B, T, 96, 96)).astype(np.float32)),
        "frame_lengths": jnp.asarray([T, T]),
        "targets": jnp.asarray(rng.integers(3, 30, (B, L)).astype(np.int32)),
        "target_lengths": jnp.asarray([L, L]),
        "ctc_labels": jnp.asarray(rng.integers(3, 30, (B, 6)).astype(np.int32)),
        "ctc_lengths": jnp.asarray([6, 6]),
    }
    got = _xla_flops(lambda p, b: compute_loss(p, cfg, b, train=False)[0],
                     params, batch)
    want = B * model_fwd_flops(cfg, T, L)
    assert 0.6 < got / want < 1.7, (got, want, got / want)
