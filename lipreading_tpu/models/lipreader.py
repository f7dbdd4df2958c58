"""Flagship composed models + training losses.

Mirrors the reference's model families (SURVEY.md §3, BASELINE configs 3-4):

    encoder="bigru"       : 3D-CNN frontend -> bi-GRU            (config 3)
    encoder="transformer" : 3D-CNN frontend -> transformer enc   (config 4)
    decoder="ctc"         : linear CTC head, greedy/beam CTC decode
    decoder="attention"   : autoregressive attention decoder
    decoder="hybrid"      : both heads, loss = ctc_w * CTC + att_w * CE
                            (LCANet's cascaded attention-CTC, 1803.04988)

The attention decoder is the Bahdanau GRU when the encoder is the bi-GRU
(reference's AttnDecoder path) and the transformer decoder otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lipreading_tpu.config import Config
from lipreading_tpu.models import nn
from lipreading_tpu.models.attention import attn_decoder_init, teacher_forced_logits
from lipreading_tpu.models.frontend3d import (
    frontend_apply,
    frontend_init,
    patchify_apply,
    patchify_init,
)
from lipreading_tpu.models.gru import bigru, bigru_init
from lipreading_tpu.models import transformer as tf
from lipreading_tpu.ops.ctc import ctc_loss_best


def _act_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32


def init_model(key, cfg: Config):
    m = cfg.model
    ks = jax.random.split(key, 4)
    fe_init = patchify_init if m.frontend == "patchify" else frontend_init
    params = {"frontend": fe_init(ks[0], m)}
    if cfg.encoder == "bigru":
        params["encoder"] = bigru_init(ks[1], m.frontend_dim, m.gru_hidden,
                                       m.gru_layers)
        enc_dim = 2 * m.gru_hidden
    elif cfg.encoder == "transformer":
        params["encoder"] = tf.encoder_init(ks[1], m, m.frontend_dim)
        enc_dim = m.tf_dim
    else:
        raise ValueError(f"unknown encoder {cfg.encoder!r}")

    if cfg.decoder in ("ctc", "hybrid"):
        params["ctc_head"] = nn.dense_init(ks[2], enc_dim, m.vocab_size)
    if cfg.decoder in ("attention", "hybrid"):
        if cfg.encoder == "bigru":
            params["att_decoder"] = attn_decoder_init(ks[3], m, enc_dim)
        else:
            params["att_decoder"] = tf.decoder_init(ks[3], m)
    return params


def encode(params, cfg: Config, rois, frame_lengths, dtype=None, rng=None,
           mesh=None):
    """[B, T, R, R] + lengths -> [B, T, D] encoder states.

    ``rng`` enables dropout (training); None = deterministic (eval).
    ``mesh`` + cfg.mesh.sequence_parallel routes the transformer encoder
    through the ring-attention time-sharded path (parallel/ring.py): the
    encoder's time axis shards over the ``model`` mesh axis and k/v blocks
    rotate over ICI — exact attention, test-pinned equal to the unsharded
    encoder in eval mode.
    """
    dtype = dtype or _act_dtype(cfg)
    rate = cfg.model.dropout
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    if cfg.model.frontend == "patchify":
        def _fe(fp, r, k):
            return patchify_apply(fp, r, cfg.model, dtype,
                                  dropout_rng=k, rate=rate)
    else:
        def _fe(fp, r, k):
            return frontend_apply(fp, r, dtype, dropout_rng=k, rate=rate,
                                  framewise_norm=cfg.model.framewise_norm)
    if cfg.train.remat:
        # rematerialize the conv stack on the backward pass: trades ~20%
        # frontend FLOPs for not holding [B, T, 48, 48, C] activations in HBM.
        # dtype/rate stay closure constants (static under the checkpoint).
        feats = jax.checkpoint(_fe)(params["frontend"], rois, k1)
    else:
        feats = _fe(params["frontend"], rois, k1)
    mp_live = mesh is not None and mesh.shape.get(cfg.mesh.model_axis, 1) > 1
    sp = mp_live and cfg.mesh.sequence_parallel
    pp = mp_live and cfg.mesh.pipeline_parallel
    if sp and pp:
        raise ValueError(
            "sequence_parallel and pipeline_parallel are exclusive uses "
            "of the model mesh axis"
        )
    if cfg.encoder == "bigru":
        if sp or pp:
            raise ValueError(
                "sequence/pipeline parallelism requires the transformer "
                "encoder (the bi-GRU is sequential over time)"
            )
        return bigru(params["encoder"], feats, frame_lengths, dtype=dtype,
                     dropout_rng=k2, rate=rate)
    if pp:
        from lipreading_tpu.parallel.pipeline import pipeline_encoder_apply

        return pipeline_encoder_apply(
            params["encoder"], feats, frame_lengths, cfg.model.tf_heads,
            mesh, axis=cfg.mesh.model_axis, dtype=dtype,
            data_axis=cfg.mesh.data_axis,
            microbatches=cfg.mesh.pipeline_microbatches,
            dropout_rng=k2, rate=rate,
            flash=cfg.model.flash_attention, flash_bwd=cfg.model.flash_bwd,
        )
    if sp:
        from lipreading_tpu.parallel.ring import ring_encoder_apply

        return ring_encoder_apply(
            params["encoder"], feats, frame_lengths, cfg.model.tf_heads,
            mesh, axis=cfg.mesh.model_axis, dtype=dtype,
            data_axis=cfg.mesh.data_axis, dropout_rng=k2, rate=rate,
        )
    return tf.encoder_apply(params["encoder"], feats, frame_lengths,
                            cfg.model.tf_heads, dtype=dtype,
                            dropout_rng=k2, rate=rate,
                            flash=cfg.model.flash_attention,
                            flash_bwd=cfg.model.flash_bwd)


def ctc_logits(params, enc, dtype=None):
    return nn.dense(params["ctc_head"], enc, dtype=dtype).astype(jnp.float32)


def attention_logits(params, cfg: Config, enc, enc_lengths, targets,
                     dtype=None, rng=None):
    """Teacher-forced next-token logits [B, L-1, V] for targets [B, L]."""
    dtype = dtype or _act_dtype(cfg)
    if cfg.encoder == "bigru":
        return teacher_forced_logits(
            params["att_decoder"], enc, enc_lengths, targets, dtype=dtype,
            teacher_forcing=cfg.train.teacher_forcing, rng=rng,
        )
    return tf.decoder_apply(
        params["att_decoder"], targets[:, :-1], enc, enc_lengths,
        cfg.model.tf_heads, dtype=dtype,
        dropout_rng=rng, rate=cfg.model.dropout,
    )


def cross_entropy_loss(logits, targets_out, target_lengths, pad_id=0,
                       sample_weight=None):
    """Masked mean CE. logits [B, L-1, V] vs targets_out = targets[:, 1:].

    ``sample_weight`` [B] (optional) scales each sample's mask — 0.0 drops
    the sample from both numerator and denominator.
    """
    L = targets_out.shape[1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets_out[..., None], axis=-1)[..., 0]
    # positions 0..len-2 of targets_out are real (len counts sos..eos)
    mask = nn.length_mask(target_lengths - 1, L).astype(jnp.float32)
    if sample_weight is not None:
        mask = mask * sample_weight.astype(jnp.float32)[:, None]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def compute_loss(params, cfg: Config, batch, train: bool = True, rng=None,
                 mesh=None):
    """Full hybrid loss over a batch dict:

        rois           [B, T, R, R]  normalized float
        frame_lengths  [B]
        targets        [B, L]   sos-framed, eos-terminated, pad after
        target_lengths [B]      includes sos+eos
        ctc_labels     [B, Lc]  bare char ids
        ctc_lengths    [B]

    Returns (loss, metrics dict).
    """
    t = cfg.train
    k_enc = k_dec = None
    rois = batch["rois"]
    if rng is not None and train:
        k_enc, k_dec = jax.random.split(rng)
        if t.roi_augment > 0.0:
            # appearance jitter in normalized units: per-sample gain/bias
            # (style/lighting shift) + light pixel noise. Deterministic in
            # rng; eval/inference never sees it.
            a = t.roi_augment
            kg, kb, kn, k_enc = jax.random.split(k_enc, 4)
            B = rois.shape[0]
            shp = (B,) + (1,) * (rois.ndim - 1)
            gain = 1.0 + a * jax.random.uniform(kg, shp, rois.dtype, -1, 1)
            bias = 2.0 * a * jax.random.uniform(kb, shp, rois.dtype, -1, 1)
            noise = 0.5 * a * jax.random.normal(kn, rois.shape, rois.dtype)
            rois = rois * gain + bias + noise
    enc = encode(params, cfg, rois, batch["frame_lengths"],
                 rng=k_enc, mesh=mesh)
    metrics = {}
    loss = 0.0
    # optional per-sample weight [B] (0.0 drops a sample from the loss):
    # the tracked fused step zero-weights samples whose frames ALL failed the
    # presence gate — their compacted clip is empty and any ROI content is
    # garbage, so they must not supervise either head
    sw = batch.get("sample_weight")
    if cfg.decoder in ("ctc", "hybrid"):
        logits = ctc_logits(params, enc)
        nll = ctc_loss_best(
            logits, batch["ctc_labels"], batch["frame_lengths"],
            batch["ctc_lengths"],
        )
        per = nll / jnp.maximum(batch["ctc_lengths"].astype(jnp.float32), 1.0)
        if sw is None:
            lc = jnp.mean(per)
        else:
            # where() BEFORE weighting: an infeasible (empty) sample can carry
            # an inf nll, and 0.0 * inf would poison the mean with NaN
            per = jnp.where(sw > 0, per, 0.0)
            lc = per.sum() / jnp.maximum(sw.sum(), 1.0)
        w = t.ctc_weight if cfg.decoder == "hybrid" else 1.0
        loss = loss + w * lc
        metrics["ctc_loss"] = lc
    if cfg.decoder in ("attention", "hybrid"):
        att = attention_logits(
            params, cfg, enc, batch["frame_lengths"], batch["targets"],
            rng=k_dec,
        )
        la = cross_entropy_loss(att, batch["targets"][:, 1:],
                                batch["target_lengths"], sample_weight=sw)
        w = t.att_weight if cfg.decoder == "hybrid" else 1.0
        loss = loss + w * la
        metrics["att_loss"] = la
    metrics["loss"] = loss
    return loss, metrics
