"""Training loop (ref: train_model.py main loop — SURVEY.md §4.2).

One jitted, sharding-annotated train step (AdamW + global-norm clip +
warmup-cosine schedule); donated params/opt buffers; per-N-step JSONL
metrics, checkpoints, and CER/WER eval with sample decodes. Under a multi-
device mesh the same code runs data-parallel: batches are sharded over the
``data`` axis, params replicated, and the XLA partitioner inserts the psum
for gradients (no pmap, no manual collectives).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import optax

from lipreading_tpu.config import Config
from lipreading_tpu.data.dataset import Batch, BatchIterator, batch_to_device
from lipreading_tpu.infer import transcribe
from lipreading_tpu.metrics import corpus_cer, corpus_wer
from lipreading_tpu.models.lipreader import compute_loss, init_model
from lipreading_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    model_param_shardings,
    replicate,
)
from lipreading_tpu.text import Vocab
from lipreading_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from lipreading_tpu.train.metrics_log import MetricsLogger


def make_optimizer(cfg: Config):
    t = cfg.train
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=t.learning_rate,
        warmup_steps=t.warmup_steps,
        decay_steps=max(t.total_steps, t.warmup_steps + 1),
        end_value=t.learning_rate * 0.05,
    )
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )


class Trainer:
    """Owns params/opt_state, the jitted step, checkpoints, and eval."""

    def __init__(self, cfg: Config, workdir: str, mesh=None, seed=None):
        self.cfg = cfg
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        # persist the exact config so eval/demo can reconstruct the model
        # without re-specifying presets/overrides (ref keeps no such record)
        import json as _json

        with open(os.path.join(workdir, "config.json"), "w") as f:
            _json.dump(cfg.to_dict(), f, indent=1, default=str)
        self.vocab = Vocab()
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.logger = MetricsLogger(os.path.join(workdir, "logs"))

        key = jax.random.PRNGKey(cfg.train.seed if seed is None else seed)
        # dropout keys derive from the CONFIG seed (not the init seed) and the
        # step index, so a restored run replays identical dropout masks
        self._dropout_key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.seed), 0x0D0
        )
        params = init_model(key, cfg)
        if ((cfg.mesh.sequence_parallel or cfg.mesh.pipeline_parallel)
                and cfg.encoder != "transformer"):
            raise ValueError(
                "mesh.sequence_parallel/pipeline_parallel need "
                "encoder='transformer'")
        if cfg.mesh.model_parallel > 1 and not (
                cfg.mesh.sequence_parallel or cfg.mesh.pipeline_parallel):
            # tensor parallelism: annotate transformer params over the model
            # axis; the SPMD partitioner emits the collectives
            self._param_sharding = model_param_shardings(params, self.mesh)
            self.params = jax.device_put(params, self._param_sharding)
        else:
            self._param_sharding = None
            self.params = replicate(params, self.mesh)
        self.tx = make_optimizer(cfg)
        opt_state = self.tx.init(self.params)
        if self._param_sharding is not None:
            # mu/nu mirror the param tree -> same shardings; scalars
            # (step counts) replicate. Explicit placement keeps the
            # optimizer state sharded across init, restore, and the jitted
            # step (donation-stable layouts).
            self._opt_sharding = self._opt_shardings(opt_state)
            self.opt_state = jax.device_put(opt_state, self._opt_sharding)
        else:
            self._opt_sharding = None
            self.opt_state = replicate(opt_state, self.mesh)
        self.step = 0
        self._jit_step = self._build_step()

    def _opt_shardings(self, opt_state):
        """Sharding tree for the optimizer state under tensor parallelism.

        Optax's AdamW state embeds two copies of the param tree (mu, nu);
        their leaves take the matching param's NamedSharding, found by the
        longest param-path suffix of the opt-state leaf path. Everything
        else (counts, scalars) replicates.
        """
        from jax.tree_util import keystr, tree_flatten_with_path

        rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        by_path = {
            keystr(p): s
            for p, s in tree_flatten_with_path(self._param_sharding)[0]
        }

        def pick(path, leaf):
            ks = keystr(path)
            best = None
            for pk, sh in by_path.items():
                if ks.endswith(pk) and (best is None or len(pk) > len(best[0])):
                    best = (pk, sh)
            return best[1] if best is not None else rep

        return jax.tree_util.tree_map_with_path(pick, opt_state)

    def _build_step(self):
        cfg, tx = self.cfg, self.tx
        bsh = batch_sharding(self.mesh)
        rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())

        # sequence parallelism (ring attention) needs the concrete mesh so
        # encode() can shard_map the encoder's time axis over ``model``
        mesh = (self.mesh if cfg.mesh.sequence_parallel or cfg.mesh.pipeline_parallel else None)

        def step_fn(params, opt_state, batch, rng):
            def loss_fn(p):
                return compute_loss(p, cfg, batch, train=True, rng=rng,
                                    mesh=mesh)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        batch_shardings = {
            "rois": bsh, "frame_lengths": bsh, "targets": bsh,
            "target_lengths": bsh, "ctc_labels": bsh, "ctc_lengths": bsh,
        }
        if self._param_sharding is not None:
            # TP: params/grads/opt all follow the annotation trees; pinned
            # opt-state shardings keep donation layouts stable across resume
            return jax.jit(
                step_fn,
                in_shardings=(self._param_sharding, self._opt_sharding,
                              batch_shardings, rep),
                out_shardings=(self._param_sharding, self._opt_sharding, rep),
                donate_argnums=(0, 1),
            )
        return jax.jit(
            step_fn,
            in_shardings=(rep, rep, batch_shardings, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def train_step(self, batch: Batch) -> dict:
        dev_batch = batch_to_device(
            batch, self.cfg.preprocess.normalize_mean,
            self.cfg.preprocess.normalize_std,
        )
        rng = jax.random.fold_in(self._dropout_key, self.step)
        self.params, self.opt_state, metrics = self._jit_step(
            self.params, self.opt_state, dev_batch, rng
        )
        self.step += 1
        return metrics

    def fit(self, iterator: BatchIterator, steps: int | None = None,
            eval_batches: list[Batch] | None = None) -> dict:
        t_cfg = self.cfg.train
        steps = steps if steps is not None else t_cfg.total_steps
        from lipreading_tpu.flops import device_peak_flops, train_step_flops

        peak = device_peak_flops(self.cfg.model.dtype)
        last = {}
        t0 = time.perf_counter()
        window_frames = 0
        window_flops = 0.0
        for _ in range(steps):
            batch = next(iterator)
            metrics = self.train_step(batch)
            window_frames += int(batch.frame_lengths.sum())
            B, T = batch.rois_u8.shape[:2] if hasattr(batch, "rois_u8") \
                else (batch.frames.shape[0], batch.frames.shape[1])
            window_flops += train_step_flops(
                self.cfg, B, T, int(batch.target_lengths.max())
            )
            if self.step % t_cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                m["frames_per_sec"] = window_frames / dt if dt > 0 else 0.0
                m["tflops_per_sec"] = window_flops / dt / 1e12 if dt > 0 else 0.0
                if peak and dt > 0:
                    m["mfu"] = window_flops / dt / peak
                m["epoch"] = iterator.epoch
                self.logger.log(self.step, **m)
                last = m
                t0 = time.perf_counter()
                window_frames = 0
                window_flops = 0.0
            if t_cfg.eval_every and self.step % t_cfg.eval_every == 0 and eval_batches:
                last.update(self.evaluate(eval_batches))
            if t_cfg.checkpoint_every and self.step % t_cfg.checkpoint_every == 0:
                self.save(iterator)
        return last

    def evaluate(self, batches: list[Batch], beam: int | None = None) -> dict:
        hyps, refs = [], []
        for b in batches:
            dev = batch_to_device(
                b, self.cfg.preprocess.normalize_mean,
                self.cfg.preprocess.normalize_std,
            )
            hyps.extend(
                transcribe(self.params, self.cfg, dev["rois"],
                           dev["frame_lengths"], beam=beam, vocab=self.vocab)
            )
            refs.extend(b.texts)
        m = {"eval_cer": corpus_cer(hyps, refs), "eval_wer": corpus_wer(hyps, refs)}
        self.logger.log(self.step, **m)
        self.logger.log_text(self.step, "sample_decode",
                             f"hyp={hyps[0]!r} ref={refs[0]!r}")
        return m

    # --- checkpointing -----------------------------------------------------


    @property
    def ckpt_dir(self) -> str:
        return os.path.join(self.workdir, "ckpt")

    def save(self, iterator: BatchIterator | None = None) -> str:
        return save_checkpoint(
            self.ckpt_dir, self.step, self.params, self.opt_state,
            iterator_state=iterator.state if iterator else None,
            extra={"config": self.cfg.name},
        )

    def warm_start(self, params) -> None:
        """Initialize ONLY the params from a pretrained tree (fine-tuning):
        fresh optimizer state, step 0, device placement identical to
        ``__init__`` (TP shardings re-applied when the mesh has them). The
        tree must match the model this trainer's config builds."""
        if self._param_sharding is not None:
            self.params = jax.device_put(params, self._param_sharding)
        else:
            self.params = replicate(params, self.mesh)
        opt_state = self.tx.init(self.params)
        if self._opt_sharding is not None:
            self.opt_state = jax.device_put(opt_state, self._opt_sharding)
        else:
            self.opt_state = replicate(opt_state, self.mesh)
        self.step = 0

    def restore(self, path: str | None = None) -> dict:
        """Resume from a checkpoint; returns the saved iterator state."""
        path = path or latest_checkpoint(self.ckpt_dir)
        if path is None:
            return {}
        step, params, opt_state, it_state, _ = load_checkpoint(
            path, self.params, self.opt_state
        )
        self.step = step
        opt_state = (opt_state if opt_state is not None
                     else self.tx.init(params))
        if self._param_sharding is not None:
            # re-apply the tensor-parallel layouts: a resumed TP run must
            # hold params/opt sharded exactly as __init__ placed them
            # (replicating here would feed full-replica copies into a jit
            # whose in_shardings expect TP — layout churn, OOM at scale)
            self.params = jax.device_put(params, self._param_sharding)
            self.opt_state = jax.device_put(opt_state, self._opt_sharding)
        else:
            self.params = replicate(params, self.mesh)
            self.opt_state = replicate(opt_state, self.mesh)
        return it_state

class FusedTrainer(Trainer):
    """Trainer whose jitted step runs video->ROI preprocessing ON DEVICE
    ahead of the model (BASELINE config 5: preprocessing fused into the input
    pipeline). Consumes raw uint8 frame batches (data/pipeline.VideoBatch);
    the detector/ERT weights ride along as replicated constants.
    """

    def __init__(self, cfg: Config, workdir: str, det_params, ert_model,
                 mesh=None, seed=None, presence=None, tracked: bool = False):
        """``tracked=True`` (needs ``presence``, the face-presence head from
        preproc_training.load_presence) switches the fused step to the robust
        preprocessing: top-k detection + presence gating + temporal tracking,
        then on-device compaction of confident frames (the reference's
        skip-frame semantics — ops/tracking.compact_valid_frames) before the
        model. Raw video -> robust ROIs -> loss stays ONE jit program."""
        if tracked and presence is None:
            raise ValueError("tracked=True requires the presence head")
        self._det = det_params
        self._ert = ert_model
        self._tracked = tracked
        super().__init__(cfg, workdir, mesh=mesh, seed=seed)
        self._det = replicate(jax.tree.map(jnp.asarray, det_params), self.mesh)
        self._ert = replicate(jax.tree.map(jnp.asarray, ert_model), self.mesh)
        # {} (not None) when absent: an empty pytree keeps the jitted step's
        # argument structure/sharding specs uniform across both modes
        self._presence = replicate(
            jax.tree.map(jnp.asarray, presence if presence is not None else {}),
            self.mesh,
        )
        self._jit_step = self._build_fused_step()

    def _build_fused_step(self):
        from lipreading_tpu.ops.preprocess import (
            preprocess_clips,
            preprocess_clips_tracked,
        )
        from lipreading_tpu.ops.tracking import compact_valid_frames

        cfg, tx = self.cfg, self.tx
        tracked = self._tracked
        bsh = batch_sharding(self.mesh)
        rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())

        mesh = (self.mesh if cfg.mesh.sequence_parallel or cfg.mesh.pipeline_parallel else None)

        def make_model_batch(det, ert, presence, batch):
            if tracked:
                rois, valid = preprocess_clips_tracked(
                    det, presence, ert, batch["frames"], cfg.preprocess
                )
                rois, new_len = compact_valid_frames(
                    rois, valid, batch["frame_lengths"]
                )
                # keep the CTC alignment feasible on the shrunk lengths
                # (same (t-1)//2 cap the host batcher applies): supervise a
                # label prefix rather than saturating the NLL
                ctc_l = jnp.minimum(batch["ctc_lengths"],
                                    jnp.maximum((new_len - 1) // 2, 1))
                # a fully-faceless sample compacts to new_len==0; its ROI
                # content is garbage — zero-weight it out of both heads
                # (compute_loss sample_weight) instead of letting the clamped
                # lengths supervise on frame 0
                sw = (new_len > 0).astype(jnp.float32)
                mb = dict(batch, rois=rois,
                          frame_lengths=jnp.maximum(new_len, 1),
                          ctc_lengths=ctc_l, sample_weight=sw)
            else:
                rois = preprocess_clips(det, ert, batch["frames"],
                                        cfg.preprocess)
                mb = dict(batch, rois=rois)
            del mb["frames"]
            return mb

        def step_fn(params, opt_state, det, ert, presence, batch, rng):
            def loss_fn(p):
                model_batch = make_model_batch(det, ert, presence, batch)
                return compute_loss(p, cfg, model_batch, train=True, rng=rng,
                                    mesh=mesh)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        batch_shardings = {
            "frames": bsh, "frame_lengths": bsh, "targets": bsh,
            "target_lengths": bsh, "ctc_labels": bsh, "ctc_lengths": bsh,
        }
        return jax.jit(
            step_fn,
            in_shardings=(rep, rep, rep, rep, rep, batch_shardings, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def train_step(self, batch) -> dict:
        from lipreading_tpu.data.pipeline import video_batch_to_device

        dev = video_batch_to_device(batch, batch_sharding(self.mesh))
        rng = jax.random.fold_in(self._dropout_key, self.step)
        self.params, self.opt_state, metrics = self._jit_step(
            self.params, self.opt_state, self._det, self._ert,
            self._presence, dev, rng
        )
        self.step += 1
        return metrics

    def evaluate(self, batches, beam=None) -> dict:
        from lipreading_tpu.ops.preprocess import (
            preprocess_clips,
            preprocess_clips_tracked,
        )
        from lipreading_tpu.ops.tracking import compact_valid_frames

        hyps, refs = [], []
        for b in batches:
            frames = jnp.asarray(b.frames)
            lengths = jnp.asarray(b.frame_lengths)
            if self._tracked:
                # eval-time preprocessing must match the robust train path:
                # top-k + presence gating + tracking, then frame compaction
                rois, valid = preprocess_clips_tracked(
                    self._det, self._presence, self._ert, frames,
                    self.cfg.preprocess,
                )
                rois, lengths = compact_valid_frames(rois, valid, lengths)
            else:
                rois = preprocess_clips(
                    self._det, self._ert, frames, self.cfg.preprocess
                )
            hyps.extend(
                transcribe(self.params, self.cfg, rois,
                           lengths, beam=beam,
                           vocab=self.vocab)
            )
            refs.extend(b.texts)
        m = {"eval_cer": corpus_cer(hyps, refs), "eval_wer": corpus_wer(hyps, refs)}
        self.logger.log(self.step, **m)
        self.logger.log_text(self.step, "sample_decode",
                             f"hyp={hyps[0]!r} ref={refs[0]!r}")
        return m
