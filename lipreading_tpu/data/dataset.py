"""Bucketed, padded, deterministically-resumable batching.

Replaces the reference's torch Dataset/DataLoader + pad-collate (SURVEY.md §3
"Dataset/DataLoader") with a TPU-shaped iterator:

* static shapes: each batch is padded to a time *bucket* (cfg.time_buckets)
  and a fixed char length, so XLA compiles one program per bucket instead of
  one per length;
* deterministic + resumable: the shuffle is a pure function of (seed, epoch);
  iterator state is (epoch, position) — checkpointing it gives exact resume
  (SURVEY.md §6 "failure detection": step-indexed shuffle);
* samples longer than the largest bucket are head-truncated (frames AND the
  matching caption span cannot be cut independently, so whole-sample text is
  kept and frames clipped — acceptable for cue-length clips).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lipreading_tpu.config import DataConfig
from lipreading_tpu.data.dataview import Dataview
from lipreading_tpu.text import Vocab


@dataclass
class Batch:
    """Host-side batch; field layout matches models.lipreader.compute_loss."""

    rois_u8: np.ndarray        # [B, Tb, R, R] uint8 (normalize on device)
    frame_lengths: np.ndarray  # [B] int32
    targets: np.ndarray        # [B, L] int32, sos-framed
    target_lengths: np.ndarray # [B] int32 (incl. sos+eos)
    ctc_labels: np.ndarray     # [B, Lc] int32
    ctc_lengths: np.ndarray    # [B] int32
    texts: list[str]

    @property
    def size(self) -> int:
        return int(self.rois_u8.shape[0])


class BucketedDataset:
    def __init__(
        self,
        view: Dataview,
        cfg: DataConfig,
        vocab: Vocab | None = None,
        max_chars: int | None = None,
        indices: list[int] | None = None,
    ):
        self.view = view
        self.cfg = cfg
        self.vocab = vocab or Vocab()
        self.max_chars = max_chars or cfg.max_chars
        self.buckets = tuple(sorted(cfg.time_buckets))
        # optional split restriction (data/dataview.split_by_clip)
        self.indices = list(indices) if indices is not None \
            else list(range(len(view)))
        # precompute bucket assignment per retained sample; masked builds
        # (dataview keep_invalid=True) bucket by their confident-frame count
        # since make_batch compacts unconfident frames away (the reference's
        # skip-frame semantics, SURVEY.md §4.1 — same contract as the fused
        # trainer's on-device compact_valid_frames)
        self.sample_bucket = np.asarray(
            [self._bucket_for(view.num_valid(i)) for i in self.indices]
        )

    def _bucket_for(self, t: int) -> int:
        for b in self.buckets:
            if t <= b:
                return b
        return self.buckets[-1]

    def __len__(self) -> int:
        return len(self.indices)

    def make_batch(self, indices: list[int]) -> Batch:
        """indices are positions within this (possibly split) dataset."""
        tb = int(max(self.sample_bucket[i] for i in indices))
        B = len(indices)
        R = self.view.meta["roi_size"]
        L = self.max_chars
        rois = np.zeros((B, tb, R, R), np.uint8)
        fl = np.zeros((B,), np.int32)
        targets = np.zeros((B, L), np.int32)
        tl = np.zeros((B,), np.int32)
        ctc = np.zeros((B, L), np.int32)
        cl = np.zeros((B,), np.int32)
        texts = []
        for k, i in enumerate(indices):
            vi = self.indices[i]
            roi = self.view.roi_u8_compact(vi)
            t = min(roi.shape[0], tb)
            rois[k, :t] = roi[:t]
            fl[k] = t
            text = self.view.text(vi)
            ids = self.vocab.encode(text)[: L - 2]
            # keep the CTC alignment feasible: (t-1)//2 labels always admit
            # a path in t frames (2L+1 <= t even with all-repeat labels).
            # Without this, a clip head-truncated to the largest bucket keeps
            # its full caption and the per-sample NLL saturates (~1e30),
            # spiking the logged loss while contributing zero gradient.
            max_labels = max((t - 1) // 2, 1)
            ids = ids[:max_labels]
            text = self.vocab.decode(ids)
            targets[k], tl[k] = self.vocab.encode_target(text, L)
            ctc[k, : len(ids)] = ids
            cl[k] = len(ids)
            texts.append(text)
        return Batch(rois, fl, targets, tl, ctc, cl, texts)


class BatchIterator:
    """Infinite epochs of bucketed batches with checkpointable state.

    Groups each epoch's shuffled samples by bucket, emits fixed-size batches
    bucket by bucket (drops ragged remainders so shapes stay static).
    """

    def __init__(self, dataset: BucketedDataset, batch_size: int, seed: int = 0,
                 epoch: int = 0, pos: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = epoch
        self.pos = pos
        self._plan = self._make_plan(epoch)

    def _make_plan(self, epoch: int) -> list[list[int]]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, 0xDA7A])
        )
        order = rng.permutation(len(self.ds))
        plan = []
        for b in self.ds.buckets:
            members = [int(i) for i in order if self.ds.sample_bucket[i] == b]
            for lo in range(0, len(members) - self.batch_size + 1, self.batch_size):
                plan.append(members[lo:lo + self.batch_size])
        # batch order also shuffled (deterministically)
        rng.shuffle(plan)
        return plan

    @property
    def state(self) -> dict:
        return {"epoch": self.epoch, "pos": self.pos, "seed": self.seed}

    @classmethod
    def from_state(cls, dataset, batch_size, state: dict) -> "BatchIterator":
        return cls(dataset, batch_size, seed=state["seed"],
                   epoch=state["epoch"], pos=state["pos"])

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        if self.pos >= len(self._plan):
            self.epoch += 1
            self.pos = 0
            self._plan = self._make_plan(self.epoch)
            if not self._plan:
                raise RuntimeError(
                    f"dataset too small for batch_size={self.batch_size}"
                )
        batch = self.ds.make_batch(self._plan[self.pos])
        self.pos += 1
        return batch


def batch_to_device(batch: Batch, cfg_norm_mean: float, cfg_norm_std: float):
    """Host batch -> device arrays dict for compute_loss (normalize on device)."""
    import jax.numpy as jnp

    rois = jnp.asarray(batch.rois_u8)
    rois = ((rois.astype(jnp.float32) / 255.0) - cfg_norm_mean) / cfg_norm_std
    return {
        "rois": rois,
        "frame_lengths": jnp.asarray(batch.frame_lengths),
        "targets": jnp.asarray(batch.targets),
        "target_lengths": jnp.asarray(batch.target_lengths),
        "ctc_labels": jnp.asarray(batch.ctc_labels),
        "ctc_lengths": jnp.asarray(batch.ctc_lengths),
    }
