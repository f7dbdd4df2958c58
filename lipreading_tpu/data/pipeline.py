"""Input pipeline: async host->device prefetch + on-device preprocessing.

BASELINE.json:5: "Training scales data-parallel over ICI with the
preprocessing kernels fused into the input pipeline so the TPU never stalls
on host-side landmarking." Concretely:

* the host only decodes video and pads batches of raw uint8 frames (the one
  job with no TPU equivalent — SURVEY.md §3 ffmpeg row);
* face detection, ERT landmarking and ROI extraction run INSIDE the jitted
  train step, on the accelerator, fused ahead of the model;
* a background thread keeps ``depth`` batches in flight: device_put of the
  next uint8 batch overlaps with the current step's compute (JAX dispatch is
  async; the queue adds host-side pipelining of decode/pad).

uint8 frames on the wire means 4x less PCIe/ICI traffic than f32 ROIs of the
same pixel count, and 12x less than shipping normalized full frames.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import numpy as np

from lipreading_tpu.config import DataConfig
from lipreading_tpu.text import Vocab


@dataclass
class VideoBatch:
    """Raw-frame batch for fused-preprocessing training."""

    frames: np.ndarray         # [B, T, H, W, 3] uint8
    frame_lengths: np.ndarray  # [B]
    targets: np.ndarray        # [B, L]
    target_lengths: np.ndarray # [B]
    ctc_labels: np.ndarray     # [B, Lc]
    ctc_lengths: np.ndarray    # [B]
    texts: list[str]


class FixtureVideoDataset:
    """In-memory corpus of rendered fixture clips cut into cue samples.

    Stands in for the reference's video corpus on disk; decode_video() +
    a VTT sidecar would populate the same structure from real files.
    """

    def __init__(self, n_clips: int, seed: int, cfg: DataConfig,
                 vocab: Vocab | None = None):
        from lipreading_tpu.fixtures import make_clip
        from lipreading_tpu.vtt import align_cues_to_frames, parse_vtt

        self.cfg = cfg
        self.vocab = vocab or Vocab()
        self.samples: list[tuple[np.ndarray, str]] = []
        for c in range(n_clips):
            clip = make_clip(seed * 131_071 + c, cfg)
            cues = parse_vtt(clip.vtt)
            for first, last, text in align_cues_to_frames(
                cues, clip.fps, clip.num_frames
            ):
                self.samples.append((clip.frames[first:last], text))
            self.samples.append((clip.frames, clip.text))

    def __len__(self):
        return len(self.samples)

    def batch(self, indices: list[int], time_bucket: int) -> VideoBatch:
        B = len(indices)
        cfg = self.cfg
        H, W = cfg.frame_height, cfg.frame_width
        L = cfg.max_chars
        frames = np.zeros((B, time_bucket, H, W, 3), np.uint8)
        fl = np.zeros((B,), np.int32)
        targets = np.zeros((B, L), np.int32)
        tl = np.zeros((B,), np.int32)
        ctc = np.zeros((B, L), np.int32)
        cl = np.zeros((B,), np.int32)
        texts = []
        for k, i in enumerate(indices):
            f, text = self.samples[i]
            t = min(f.shape[0], time_bucket)
            frames[k, :t] = f[:t]
            fl[k] = t
            ids = self.vocab.encode(text)[: L - 2]
            text = self.vocab.decode(ids)
            targets[k], tl[k] = self.vocab.encode_target(text, L)
            ctc[k, : len(ids)] = ids
            cl[k] = len(ids)
            texts.append(text)
        return VideoBatch(frames, fl, targets, tl, ctc, cl, texts)


class VideoBatchIterator:
    """Deterministic resumable iterator over raw-frame batches (bucketed)."""

    def __init__(self, dataset: FixtureVideoDataset, batch_size: int,
                 seed: int = 0, epoch: int = 0, pos: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = epoch
        self.pos = pos
        self.buckets = tuple(sorted(dataset.cfg.time_buckets))
        self._plan = self._make_plan(epoch)

    def _bucket_for(self, t: int) -> int:
        for b in self.buckets:
            if t <= b:
                return b
        return self.buckets[-1]

    def _make_plan(self, epoch):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, 0x71DE0])
        )
        order = rng.permutation(len(self.ds))
        plan = []
        for b in self.buckets:
            members = [
                int(i) for i in order
                if self._bucket_for(self.ds.samples[i][0].shape[0]) == b
            ]
            for lo in range(0, len(members) - self.batch_size + 1,
                            self.batch_size):
                plan.append((b, members[lo:lo + self.batch_size]))
        rng.shuffle(plan)
        return plan

    @property
    def state(self):
        return {"epoch": self.epoch, "pos": self.pos, "seed": self.seed}

    def __iter__(self):
        return self

    def __next__(self) -> VideoBatch:
        if self.pos >= len(self._plan):
            self.epoch += 1
            self.pos = 0
            self._plan = self._make_plan(self.epoch)
            if not self._plan:
                raise RuntimeError("dataset too small for batch size")
        bucket, idx = self._plan[self.pos]
        self.pos += 1
        return self.ds.batch(idx, bucket)


class Prefetcher:
    """Background thread that stages host batches onto the device.

    ``put_fn`` maps a host batch to device arrays (typically device_put with
    the mesh's batch sharding). ``depth`` batches are kept in flight so the
    accelerator never waits on host-side padding/decode.
    """

    def __init__(self, iterator, put_fn, depth: int = 2):
        self.iterator = iterator
        self.put_fn = put_fn
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._fill, daemon=True)
        self.thread.start()

    _DONE = object()  # end-of-stream sentinel: makes `for ... in pf` finite

    def _fill(self):
        try:
            for item in self.iterator:
                if self._stop.is_set():
                    return
                self.q.put((self.put_fn(item), item))
            self.q.put(self._DONE)
        except Exception as e:  # surface worker errors at __next__
            self.q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        if item is self._DONE:
            raise StopIteration
        return item  # (device_batch, host_batch)

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass


def _decode_one(job):
    """Pool worker: (path, max_frames) -> [T, H, W, 3] uint8. Imports stay
    inside so spawn children never touch jax (and never grab the TPU)."""
    path, max_frames = job
    from lipreading_tpu.data.video import decode_video

    frames, _ = decode_video(path, max_frames=max_frames)
    return frames


class VideoDecodePool:
    """Multi-process mp4 decode ring (SURVEY.md hard part #6: "ffmpeg decode
    must exceed TPU consumption ... measure, don't assume").

    cv2 decode is single-threaded per stream, so one core caps ingest at one
    stream's decode rate; the pool fans decode across ``workers`` processes
    with an order-preserving imap and ``prefetch`` jobs in flight. Workers
    use the spawn context and import only cv2/numpy — no jax, so they can
    never contend for the accelerator.

    Usage::

        with VideoDecodePool(workers=4) as pool:
            for frames in pool.imap(paths):
                ...
    """

    def __init__(self, workers: int | None = None, prefetch: int = 4):
        import multiprocessing as mp
        import os

        self.workers = workers or max(1, (os.cpu_count() or 1) - 1)
        self.prefetch = prefetch
        self._ctx = mp.get_context("spawn")
        self._pool = self._ctx.Pool(self.workers)

    def imap(self, paths, max_frames: int | None = None):
        """Yield decoded [T, H, W, 3] uint8 stacks in input order."""
        jobs = ((p, max_frames) for p in paths)
        return self._pool.imap(_decode_one, jobs, chunksize=1)

    def close(self):
        self._pool.terminate()
        self._pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _decode_frames(payload):
    """Default shm-pool work fn: (path, max_frames) -> [T, H, W, 3] u8."""
    from lipreading_tpu.data.video import decode_video

    path, max_frames = payload
    frames, _ = decode_video(path, max_frames=max_frames)
    return frames


def _synth_frames(payload):
    """Null work fn (bench_ingest): synthesize the clip without a codec, so
    the measured rate is pure ring transport — the shm analogue of the
    plain pool's null_ipc_fps."""
    import numpy as np

    t, h, w = payload
    return np.full((t, h, w, 3), 127, np.uint8)


def _shm_worker(jobs, results, free, shm_names, slot_bytes, work_fn):
    """Shm-ring pool worker: run ``work_fn(payload)`` and write the frames
    into a shared-memory slot; ship only (seq, slot, shape) over the pipe.
    Imports stay inside (no jax; spawn children must never grab the TPU)."""
    import numpy as np
    from multiprocessing import shared_memory

    # NOTE on tracking (3.12, no track= param): spawn children inherit the
    # parent's resource-tracker process, so the attach-side register here is
    # an idempotent set-add of a name the parent already owns — no
    # child-exit unlink happens, and unregistering here would strip the
    # PARENT's registration (KeyError spam at unlink). Leave it alone.
    shms = [shared_memory.SharedMemory(name=n) for n in shm_names]
    try:
        while True:
            job = jobs.get()
            if job is None:
                return
            seq, payload = job
            try:
                frames = work_fn(payload)
                if frames.nbytes > slot_bytes:
                    raise ValueError(
                        f"decoded clip {frames.nbytes} B exceeds the ring "
                        f"slot ({slot_bytes} B); pass max_frames or grow "
                        f"slot_frames")
                slot = free.get()
                np.ndarray(frames.shape, np.uint8,
                           buffer=shms[slot].buf)[:] = frames
                results.put((seq, slot, frames.shape, None))
            except Exception as e:  # surface at the parent's next()
                results.put((seq, -1, None, repr(e)))
    finally:
        for s in shms:
            s.close()


class ShmVideoDecodePool:
    """Shared-memory decode ring: the VideoDecodePool with the frames taken
    OFF the pipe (VERDICT r4 missing #3).

    bench_ingest.py measured the plain pool's structural ceiling on this
    box: the parent drains pickle+pipe at ~4,779 frames/s (~350 MB/s) no
    matter how many workers decode — ~30x below patchify-train consumption
    (147.6k fps). Here workers decode straight into preallocated
    ``multiprocessing.shared_memory`` slots and only (seq, slot, shape)
    tuples ride the pipe, so the parent's per-frame cost is a memcpy out of
    shm (GB/s) — or nothing at all with ``copy=False``, where the yielded
    array VIEWS the slot and stays valid until the next ``next()`` (the
    slot is recycled then; batch assemblers that copy immediately, like
    VideoFileIterator, can use it safely).

    Slot count bounds memory and provides backpressure: workers block on
    the free-slot queue when the consumer lags. Same ``imap`` contract as
    VideoDecodePool (order-preserving), so VideoFileIterator takes either.
    """

    def __init__(self, workers: int | None = None, slot_frames: int = 256,
                 frame_hw: tuple[int, int] = (160, 160),
                 slots: int | None = None, work_fn=_decode_frames):
        import multiprocessing as mp
        import os

        self.workers = workers or max(1, (os.cpu_count() or 1) - 1)
        self.slot_bytes = slot_frames * frame_hw[0] * frame_hw[1] * 3
        self.slots = slots if slots is not None else self.workers + 2
        ctx = mp.get_context("spawn")
        from multiprocessing import shared_memory

        self._shm = [shared_memory.SharedMemory(create=True,
                                                size=self.slot_bytes)
                     for _ in range(self.slots)]
        self._jobs = ctx.Queue()
        self._results = ctx.Queue()
        self._free = ctx.Queue()
        for i in range(self.slots):
            self._free.put(i)
        names = [s.name for s in self._shm]
        self._procs = [
            ctx.Process(target=_shm_worker,
                        args=(self._jobs, self._results, self._free,
                              names, self.slot_bytes, work_fn), daemon=True)
            for _ in range(self.workers)
        ]
        for p in self._procs:
            p.start()
        self._closed = False

    def imap(self, paths, max_frames: int | None = None, copy: bool = True):
        """Yield decoded [T, H, W, 3] uint8 stacks in input order.

        ``copy=False`` yields zero-copy VIEWS into the ring; each view is
        valid only until the next iteration (its slot is recycled then).
        """
        return self.imap_jobs([(p, max_frames) for p in paths], copy=copy)

    def imap_jobs(self, payloads, copy: bool = True):
        """Like imap but over raw work_fn payloads (bench/null modes)."""
        import numpy as np

        paths = list(payloads)
        for seq, p in enumerate(paths):
            self._jobs.put((seq, p))

        def _drain():
            held = {}
            prev_slot = -1
            for want in range(len(paths)):
                while want not in held:
                    seq, slot, shape, err = self._results.get()
                    held[seq] = (slot, shape, err)
                slot, shape, err = held.pop(want)
                if err is not None:
                    raise RuntimeError(f"decode failed for {paths[want]}: "
                                       f"{err}")
                arr = np.ndarray(shape, np.uint8, buffer=self._shm[slot].buf)
                if copy:
                    arr = arr.copy()
                    self._free.put(slot)
                    yield arr
                else:
                    if prev_slot >= 0:
                        self._free.put(prev_slot)
                    prev_slot = slot
                    yield arr
            if prev_slot >= 0:
                self._free.put(prev_slot)

        return _drain()

    def close(self):
        if self._closed:
            return
        self._closed = True
        for _ in self._procs:
            self._jobs.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
                p.join()
        for s in self._shm:
            s.close()
            s.unlink()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class VideoFileIterator:
    """Resumable iterator yielding VideoBatches decoded from mp4 files on
    disk through a VideoDecodePool — the real-video analogue of
    VideoBatchIterator (which serves in-memory fixture clips).

    ``samples`` is a list of (mp4_path, text). Every sample is decoded each
    epoch (streaming ingest, nothing cached) so sustained throughput here IS
    the host decode rate the fused train step sees.
    """

    def __init__(self, samples: list[tuple[str, str]], cfg: DataConfig,
                 batch_size: int, pool: VideoDecodePool,
                 vocab: Vocab | None = None, seed: int = 0):
        self.samples = samples
        self.cfg = cfg
        self.batch_size = batch_size
        self.pool = pool
        self.vocab = vocab or Vocab()
        self.seed = seed
        self.epoch = 0
        self._iter = None

    def _epoch_stream(self, epoch):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, 0xF11E]))
        order = rng.permutation(len(self.samples))
        n = (len(order) // self.batch_size) * self.batch_size
        if n == 0:
            raise RuntimeError("corpus smaller than batch size")
        order = order[:n]
        paths = [self.samples[i][0] for i in order]
        bucket = max(self.cfg.time_buckets)
        if isinstance(self.pool, ShmVideoDecodePool):
            # zero-copy views are safe here: each clip is copied into the
            # batch array below before the next ring slot is requested
            decoded = self.pool.imap(paths, max_frames=bucket, copy=False)
        else:
            decoded = self.pool.imap(paths, max_frames=bucket)
        B, L = self.batch_size, self.cfg.max_chars
        H, W = self.cfg.frame_height, self.cfg.frame_width
        for lo in range(0, n, B):
            frames = np.zeros((B, bucket, H, W, 3), np.uint8)
            fl = np.zeros((B,), np.int32)
            targets = np.zeros((B, L), np.int32)
            tl = np.zeros((B,), np.int32)
            ctc = np.zeros((B, L), np.int32)
            cl = np.zeros((B,), np.int32)
            texts = []
            for k in range(B):
                f = next(decoded)
                text = self.samples[order[lo + k]][1]
                t = min(f.shape[0], bucket)
                frames[k, :t] = f[:t]
                fl[k] = t
                ids = self.vocab.encode(text)[: L - 2]
                text = self.vocab.decode(ids)
                targets[k], tl[k] = self.vocab.encode_target(text, L)
                ctc[k, : len(ids)] = ids
                cl[k] = len(ids)
                texts.append(text)
            yield VideoBatch(frames, fl, targets, tl, ctc, cl, texts)

    def __iter__(self):
        return self

    def __next__(self) -> VideoBatch:
        if self._iter is None:
            self._iter = self._epoch_stream(self.epoch)
        try:
            return next(self._iter)
        except StopIteration:
            self.epoch += 1
            self._iter = self._epoch_stream(self.epoch)
            return next(self._iter)


def video_batch_to_device(batch: VideoBatch, sharding=None):
    """VideoBatch -> device dict (frames stay uint8; preprocess runs in-step)."""
    import jax
    import jax.numpy as jnp

    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jnp.asarray
    return {
        "frames": put(batch.frames),
        "frame_lengths": put(batch.frame_lengths),
        "targets": put(batch.targets),
        "target_lengths": put(batch.target_lengths),
        "ctc_labels": put(batch.ctc_labels),
        "ctc_lengths": put(batch.ctc_lengths),
    }
