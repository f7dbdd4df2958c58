#!/usr/bin/env python
"""Host-ingest IPC ceiling (VERDICT r3 next-step #8: separate the decode
ring's IPC/serialization cost from cv2 decode cost; state the scaling claim
from measurements, not extrapolation).

Three rates, same clip shape ([T, H, W, 3] uint8):

  host_decode_fps   one in-process cv2 stream (no pool, no IPC)
  null_ipc_fps      the pool ring moving PRE-BUILT frames (workers return a
                    synthesized array without touching a codec) — pure
                    pickle + pipe + parent-side deserialize. This is the
                    structural ceiling of the ring: no worker count can
                    push ingest past the parent's drain rate.
  pool_decode_fps   the real ring (decode + IPC) at each worker count

The honest scaling model is  pool(k) ~= min(k * decode_rate_core,
null_ipc_fps)  — linear in workers only until the parent's drain rate
saturates. On this 1-core box k>1 measures contention, not scaling; the
null-IPC number is the machine-independent quantity worth recording.

Usage: python scripts/bench_ingest.py [n=16] [T=64] [workers=1,2]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import DataConfig, parse_overrides  # noqa: E402


def _null_decode(job):
    """Worker: synthesize the clip in-process; the RETURN ships the bytes.

    The input job is a few ints (cheap to pickle); the output pays the full
    frames-array serialize/pipe/deserialize cost we want to isolate.
    """
    t, h, w = job
    import numpy as np

    return np.full((t, h, w, 3), 127, np.uint8)


def main(argv):
    args = parse_overrides(argv)
    n = int(args.pop("n", 16))
    T = int(args.pop("T", 64))
    workers = [int(w) for w in str(args.pop("workers", "1,2")).split(",")]

    import numpy as np

    from lipreading_tpu.data.pipeline import (
        ShmVideoDecodePool,
        VideoDecodePool,
        _synth_frames,
    )
    from lipreading_tpu.data.video import decode_video, write_video
    from lipreading_tpu.fixtures import make_clips

    cfg = DataConfig()
    H = W = cfg.frame_height
    clip_mb = T * H * W * 3 / 1e6
    clips = make_clips(31337, n, cfg)

    out = {}
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, c in enumerate(clips):
            p = os.path.join(d, f"c{i}.mp4")
            write_video(p, c.frames[:T], fps=25.0)
            paths.append(p)

        t0 = time.perf_counter()
        n_fr = sum(decode_video(p)[0].shape[0] for p in paths)
        out["host_decode_fps"] = n_fr / (time.perf_counter() - t0)

        for k in workers:
            with VideoDecodePool(workers=k) as pool:
                next(iter(pool.imap([paths[0]])))          # warm spawns
                t0 = time.perf_counter()
                n_fr = sum(f.shape[0] for f in pool.imap(paths))
                out[f"pool_decode_fps@{k}"] = (
                    n_fr / (time.perf_counter() - t0))

                # pure-IPC ring: same pool machinery, null "decode"
                jobs = [(T, H, W)] * n
                list(pool._pool.imap(_null_decode, [jobs[0]]))  # warm
                t0 = time.perf_counter()
                n_fr = sum(f.shape[0]
                           for f in pool._pool.imap(_null_decode, jobs,
                                                    chunksize=1))
                out[f"null_ipc_fps@{k}"] = n_fr / (time.perf_counter() - t0)

            # shared-memory ring (VERDICT r4 missing #3): same decode, same
            # worker counts, frames via shm slots instead of pickle+pipe
            with ShmVideoDecodePool(workers=k, slot_frames=T + 8,
                                    frame_hw=(H, W)) as spool:
                next(iter(spool.imap([paths[0]], max_frames=T)))  # warm
                for mode, cp in (("", True), ("_view", False)):
                    t0 = time.perf_counter()
                    n_fr = sum(f.shape[0]
                               for f in spool.imap(paths, max_frames=T,
                                                   copy=cp))
                    out[f"shm_decode{mode}_fps@{k}"] = (
                        n_fr / (time.perf_counter() - t0))
            with ShmVideoDecodePool(workers=k, slot_frames=T + 8,
                                    frame_hw=(H, W),
                                    work_fn=_synth_frames) as spool:
                jobs = [(T, H, W)] * n
                next(iter(spool.imap_jobs(jobs[:1])))             # warm
                for mode, cp in (("", True), ("_view", False)):
                    t0 = time.perf_counter()
                    n_fr = sum(f.shape[0]
                               for f in spool.imap_jobs(jobs, copy=cp))
                    out[f"null_shm{mode}_fps@{k}"] = (
                        n_fr / (time.perf_counter() - t0))

    print(f"# clip [T={T},{H},{W},3] u8 = {clip_mb:.2f} MB, n={n}")
    for key, v in out.items():
        extra = ""
        if key.startswith("null_"):
            per_frame_us = 1e6 / v
            mbs = v * H * W * 3 / 1e6
            extra = f"  ({mbs:,.0f} MB/s ring, {per_frame_us:.0f} us/frame)"
        print(f"{key:>24}: {v:10,.1f} frames/s{extra}")
    dec = out["host_decode_fps"]
    ipc = max(v for k, v in out.items() if k.startswith("null_ipc"))
    shm = max((v for k, v in out.items() if k.startswith("null_shm")),
              default=None)
    print(f"# model: pool(k) ~= min(k * {dec:,.0f}, {ipc:,.0f}) frames/s; "
          f"IPC overhead per decoded frame = "
          f"{1e3 / ipc * 1e3:.0f} us vs {1e6 / dec:.0f} us decode")
    if shm:
        print(f"# shm ring ceiling: {shm:,.0f} frames/s "
              f"({shm / ipc:.1f}x the pipe) -> shm_pool(k) ~= "
              f"min(k * {dec:,.0f}, {shm:,.0f})")


if __name__ == "__main__":
    main(sys.argv[1:])
