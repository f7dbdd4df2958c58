#!/usr/bin/env python
"""Benchmark harness (run by the driver on real TPU hardware).

Headline metric = BASELINE.json:2: video->ROI preprocessing frames/sec/chip,
with vs_baseline = TPU fps / measured CPU-oracle fps (the reference path;
BASELINE's target is vs_baseline >= 10).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

BENCH_SMOKE=1 shrinks every section (fewer clips/reps/steps, small
batches) so a CPU run validates all code paths in minutes; the numbers it
prints are NOT benchmarks. The driver runs the default (full) sizes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lipreading_tpu.config import PreprocessConfig
    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_frames
    from lipreading_tpu.oracle.pipeline import run_clip
    from lipreading_tpu.preproc_training import load_assets

    backend = jax.default_backend()
    smoke = bool(os.environ.get("BENCH_SMOKE"))
    det_np, ert_np = load_assets()
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    pre_cfg = PreprocessConfig()

    # frame corpus: several fixture clips stacked. The headline preprocess
    # number stays at n=512 (comparable across rounds); the conv-landmarker
    # and flagship-decode sections batch larger (throughput knees measured
    # at n=2048 / B=16 — BASELINE.md round-2 sweeps).
    clips = [make_clip(100 + i) for i in range(8 if smoke else 64)]
    frames_all = np.concatenate([c.frames for c in clips])
    frames = frames_all[: 128 if smoke else 512]
    n = frames.shape[0]

    @jax.jit
    def pre(fr):
        return preprocess_frames(det, ert, fr, pre_cfg)

    dev_frames = jnp.asarray(frames)
    pre(dev_frames).block_until_ready()          # compile + warm
    reps = 2 if smoke else 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pre(dev_frames)
    out.block_until_ready()
    tpu_fps = n * reps / (time.perf_counter() - t0)

    # optional: the distilled conv-landmarker preprocessing path
    conv_fps = None
    try:
        from lipreading_tpu.ops.landmarker import params_to_jax as lmk_to_jax
        from lipreading_tpu.preproc_training import load_landmarker

        lm_np = load_landmarker()
        if lm_np is not None:
            conv_cfg = PreprocessConfig(landmarker="conv")
            lmj = lmk_to_jax(lm_np)

            @jax.jit
            def pre_conv(fr):
                return preprocess_frames(det, lmj, fr, conv_cfg)

            # conv path scales with batch (no gather-bound cascade): bench at
            # its n=2048 knee (150k fps there vs 53k at n=512 on v5e)
            n2 = min(256 if smoke else 2048,
                     (frames_all.shape[0] // 256) * 256)
            dev2 = jnp.asarray(frames_all[:n2])
            pre_conv(dev2).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(reps):
                outc = pre_conv(dev2)
            outc.block_until_ready()
            conv_fps = n2 * reps / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# conv landmarker bench skipped: {e}", file=sys.stderr)

    # ERT-path throughput knee (VERDICT r4 weak #4): the headline stays at
    # n=512 for cross-round comparability, but the round-4 roofline put the
    # ERT path's knee at n=2048 (146.5k fps) — record it as its own key,
    # same protocol as the conv section.
    ert_knee_fps = None
    try:
        nk = min(256 if smoke else 2048, (frames_all.shape[0] // 256) * 256)
        devk = jnp.asarray(frames_all[:nk])
        pre(devk).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            outk = pre(devk)
        outk.block_until_ready()
        ert_knee_fps = nk * reps / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# ert knee bench skipped: {e}", file=sys.stderr)

    # oracle denominator: the per-frame CPU loop on a subset
    oracle = run_clip(clips[0].frames[: 12 if smoke else 48],
                      det_np, ert_np, pre_cfg)
    cpu_fps = oracle.frames_per_sec

    # parity spot check on the bench hardware (guards against perf-only wins)
    roi_dev = np.asarray(pre(jnp.asarray(
        clips[0].frames[: 12 if smoke else 48])))
    max_diff = float(np.abs(roi_dev - oracle.roi).max())

    # end-to-end video -> ROI -> transcript (BASELINE.json:2 headline metric):
    # preprocess + 3D-CNN + bi-GRU encoder + greedy CTC decode, one program
    e2e_fps = None
    try:
        import jax.numpy as jnp2  # noqa: F401

        from lipreading_tpu.config import preset
        from lipreading_tpu.models.lipreader import ctc_logits as ctc_head
        from lipreading_tpu.models.lipreader import encode, init_model
        from lipreading_tpu.ops.decode import ctc_greedy_ids
        from lipreading_tpu.train.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
        )

        from lipreading_tpu.preproc_training import load_release_model

        rel = load_release_model()
        if rel is not None:
            params, cfg = rel
        else:
            cfg = preset("bigru-ctc")
            params = init_model(jax.random.PRNGKey(0), cfg)
            ck = latest_checkpoint("runs/ctc/ckpt")
            if ck:
                _, params, _, _, _ = load_checkpoint(ck, params)

        Tc = 64
        B = n // Tc
        clip_stack = jnp.asarray(frames[: B * Tc].reshape(B, Tc, *frames.shape[1:]))
        lengths = jnp.full((B,), Tc, jnp.int32)

        @jax.jit
        def e2e(fr):
            rois = preprocess_frames(det, ert, fr.reshape(-1, *fr.shape[2:]),
                                     pre_cfg)
            rois = rois.reshape(B, Tc, pre_cfg.roi_size, pre_cfg.roi_size)
            enc = encode(params, cfg, rois, lengths)
            return ctc_greedy_ids(ctc_head(params, enc), lengths)

        jax.block_until_ready(e2e(clip_stack))
        t0 = time.perf_counter()
        for _ in range(reps):
            out2 = e2e(clip_stack)
        jax.block_until_ready(out2)
        e2e_fps = B * Tc * reps / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# e2e bench skipped: {e}", file=sys.stderr)

    # flagship quality config: transformer-hybrid + joint CTC/attention beam
    # + char-LM fusion — the configuration that holds the best CER; its
    # throughput was unmeasured in round 1 (VERDICT r1 weak #3)
    flagship_fps = cascade_fps = cascade_rescored_frac = None
    try:
        from lipreading_tpu.infer import transcribe
        from lipreading_tpu.ops.preprocess import preprocess_clips
        from lipreading_tpu.preproc_training import load_release_model

        rel = load_release_model("transformer_hybrid")
        if rel is not None:
            fparams, fcfg = rel
            Tc = 64
            # the joint-beam decode is latency-bound: with early-exit
            # decoding the knee is B=32 on v5e (878 fps vs 771 at B=16;
            # pre-early-exit B=32 regressed to 510).
            # CLIP-ALIGNED batch (round 3): each row is one real fixture
            # clip with its true length — arbitrary 64-frame slices of the
            # concatenated corpus decode to spliced gibberish, which routed
            # EVERY clip to the cascade's rescore leg (OOV/LM triggers,
            # rescored_frac 1.0) and measured no real workload
            B = min(len(clips), 32)
            stack_np = np.zeros((B, Tc) + frames_all.shape[1:],
                                frames_all.dtype)
            lens_np = np.zeros((B,), np.int32)
            for i in range(B):
                f = clips[i].frames[:Tc]
                stack_np[i, : f.shape[0]] = f
                lens_np[i] = f.shape[0]
            stack = jnp.asarray(stack_np)
            lengths = jnp.asarray(lens_np)
            n_flag = int(lens_np.sum())     # true frames decoded per call
            rois = preprocess_clips(det, ert, stack, pre_cfg)

            def flagship():
                return transcribe(fparams, fcfg, rois, lengths, beam=8,
                                  lm_weight=0.4)

            freps = 2 if smoke else 5
            flagship()                      # compile + warm (cached jit)
            t0 = time.perf_counter()
            for _ in range(freps):
                out3 = flagship()
            flagship_fps = n_flag * freps / (time.perf_counter() - t0)
            del out3

            # cascade decoding (round 3): greedy + trigger-gated beam
            # rescoring — transcripts pinned equal to the full beam at the
            # default margins by tests/evals; this measures the speedup.
            # The joint beam is LATENCY-bound, so the cascade's structural
            # advantage is batch scale: the cheap greedy leg rides B=64
            # while only the triggered minority pays the beam bucket.
            # WHOLE-CLIP protocol (VERDICT r4 weak #1): clips ride their
            # time bucket with true lengths — the old Tc=64 truncation cut
            # the tail word mid-word, OOV-triggering ~half the batch (a
            # protocol artifact ~6x the eval ladder's 1/12 rescore rate).
            from lipreading_tpu.infer import transcribe_cascade

            Tfull = 96                  # bucket that fits every bench clip
            B2 = min(len(clips), 64)
            stack2 = np.zeros((B2, Tfull) + frames_all.shape[1:],
                              frames_all.dtype)
            lens2 = np.zeros((B2,), np.int32)
            for i in range(B2):
                f = clips[i].frames[:Tfull]
                stack2[i, : f.shape[0]] = f
                lens2[i] = f.shape[0]
            rois2 = preprocess_clips(det, ert, jnp.asarray(stack2), pre_cfg)
            lengths2 = jnp.asarray(lens2)
            n_casc = int(lens2.sum())

            transcribe_cascade(fparams, fcfg, rois2, lengths2, beam=8,
                               lm_weight=0.4)       # compile + warm
            t0 = time.perf_counter()
            n_res = 0
            for _ in range(freps):
                _, nr = transcribe_cascade(fparams, fcfg, rois2, lengths2,
                                           beam=8, lm_weight=0.4)
                n_res += nr
            cascade_fps = n_casc * freps / (time.perf_counter() - t0)
            cascade_rescored_frac = n_res / (freps * B2)
    except Exception as e:
        print(f"# flagship bench skipped: {e}", file=sys.stderr)

    # deployment config (VERDICT r3 weak #6: "the one number a deployer
    # wants"): the CURRENT universal release + subpixel conv-landmarker
    # preprocessing + cascade decoding — the repo's actual serving stack.
    # The transformer_hybrid flagship row above stays for cross-round
    # comparability.
    universal_fps = universal_rescored_frac = None
    try:
        from lipreading_tpu.infer import transcribe_cascade
        from lipreading_tpu.ops.landmarker import params_to_jax as lmk_to_jax
        from lipreading_tpu.ops.preprocess import preprocess_clips
        from lipreading_tpu.preproc_training import (
            load_landmarker,
            load_release_model,
        )

        for uname in ("transformer_hybrid_universal4",
                      "transformer_hybrid_universal3"):
            rel = load_release_model(uname)
            if rel is not None:
                break
        lm_np = load_landmarker()
        if rel is not None and lm_np is not None:
            uparams, ucfg = rel
            ucfg = ucfg.override(**{"preprocess.landmarker": "conv"})
            # whole-clip protocol (see the cascade section): the deployment
            # number's trigger rate must match the eval ladder's, not a
            # truncation artifact
            Tfull = 96
            B3 = min(len(clips), 64)
            stack3 = np.zeros((B3, Tfull) + frames_all.shape[1:],
                              frames_all.dtype)
            lens3 = np.zeros((B3,), np.int32)
            for i in range(B3):
                f = clips[i].frames[:Tfull]
                stack3[i, : f.shape[0]] = f
                lens3[i] = f.shape[0]
            rois3 = preprocess_clips(det, lmk_to_jax(lm_np),
                                     jnp.asarray(stack3), ucfg.preprocess)
            lengths3 = jnp.asarray(lens3)
            n_univ = int(lens3.sum())
            freps = 2 if smoke else 5
            transcribe_cascade(uparams, ucfg, rois3, lengths3, beam=8,
                               lm_weight=0.4)    # compile + warm
            t0 = time.perf_counter()
            n_res = 0
            for _ in range(freps):
                _, nr = transcribe_cascade(uparams, ucfg, rois3, lengths3,
                                           beam=8, lm_weight=0.4)
                n_res += nr
            universal_fps = n_univ * freps / (time.perf_counter() - t0)
            universal_rescored_frac = n_res / (freps * B3)
    except Exception as e:
        print(f"# universal deployment bench skipped: {e}", file=sys.stderr)

    # sustained serving (round 5): the deployment stack as one overlapped
    # loop — mp4 files -> shm decode ring -> Prefetcher H2D -> tracked conv
    # preprocess -> cascade decode (scripts/serve.py). Unlike the sections
    # above (device-resident ROIs), this number includes host decode, batch
    # assembly, and H2D: it is what a deployer gets from files on disk.
    serving_fps = serving_p50 = serving_cer = None
    try:
        import importlib.util as _ilu2

        _sspec = _ilu2.spec_from_file_location(
            "serve", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "serve.py"))
        _sv = _ilu2.module_from_spec(_sspec)
        _sspec.loader.exec_module(_sv)
        srep = (_sv.serve(n_clips=6, B=2, bucket=64, beam=2) if smoke
                else _sv.serve(n_clips=48, B=8, bucket=96))
        serving_fps = srep.get("serving_sustained_fps")
        serving_p50 = srep.get("latency_p50_ms")
        serving_cer = srep.get("cer")
    except Exception as e:
        print(f"# serving bench skipped: {e}", file=sys.stderr)

    # train-step MFU (fwd+bwd, AdamW; device-resident batch at the B=64
    # knee). K steps run inside ONE jitted lax.fori_loop — immune to the
    # axon tunnel's dispatch-timing noise (CLAUDE.md measurement gotcha);
    # on a real host the hidden per-step dispatch is microseconds.
    # Reported for BOTH frontends (round 3): the MXU-shaped patchify stem
    # (the flagship training configuration once universal-v3 holds its CER
    # pins) and the reference-shaped conv3d stack (cross-round comparable).
    train_mfu = train_fps = None
    train_mfu_conv3d = train_fps_conv3d = None
    try:
        import importlib.util as _ilu

        _spec = _ilu.spec_from_file_location(
            "bench_stem", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "bench_stem.py"))
        _bs = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_bs)
        sB, sK = (8, 2) if smoke else (64, 10)
        r_patch = _bs.bench_stem("patchify", sB, 64, 13, sK)
        r_conv = _bs.bench_stem("conv3d", sB, 64, 13, sK)
        train_fps, train_mfu = r_patch["fps"], r_patch["mfu"]
        train_fps_conv3d, train_mfu_conv3d = r_conv["fps"], r_conv["mfu"]
        train_mfu = round(train_mfu, 4) if train_mfu else None
        train_mfu_conv3d = (round(train_mfu_conv3d, 4)
                            if train_mfu_conv3d else None)
    except Exception as e:
        print(f"# train MFU bench skipped: {e}", file=sys.stderr)

    # host ingest leg (SURVEY.md hard part #6 / VERDICT r2 missing #1:
    # "ffmpeg decode must exceed TPU consumption ... measure, don't assume").
    # host_decode_fps: one cv2 stream. pool_decode_fps: the multi-process
    # decode ring at (cores-1) workers. ingest_sustained_fps: mp4 files on
    # disk -> VideoDecodePool -> VideoFileIterator -> Prefetcher -> fused
    # train step, wall-clock including every host-side stage.
    host_decode_fps = pool_decode_fps = ingest_fps = None
    shm_pool_decode_fps = None
    n_workers = None
    try:
        import tempfile

        from lipreading_tpu.config import preset
        from lipreading_tpu.data.pipeline import (
            Prefetcher,
            ShmVideoDecodePool,
            VideoDecodePool,
            VideoFileIterator,
            video_batch_to_device,
        )
        from lipreading_tpu.data.video import decode_video, write_video
        from lipreading_tpu.ops.preprocess import preprocess_clips  # noqa: F401
        from lipreading_tpu.train.loop import FusedTrainer

        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i, c in enumerate(clips[: 4 if smoke else 16]):
                p = os.path.join(d, f"c{i}.mp4")
                write_video(p, c.frames[:64], fps=25.0)
                paths.append((p, c.text))
            t0 = time.perf_counter()
            n_fr = sum(decode_video(p)[0].shape[0] for p, _ in paths[:8])
            host_decode_fps = n_fr / (time.perf_counter() - t0)

            n_workers = max(1, (os.cpu_count() or 1) - 1)
            # shared-memory ring (round 5): frames via shm slots, only
            # (seq, slot, shape) on the pipe — the parent's per-frame cost
            # drops from pickle+pipe (~4.8k fps ceiling measured round 4)
            # to a memcpy (copy) or nothing (zero-copy views)
            with ShmVideoDecodePool(workers=n_workers,
                                    slot_frames=72) as spool:
                next(iter(spool.imap([paths[0][0]], max_frames=64)))
                t0 = time.perf_counter()
                n_fr = sum(f.shape[0] for f in
                           spool.imap([p for p, _ in paths], max_frames=64,
                                      copy=False))
                shm_pool_decode_fps = n_fr / (time.perf_counter() - t0)

            with VideoDecodePool(workers=n_workers) as pool:
                next(iter(pool.imap([paths[0][0]])))      # warm the spawns
                t0 = time.perf_counter()
                n_fr = sum(f.shape[0] for f in
                           pool.imap([p for p, _ in paths]))
                pool_decode_fps = n_fr / (time.perf_counter() - t0)

                icfg = preset("transformer-attn")
                icfg.data.batch_size = 2 if smoke else 8
                icfg.data.time_buckets = (64,)
                icfg.mesh.data_parallel = 1
                with tempfile.TemporaryDirectory() as wd:
                    from lipreading_tpu.train.loop import batch_sharding

                    tr = FusedTrainer(icfg, wd, det, ert)
                    bsh = batch_sharding(tr.mesh)
                    it = VideoFileIterator(paths, icfg.data,
                                           icfg.data.batch_size, pool)
                    pf = Prefetcher(
                        it, lambda b: video_batch_to_device(b, bsh), depth=2)
                    rkey = jax.random.PRNGKey(2)
                    dev, host = next(pf)          # compile + warm
                    p_, o_, m = tr._jit_step(tr.params, tr.opt_state,
                                             tr._det, tr._ert, tr._presence,
                                             dev, rkey)
                    jax.block_until_ready(m)
                    n_steps = 2 if smoke else 6
                    t0 = time.perf_counter()
                    fr_done = 0
                    for _ in range(n_steps):
                        dev, host = next(pf)
                        p_, o_, m = tr._jit_step(p_, o_, tr._det, tr._ert,
                                                 tr._presence, dev, rkey)
                        fr_done += int(host.frame_lengths.sum())
                    float(m["loss"])              # force real D2H
                    ingest_fps = fr_done / (time.perf_counter() - t0)
                    pf.close()
    except Exception as e:
        print(f"# host ingest bench skipped: {e}", file=sys.stderr)

    from lipreading_tpu.flops import mfu as _mfu2, preprocess_flops

    pre_mfu = _mfu2(preprocess_flops(pre_cfg, *frames.shape[1:3]) * tpu_fps,
                    "float32")
    print(json.dumps({
        "metric": "preprocess_fps_per_chip",
        "value": round(tpu_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "cpu_oracle_fps": round(cpu_fps, 1),
        "parity_max_diff": max_diff,
        "preprocess_fps_n2048": (round(ert_knee_fps, 1)
                                 if ert_knee_fps else None),
        "preprocess_conv_landmarker_fps": round(conv_fps, 1) if conv_fps else None,
        "e2e_video_to_transcript_fps": round(e2e_fps, 1) if e2e_fps else None,
        "e2e_flagship_fps": round(flagship_fps, 1) if flagship_fps else None,
        "e2e_flagship_cascade_fps": (round(cascade_fps, 1)
                                     if cascade_fps else None),
        "cascade_rescored_frac": (round(cascade_rescored_frac, 3)
                                  if cascade_rescored_frac is not None
                                  else None),
        "e2e_universal_cascade_fps": (round(universal_fps, 1)
                                      if universal_fps else None),
        "universal_rescored_frac": (round(universal_rescored_frac, 3)
                                    if universal_rescored_frac is not None
                                    else None),
        "serving_sustained_fps": serving_fps,
        "serving_latency_p50_ms": serving_p50,
        "serving_cer": serving_cer,
        "train_step_fps": round(train_fps, 1) if train_fps else None,
        "train_step_mfu": train_mfu,
        "train_step_fps_conv3d": (round(train_fps_conv3d, 1)
                                  if train_fps_conv3d else None),
        "train_step_mfu_conv3d": train_mfu_conv3d,
        "host_decode_fps": round(host_decode_fps, 1) if host_decode_fps else None,
        "pool_decode_fps": round(pool_decode_fps, 1) if pool_decode_fps else None,
        "shm_pool_decode_fps": (round(shm_pool_decode_fps, 1)
                                if shm_pool_decode_fps else None),
        "pool_decode_workers": n_workers,
        "ingest_sustained_fps": round(ingest_fps, 1) if ingest_fps else None,
        "preprocess_mfu": round(pre_mfu, 5) if pre_mfu else None,
        "backend": backend,
        "batch_frames": n,
    }))


if __name__ == "__main__":
    main()
