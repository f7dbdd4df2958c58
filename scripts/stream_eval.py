#!/usr/bin/env python
"""Styled multi-clip stream ladder: per-release streaming CER vs the
per-clip decode floor.

Round-2/3 measured the styled 2-clip stream plateau at 0.083-0.115 CER
under universal-v2 (where per-clip decode is 0.000) and diagnosed it as
cross-shot context contamination. Round 4 re-measures under universal-v4
(framewise norm: chunked decode no longer sees pad-statistics shift) and
with the tracked path's cut_flush hard-cut detector, which splits context
at the styled-clip boundary (two faces back to back, no detection gap).

Usage: python scripts/stream_eval.py [releases=universal,universal4]
           [variation=0.6] [pairs=3] [beam=4] [lm_weight=0.4] [window=64]
           [assets_variant=robust] [tracked=1]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides  # noqa: E402


def main(argv):
    args = parse_overrides(argv)
    releases = str(args.get("releases", "universal,universal4")).split(",")
    variation = float(args.get("variation", 0.6))
    pairs = int(args.get("pairs", 3))
    beam = int(args.get("beam", 4))
    lm_weight = float(args.get("lm_weight", 0.4))
    window = int(args.get("window", 64))
    assets_variant = str(args.get("assets_variant", "robust"))
    tracked = bool(int(args.get("tracked", 1)))

    import numpy as np

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.metrics import cer
    from lipreading_tpu.ops.preprocess import preprocess_clips
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.preproc_training import (
        load_assets,
        load_presence,
        load_release_model,
    )
    from lipreading_tpu.streaming import StreamingTranscriber

    det_np, ert_np = load_assets(variant=assets_variant)
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    presence = load_presence(variant=assets_variant)

    streams = []
    for p in range(pairs):
        seeds = (33001 + 100 * p, 33002 + 100 * p)
        streams.append(seeds)

    for rel_name in releases:
        rel = load_release_model(f"transformer_hybrid_{rel_name}")
        if rel is None:
            print(f"{rel_name}: release not found, skipped")
            continue
        params, cfg = rel
        rows = []
        for seeds in streams:
            clips = [make_clip(s, cfg.data, variation=variation)
                     for s in seeds]
            frames = np.concatenate([c.frames for c in clips])
            truth = " ".join(c.text for c in clips)

            # floor: per-clip decode (pad to the longer clip)
            T = max(c.frames.shape[0] for c in clips)
            batch = np.zeros((len(clips), T) + clips[0].frames.shape[1:],
                             clips[0].frames.dtype)
            lens = []
            for i, c in enumerate(clips):
                batch[i, : c.frames.shape[0]] = c.frames
                lens.append(c.frames.shape[0])
            rois = preprocess_clips(det, ert, batch)
            hyps = transcribe(params, cfg, rois, np.asarray(lens),
                              beam=beam, lm_weight=lm_weight)
            floor = cer(" ".join(hyps), truth)

            def run_stream(trk):
                st = StreamingTranscriber(
                    params, cfg, det, ert, window=window, decode_every=12,
                    chunk_bucket=8, beam=beam, lm_weight=lm_weight,
                    tracked=trk, presence=presence if trk else None)
                for lo in range(0, frames.shape[0], 8):
                    st.feed(frames[lo:lo + 8])
                return st.finish()

            plain = cer(run_stream(False), truth)
            trk = cer(run_stream(True), truth) if tracked else None
            rows.append((seeds, floor, plain, trk))
            print(f"{rel_name} {seeds}: floor={floor:.4f} "
                  f"plain={plain:.4f}"
                  + (f" tracked+cutflush={trk:.4f}" if trk is not None
                     else ""), flush=True)
        f = np.mean([r[1] for r in rows])
        pl = np.mean([r[2] for r in rows])
        print(f"{rel_name} MEAN over {len(rows)} streams: floor={f:.4f} "
              f"plain={pl:.4f}"
              + (f" tracked+cutflush={np.mean([r[3] for r in rows]):.4f}"
                 if tracked else ""), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
