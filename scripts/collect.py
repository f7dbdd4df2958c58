#!/usr/bin/env python
"""Workflow step 0 (ref: data collection — SURVEY.md §4.4): fetch videos +
.vtt caption tracks into the data/raw/<show>/ layout the dataview builder
consumes.

The reference shells out to youtube-dl over a curated video-id list. This
environment is zero-egress (SURVEY.md §0), so the downloader is gated: with
a yt-dlp/youtube-dl binary on PATH it downloads for real; without one it
errors cleanly per id — and `fixtures=N` synthesizes a fully-offline corpus
(rendered clips + exact .vtt tracks) in the same layout, which is how every
checked-in dataview was produced.

Usage:
  python scripts/collect.py ids=ids.txt out=data/raw/StephenColbert
  python scripts/collect.py fixtures=24 out=data/raw/fixtures [seed=7]

Layout written (per id / fixture):
  <out>/<id>.mp4      video
  <out>/<id>.vtt      WebVTT captions
"""
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides


def collect_ids(ids_path: str, out: str) -> int:
    """Download each video id + captions with yt-dlp/youtube-dl."""
    dl = shutil.which("yt-dlp") or shutil.which("youtube-dl")
    if dl is None:
        raise SystemExit(
            "no yt-dlp/youtube-dl on PATH (zero-egress environment?). "
            "Use fixtures=N for the offline corpus, or install a downloader."
        )
    os.makedirs(out, exist_ok=True)
    with open(ids_path) as f:
        ids = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    done = 0
    for vid in ids:
        r = subprocess.run(
            [dl, "--write-subs", "--sub-langs", "en", "--sub-format", "vtt",
             "-f", "mp4", "-o", os.path.join(out, f"{vid}.%(ext)s"),
             f"https://www.youtube.com/watch?v={vid}"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            print(f"FAILED {vid}: {r.stderr.strip().splitlines()[-1:]}")
        else:
            done += 1
            print(f"ok {vid}")
    return done


def collect_fixtures(n: int, out: str, seed: int) -> int:
    """Render n fixture clips as .mp4 + exact .vtt in the raw layout."""
    from lipreading_tpu.data.video import write_video
    from lipreading_tpu.fixtures import make_clip

    os.makedirs(out, exist_ok=True)
    for i in range(n):
        clip = make_clip(seed + i)
        stem = os.path.join(out, f"fixture{seed + i:06d}")
        write_video(stem + ".mp4", clip.frames, clip.fps)
        with open(stem + ".vtt", "w") as f:
            f.write(clip.vtt)
    return n


def main(argv):
    args = parse_overrides(argv)
    out = args.pop("out", "data/raw/fixtures")
    if "fixtures" in args:
        n = collect_fixtures(int(args.pop("fixtures")), out,
                             int(args.pop("seed", 7)))
    elif "ids" in args:
        n = collect_ids(args.pop("ids"), out)
    else:
        raise SystemExit(__doc__)
    assert not args, f"unknown args {args}"
    print(f"collected {n} items into {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
