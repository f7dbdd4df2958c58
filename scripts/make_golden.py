#!/usr/bin/env python
"""Generate the BASELINE config-1 artifact: a deterministic per-stage tensor
dump of the CPU oracle pipeline on fixture clip 0 (tests/golden/clip0.npz).

Every kernel change is diffed against this dump (SURVEY.md §5 item 1).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from lipreading_tpu.fixtures import make_clip
from lipreading_tpu.oracle.pipeline import run_clip, golden_dump
from lipreading_tpu.preproc_training import load_assets

det, ert = load_assets()
clip = make_clip(0)
res = run_clip(clip.frames, det, ert)
out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "clip0.npz")
os.makedirs(os.path.dirname(out), exist_ok=True)
golden_dump(res, out)
print("oracle fps:", res.frames_per_sec)
print("wrote", out, os.path.getsize(out), "bytes")
# sanity: predicted landmarks close to fixture ground truth
err = np.abs(res.landmarks - clip.landmarks).mean()
print("landmark err vs fixture GT:", err, "px")
