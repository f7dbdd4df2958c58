#!/usr/bin/env python
"""Train the preprocessing models (face detector + ERT landmarker) on the
synthetic fixture corpus and write shared-weight assets to assets/.

Usage: python scripts/train_preprocessor.py [seed=0] [n_clips=40] [det_steps=1500]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides
from lipreading_tpu.preproc_training import train_all

kw = {k: int(v) for k, v in parse_overrides(sys.argv[1:]).items()}
train_all(**kw, verbose=True)
