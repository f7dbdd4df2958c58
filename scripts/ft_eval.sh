#!/bin/bash
# Eval ladder for the universal3ct fine-tune candidate (runs/universal3ct).
# Targets (universal3 release numbers to hold / beat):
#   greedy canonical (beam=1 decode=ctc): v3 0.0291 -> want <= v2's 0.0116
#   canonical beam8+LM: hold 0.0058 ; styled(0.6)@24: hold ~0.0120
#   conv-path canonical: hold 0.0058 ; robust-conv styled@24: hold ~0.0210
set -e
cd /root/repo
W=runs/universal3ct
run() { echo "== $*"; python scripts/evaluate.py workdir=$W "$@"; }
run n_clips=12 seed=717171 beam=1 decode=ctc
run n_clips=12 seed=717171 beam=8 lm_weight=0.4
run n_clips=24 seed=717171 beam=8 lm_weight=0.4 variation=0.6 assets_variant=robust
run n_clips=12 seed=717171 beam=8 lm_weight=0.4 preprocess.landmarker=conv
run n_clips=24 seed=717171 beam=8 lm_weight=0.4 variation=0.6 \
    assets_variant=robust preprocess.landmarker=conv
