#!/bin/bash
# Eval ladder for the universal-v4 candidate (runs/universal4; VERDICT r3
# #1/#3/#4). Targets (universal3 release numbers to hold / beat):
#   greedy canonical (beam=1 decode=ctc): v3 0.0291 -> want <= v2's 0.0116
#   canonical beam8+LM: hold 0.0058 ; styled(0.6)@24: hold ~0.0120
#   conv-path canonical: hold 0.0058
#   robust-conv styled@24: v3 0.0210 -> want <= 0.0170 (VERDICT r3 #4)
# Plus: cascade mode on canonical (rescore count) — v4 is framewise, so
# the ladder also exercises the single-bucket cascade path.
set -e
cd /root/repo
W=${W:-runs/universal4}
run() { echo "== $*"; python scripts/evaluate.py workdir=$W "$@"; }
run n_clips=12 seed=717171 beam=1 decode=ctc
run n_clips=12 seed=717171 beam=8 lm_weight=0.4
run n_clips=12 seed=717171 beam=8 lm_weight=0.4 decode=cascade
run n_clips=24 seed=717171 beam=8 lm_weight=0.4 variation=0.6 assets_variant=robust
run n_clips=12 seed=717171 beam=8 lm_weight=0.4 preprocess.landmarker=conv
run n_clips=24 seed=717171 beam=8 lm_weight=0.4 variation=0.6 \
    assets_variant=robust preprocess.landmarker=conv
