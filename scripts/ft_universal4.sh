#!/bin/bash
# Universal-v4 from-scratch run (VERDICT r3 #1+#3 combined): patchify stem
# with framewise_norm=1 (pad-invariance fix trained IN, not just a knob),
# balanced ctc/att 0.5/0.5 (stronger greedy head without the universal3ct
# warm-start's styled regression — BASELINE.md round-4 rejection row),
# roi_augment 0.15 (the v3 robustness lever), 16k steps on the 2250-clip
# mixed corpus incl. robust-conv views (scripts/build_corpus_u4.sh).
#
# Eval ladder afterwards: scripts/ft_eval.sh (point W= at runs/universal4).
set -e
cd /root/repo
test -f runs/corpus_u4/index.json || {
  echo "corpus_u4 missing/incomplete; run scripts/build_corpus_u4.sh" >&2
  exit 2; }
exec python scripts/train.py preset=transformer-patchify \
  workdir=runs/universal4 dataview=runs/corpus_u4 \
  model.framewise_norm=1 \
  train.total_steps=16000 train.ctc_weight=0.5 train.att_weight=0.5 \
  train.roi_augment=0.15 train.checkpoint_every=4000 \
  "$@"
