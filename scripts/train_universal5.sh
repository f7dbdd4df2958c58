#!/bin/bash
# Universal-v5 candidate: conv3d frontend + framewise_norm, from scratch on
# the 2250-clip corpus_u4 (greedy-parity attempt — the one open quality
# item after v4: greedy canonical 0.0233 vs v2's 0.0116).
#
# Rationale: every patchify-stem release (v3/v4) and both warm-start
# fine-tunes have a weaker greedy head than conv3d-stem v2; the two
# fine-tune attempts traded robustness for partial greedy gains and were
# rejected (BASELINE.md). The untried lever is the FRONTEND: train v2's
# conv3d stem under v4's recipe (framewise norm for pad-invariance,
# ctc/att 0.5/0.5, roi_augment 0.15, the full mixed corpus with conv
# views). Costs ~3x patchify train time — a release-quality decision, not
# the training-throughput flagship (that stays patchify).
#
# Ship gate (scripts/ft_eval_u4.sh with W=runs/universal5): greedy
# canonical <= 0.0116 AND beam canonical 0.0058 AND conv canonical 0.0058
# AND robust-conv styled@24 <= 0.0180 AND robust-ERT styled <= 0.0150.
# Anything worse: record and reject (v4 stays).
set -e
cd /root/repo
test -f runs/corpus_u4/index.json || {
  echo "corpus_u4 missing/incomplete; run scripts/build_corpus_u4.sh" >&2
  exit 2; }
exec python scripts/train.py preset=transformer-attn \
  workdir=runs/universal5 dataview=runs/corpus_u4 \
  model.framewise_norm=1 \
  train.total_steps=16000 train.ctc_weight=0.5 train.att_weight=0.5 \
  train.roi_augment=0.15 train.checkpoint_every=4000 \
  "$@"
