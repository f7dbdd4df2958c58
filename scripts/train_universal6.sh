#!/bin/bash
# Universal-v6 candidate: v4 recipe on corpus_u6 = corpus_u4 + a second
# copy of its ERT-path views (runs/corpus_ertonly; 16,269 samples, ERT:conv
# ~ 89:11 by sample mass).
#
# Rationale (BASELINE.md round-5 greedy attribution): 4k-step probes on the
# real chip show corpus_u4's conv-path views carry the largest share of the
# v4 greedy gap (control 0.0349 -> 0.0174 when removed), but removing them
# breaks the deployment path (conv canonical 0.0116, robust-conv 0.0210 —
# both gate misses). Upweighting the ERT mass 2x keeps the conv views'
# deployment parity while shifting the greedy head toward the ERT
# distribution.
#
# Ship gate (scripts/ft_eval_u4.sh with W=runs/universal6): greedy
# canonical <= 0.0116 AND beam canonical <= 0.0058 AND conv canonical
# 0.0058 AND robust-conv styled@24 <= 0.0180 AND robust-ERT styled <=
# 0.0150. Anything worse: record and reject (v4 stays).
set -e
cd /root/repo
test -f runs/corpus_u6/index.json || {
  echo "corpus_u6 missing; merge corpus_u4 + corpus_ertonly first" >&2
  exit 2; }
exec python scripts/train.py preset=transformer-patchify \
  workdir=runs/universal6 dataview=runs/corpus_u6 \
  model.framewise_norm=1 \
  train.total_steps=16000 train.ctc_weight=0.5 train.att_weight=0.5 \
  train.roi_augment=0.15 train.checkpoint_every=4000 \
  "$@"
