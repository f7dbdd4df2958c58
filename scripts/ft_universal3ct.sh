#!/bin/bash
# Universal-v3 warm-start fine-tune (the CTC-head fix, CLAUDE.md round-3 plan):
# patchify flagship init_from=universal3, ctc_weight 0.6 / att 0.4,
# roi_augment 0.3, low LR, on the regenerated 2250-clip mixed corpus
# (ERT 900x2 + conv-path 450, per-clip variation [0, 0.7)).
#
# Prereqs: TPU tunnel up; runs/corpus_ft built (.scratch_corpus.sh).
# Produces runs/universal3ct/; eval ladder: scripts/ft_eval.sh.
set -e
cd /root/repo
test -f runs/corpus_ft/index.json || {
  echo "corpus_ft missing/incomplete; run .scratch_corpus.sh first" >&2
  exit 2; }
exec python scripts/train.py preset=transformer-patchify \
  workdir=runs/universal3ct dataview=runs/corpus_ft \
  init_from=transformer_hybrid_universal3 \
  train.total_steps=6000 train.learning_rate=1e-4 train.warmup_steps=100 \
  train.ctc_weight=0.6 train.att_weight=0.4 train.roi_augment=0.3 \
  "$@"
