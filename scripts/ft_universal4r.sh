#!/bin/bash
# Robust-conv emphasis fine-tune of the shipped universal-v4 (VERDICT r3 #4:
# robust styled@24 behind conv <= 0.0170, i.e. within 0.005 of the
# robust-ERT 0.0120). v4's corpus was 20% conv-path views; this warm start
# re-balances to 50% conv (fresh-seed styled conv views + the original conv
# set) while keeping 900 ERT-path views so the ERT rows don't drift.
#
# Ship gate (scripts/ft_eval_u4.sh with W=runs/universal4r): robust-conv
# styled@24 <= 0.0170 AND canonical beam 0.0058 AND conv canonical 0.0058
# AND greedy <= 0.0233 AND robust-ERT styled <= 0.0150 (no regression).
set -e
cd /root/repo
G=scripts/generate_dataview.py
test -f runs/corpus_u4_c/index.json || { echo "corpus_u4_c missing" >&2; exit 2; }
if ! test -f runs/corpus_ftc/index.json; then
  python $G out=runs/corpus_u4_d n_clips=450 seed=404 variation=0 \
    variation_max=0.7 assets_variant=robust landmarker=conv
  python $G out=runs/corpus_ftc \
    merge=runs/corpus_u4_b,runs/corpus_u4_c,runs/corpus_u4_d
fi
exec python scripts/train.py preset=transformer-patchify \
  workdir=runs/universal4r dataview=runs/corpus_ftc \
  init_from=transformer_hybrid_universal4 model.framewise_norm=1 \
  train.total_steps=4000 train.learning_rate=1e-4 \
  train.ctc_weight=0.5 train.att_weight=0.5 \
  train.roi_augment=0.15 train.checkpoint_every=2000 \
  "$@"
