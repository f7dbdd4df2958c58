#!/bin/bash
# Build the universal-v4 training corpus (2250 clips), reconstructing the
# v2/v3 recipe (BASELINE.md round-2/3 rows) with fresh seeds:
#   - 2x 900 ERT-path views, per-clip variation drawn from [0, 0.7)
#     behind the robust stack (mixed canonical+styled appearances)
#   - 450 conv-landmarker-path views, same variation range (subpixel ROI
#     sampling rides along: roi_sampling=auto for landmarker != ert)
# merged into runs/corpus_u4.
set -e
cd /root/repo
G=scripts/generate_dataview.py
python $G out=runs/corpus_u4_a n_clips=900 seed=101 variation=0 variation_max=0.7 assets_variant=robust
python $G out=runs/corpus_u4_b n_clips=900 seed=202 variation=0 variation_max=0.7 assets_variant=robust
python $G out=runs/corpus_u4_c n_clips=450 seed=303 variation=0 variation_max=0.7 assets_variant=robust landmarker=conv
python $G out=runs/corpus_u4 merge=runs/corpus_u4_a,runs/corpus_u4_b,runs/corpus_u4_c
echo "corpus_u4 DONE"
