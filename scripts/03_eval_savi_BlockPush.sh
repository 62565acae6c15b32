#!/bin/bash
# Canonical SAVi eval on BlockPush (mirror of reference scripts/03_eval_savi_BlockPush.sh)
python scripts/03_evaluate_savi.py \
  -d experiments/BlockPush/ \
  --checkpoint SAVi_BlockPush.pth \
  --results_name quant_eval_savi
