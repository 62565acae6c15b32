#!/bin/bash
python scripts/03_evaluate_savi.py \
  -d experiments/ButtonPress/ \
  --checkpoint SAVi_ButtonPress.pth \
  --results_name quant_eval_savi
