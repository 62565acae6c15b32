#!/bin/bash
python scripts/05_evaluate_OCVP.py \
  -d experiments/BlockPush/ \
  --name_pred_exp ActCondOCVP \
  --savi_ckpt SAVi_BlockPush.pth \
  --checkpoint ActCondOCVP_BlockPush.pth \
  --results_name quant_eval_ocvp \
  --post_only --num_seed 6 --num_preds 15 --set_expert_policy
