#!/bin/bash
python scripts/06_generate_figs_pred.py \
  -d experiments/BlockPush/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_BlockPush.pth \
  --checkpoint PlaySlot_BlockPush.pth \
  --num_seed 6 --num_preds 15
