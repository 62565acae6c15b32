#!/bin/bash
python scripts/06_generate_figs_pred.py \
  -d experiments/ButtonPress/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_ButtonPress.pth \
  --checkpoint PlaySlot_ButtonPress.pth \
  --num_seed 6 --num_preds 15
