#!/bin/bash
python scripts/06_generate_figs_pred.py \
  -d experiments/Sketchy/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_Sketchy.pth \
  --checkpoint PlaySlot_Sketchy.pth \
  --num_seed 6 --num_preds 15
