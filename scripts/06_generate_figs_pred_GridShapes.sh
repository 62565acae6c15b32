#!/bin/bash
python scripts/06_generate_figs_pred.py \
  -d experiments/GridShapes/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_GridShapes.pth \
  --checkpoint PlaySlot_GridShapes.pth \
  --num_seed 6 --num_preds 15
