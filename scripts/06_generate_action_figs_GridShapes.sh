#!/bin/bash
python scripts/06_generate_action_figs.py \
  -d experiments/GridShapes/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_GridShapes.pth \
  --checkpoint PlaySlot_GridShapes.pth
