#!/bin/bash
python scripts/06_generate_action_figs.py \
  -d experiments/Sketchy/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_Sketchy.pth \
  --checkpoint PlaySlot_Sketchy.pth
