#!/bin/bash
python scripts/06_generate_action_figs.py \
  -d experiments/ButtonPress/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_ButtonPress.pth \
  --checkpoint PlaySlot_ButtonPress.pth
