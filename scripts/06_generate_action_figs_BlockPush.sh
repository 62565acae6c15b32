#!/bin/bash
python scripts/06_generate_action_figs.py \
  -d experiments/BlockPush/ \
  --name_pred_exp PlaySlot \
  --savi_ckpt SAVi_BlockPush.pth \
  --checkpoint PlaySlot_BlockPush.pth
