#!/bin/bash
python scripts/11_evaluate_behavior_on_simulation.py \
  -d experiments/BlockPush/ \
  --name_pred_exp PlaySlot \
  --name_beh_exp Policy_AllDemos \
  --savi_ckpt SAVi_BlockPush.pth \
  --pred_ckpt PlaySlot_BlockPush.pth \
  --behavior_ckpt checkpoint_epoch_final \
  --num_sims 10
