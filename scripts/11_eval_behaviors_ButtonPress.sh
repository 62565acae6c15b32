#!/bin/bash
python scripts/11_evaluate_behavior_on_simulation.py \
  -d experiments/ButtonPress/ \
  --name_pred_exp PlaySlot \
  --name_beh_exp Policy_AllDemos \
  --savi_ckpt SAVi_ButtonPress.pth \
  --pred_ckpt PlaySlot_ButtonPress.pth \
  --behavior_ckpt checkpoint_epoch_final \
  --num_sims 10
