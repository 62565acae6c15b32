#!/bin/bash
python scripts/11_evaluate_oracle_simulation.py \
  -d experiments/ButtonPress/ \
  --name_oracle_exp Oracle \
  --savi_ckpt SAVi_ButtonPress.pth \
  --behavior_ckpt checkpoint_epoch_final \
  --num_sims 10
