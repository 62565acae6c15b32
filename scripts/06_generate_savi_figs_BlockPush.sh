#!/bin/bash
python scripts/06_generate_figs_savi.py \
  -d experiments/BlockPush/ \
  --checkpoint SAVi_BlockPush.pth
