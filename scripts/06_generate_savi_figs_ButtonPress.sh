#!/bin/bash
python scripts/06_generate_figs_savi.py \
  -d experiments/ButtonPress/ \
  --checkpoint SAVi_ButtonPress.pth
