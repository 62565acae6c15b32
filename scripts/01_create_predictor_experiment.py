#!/usr/bin/env python3
"""Mirror of reference src/01_create_predictor_experiment.py — thin wrapper over playslot_tpu.cli."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from playslot_tpu.cli.create_experiment import create_predictor_experiment as _main

if __name__ == "__main__":
    _main()
