#!/usr/bin/env python3
"""Mirror of reference src/05_evaluate_OCVP.py — thin wrapper over playslot_tpu.cli."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from playslot_tpu.cli.evaluate_ocvp import main as _main

if __name__ == "__main__":
    _main()
