"""
Helpers for golden-output parity tests against the PyTorch reference at
/root/reference. We import the reference modules directly (never copying
code) and compare converted-parameter outputs numerically.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"


def import_reference():
    """Put the reference src tree on sys.path and import torch. Skip if absent."""
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference repo not available")
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


def to_torch_video(x_nhwc, torch):
    """(B, T, H, W, C) numpy -> (B, T, C, H, W) torch tensor."""
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 1, 4, 2, 3).contiguous()


def to_numpy_video(x_btchw):
    """(B, T, C, H, W) torch -> (B, T, H, W, C) numpy."""
    return x_btchw.detach().permute(0, 1, 3, 4, 2).cpu().numpy()
