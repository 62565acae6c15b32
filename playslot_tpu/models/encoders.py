"""
Image encoders (channels-last / NHWC, TPU-native).

Capability parity with reference src/models/EncodersDecoders/encoders.py:
a stack of Conv(+BN)(+MaxPool)+ReLU blocks; the LAST conv has no activation.

A space-to-depth form of the stride-1 stacks (ops/experimental/s2d_conv.py) is built in
and flag-selectable, but MEASURED OFF by default: the 32-channel convs
underfill the MXU's 128 lanes and the f=2 re-gridding (f^2*C channels,
exact to float reassociation) wins 8 ms on the isolated conv slice
(docs/ENCODE_BREAKDOWN.json), yet the full bench step REGRESSES ~6 ms
(581.9 -> 588.0 ms @ B=128, 2x2 A/B) — the extra s2d/d2s data movement
and 1.44x redundant FLOPs cost more than the lane fill saves once XLA
fuses the encode into the surrounding program. Same lesson as the
block-causal Pallas kernel (docs/PERFORMANCE.md): isolated-slice wins
must be re-proven end-to-end. Controlled by PLAYSLOT_S2D_ENCODER=auto|0|1
(auto = off); parameters and checkpoint layout are identical on both paths.
"""

import os
from typing import Any, Sequence, Tuple

import flax.linen as nn

from playslot_tpu.models.blocks import ConvBlock, xavier_init, zeros_init
from playslot_tpu.ops.experimental.s2d_conv import (depth_to_space, s2d_conv_block,
                                       space_to_depth)


def use_s2d_encoder():
    """Whether eligible encoder stacks run in space-to-depth form.
    PLAYSLOT_S2D_ENCODER = auto|0|1. `auto` resolves to OFF: the 2x2 A/B
    on hardware measured the s2d form ~6 ms slower end-to-end at bench
    shapes (see module docstring). `1` forces it on for re-measurement."""
    return os.environ.get("PLAYSLOT_S2D_ENCODER", "auto") == "1"


class _ConvParams(nn.Module):
    """Declares the params of an nn.Conv (same names/shapes/inits) without
    applying it — lets the s2d path share ConvBlock's checkpoint layout."""

    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_init, self.kernel_shape)
        bias = self.param("bias", zeros_init, (self.kernel_shape[-1],))
        return kernel, bias


class _BlockConvParams(nn.Module):
    """Param scope shim: block_{i}/conv/{kernel,bias}, as ConvBlock creates."""

    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kernel_shape, name="conv")()


class SimpleConvEncoder(nn.Module):
    """Simple fully-convolutional encoder. Ref encoders.py:46-104."""

    hidden_dims: Sequence[int] = (64, 64, 64, 64)
    kernel_size: int = 5
    stride: int = 1
    batch_norm: bool = False
    downsample_encoder: bool = False
    downsample: int = 2
    dtype: Any = None

    @property
    def out_features(self):
        return self.hidden_dims[-1]

    def _s2d_eligible(self, x, f=2):
        """s2d form covers plain stride-1 SAME conv stacks (no BN/pool) with
        odd kernels — even kernels pad asymmetrically in the ConvBlock path
        ((k//2, k//2) both sides changes the output size), which the
        symmetric s2d kernel construction does not reproduce."""
        H, W = x.shape[-3], x.shape[-2]
        return (self.stride == 1 and not self.batch_norm
                and not self.downsample_encoder
                and self.kernel_size % 2 == 1
                and H % f == 0 and W % f == 0 and min(H, W) >= 2 * f)

    @nn.compact
    def __call__(self, x, train=False):
        """x: (B, H, W, C) -> (B, H', W', hidden_dims[-1])"""
        n = len(self.hidden_dims)
        if self._s2d_eligible(x) and use_s2d_encoder():
            f = 2
            cin = x.shape[-1]
            y = space_to_depth(x, f)
            if self.dtype is not None:
                y = y.astype(self.dtype)
            for i, h_dim in enumerate(self.hidden_dims):
                w, b = _BlockConvParams(
                    (self.kernel_size, self.kernel_size, cin, h_dim),
                    name=f"block_{i}")()
                y = s2d_conv_block(y, w, b, f, relu=(i < n - 1))
                cin = h_dim
            return depth_to_space(y, f)
        for i, h_dim in enumerate(self.hidden_dims):
            x = ConvBlock(
                out_channels=h_dim,
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=self.kernel_size // 2,
                batch_norm=bool(self.batch_norm),
                max_pool=(self.downsample if self.downsample_encoder and i < n - 1 else None),
                activation=(i < n - 1),
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train)
        return x


ENCODERS = {"ConvEncoder": SimpleConvEncoder}


def get_encoder(encoder: dict, dtype=None) -> nn.Module:
    """Factory mirroring reference get_encoder (encoders.py:18-41)."""
    name = encoder["encoder_name"]
    if name not in ENCODERS:
        raise ValueError(f"Unknown encoder_name {name}. Use one of {list(ENCODERS)}")
    p = dict(encoder["encoder_params"])
    return SimpleConvEncoder(
        hidden_dims=tuple(p["num_channels"]),
        kernel_size=p["kernel_size"],
        stride=p.get("stride", 1),
        batch_norm=bool(p.get("batch_norm") or False),
        downsample_encoder=p.get("downsample_encoder", False),
        downsample=p.get("downsample", 2),
        dtype=dtype,
        name="encoder",
    )
