"""
Image encoders (channels-last / NHWC, TPU-native).

Capability parity with reference src/models/EncodersDecoders/encoders.py:
a stack of Conv(+BN)(+MaxPool)+ReLU blocks; the LAST conv has no activation.
"""

from typing import Any, Sequence

import flax.linen as nn

from playslot_tpu.models.blocks import ConvBlock


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

    @nn.compact
    def __call__(self, x, train=False):
        """x: (B, H, W, C) -> (B, H', W', hidden_dims[-1])"""
        n = len(self.hidden_dims)
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
