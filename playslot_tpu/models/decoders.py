"""
Spatial-broadcast slot decoders (channels-last / NHWC, TPU-native).

Capability parity with reference src/models/EncodersDecoders/decoders.py:
conv stack traversing hidden_dims in REVERSE order, optional nearest-neighbor
upsampling between hidden layers, final 3x3 conv to RGB+alpha.
"""

from typing import Any, Optional, Sequence

import jax
import flax.linen as nn

from playslot_tpu.models.blocks import ConvBlock, xavier_init, zeros_init


class ConvDecoder(nn.Module):
    """Simple fully-convolutional decoder. Ref decoders.py:45-118."""

    hidden_dims: Sequence[int]
    kernel_size: int = 5
    stride: int = 1
    batch_norm: bool = False
    upsample: Optional[int] = None
    out_channels: int = 4  # RGB + alpha mask
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        """x: (B, H, W, slot_dim) -> (B, H', W', out_channels)"""
        idx = 0
        for i in range(len(self.hidden_dims) - 1, -1, -1):
            x = ConvBlock(
                out_channels=self.hidden_dims[i],
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=self.kernel_size // 2,
                batch_norm=bool(self.batch_norm),
                activation=True,
                dtype=self.dtype,
                name=f"block_{idx}",
            )(x, train=train)
            idx += 1
            if isinstance(self.upsample, int) and self.upsample > 1 and i > 0:
                B, H, W, C = x.shape
                x = jax.image.resize(
                    x, (B, H * self.upsample, W * self.upsample, C), method="nearest"
                )
        x = nn.Conv(
            features=self.out_channels, kernel_size=(3, 3), strides=(1, 1),
            padding=[(1, 1), (1, 1)], kernel_init=xavier_init, bias_init=zeros_init,
            dtype=self.dtype, name="final_conv",
        )(x)
        return x


DECODERS = {"ConvDecoder": ConvDecoder}


def get_decoder(decoder: dict, out_channels=4, dtype=None) -> nn.Module:
    """Factory mirroring reference get_decoder (decoders.py:18-34)."""
    name = decoder["decoder_name"]
    if name not in DECODERS:
        raise ValueError(f"Unknown decoder_name {name}. Use one of {list(DECODERS)}")
    p = dict(decoder["decoder_params"])
    return ConvDecoder(
        hidden_dims=tuple(p["num_channels"]),
        kernel_size=p["kernel_size"],
        stride=p.get("stride", 1),
        batch_norm=bool(p.get("batch_norm") or False),
        upsample=p.get("upsample"),
        out_channels=out_channels,
        dtype=dtype,
        name="decoder",
    )
