"""
Exactness tests for the space-to-depth conv reformulation (ops/experimental/s2d_conv.py)
against lax.conv_general_dilated at stride 1 / SAME padding — the decoder
conv family (reference decoders.py:45-118). The mapping is algebraically
exact: same taps, same summands, float reassociation only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playslot_tpu.ops.experimental.s2d_conv import (depth_to_space, s2d_conv,
                                       space_to_depth, tiled_conv)

_DN = ("NHWC", "HWIO", "NHWC")


@pytest.mark.parametrize("H,W,cin,cout,k,f", [
    (8, 8, 3, 5, 5, 2),
    (16, 12, 4, 6, 3, 2),
    (16, 16, 8, 8, 5, 2),
    (8, 8, 2, 3, 3, 4),
    (12, 8, 5, 4, 5, 4),
])
def test_s2d_conv_matches_lax_conv(H, W, cin, cout, k, f):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2,) * 2] * 2, dimension_numbers=_DN) + b
    got = s2d_conv(x, w, b, f=f)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_s2d_conv_relu_matches():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(5, 5, 4, 6), jnp.float32)
    ref = jax.nn.relu(jax.lax.conv_general_dilated(
        x, w, (1, 1), [(2, 2)] * 2, dimension_numbers=_DN))
    got = s2d_conv(x, w, None, f=2, relu=True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-5


@pytest.mark.parametrize("H,W,cin,cout,k,f", [
    (8, 8, 3, 5, 5, 2),
    (16, 12, 4, 6, 3, 2),
    (16, 16, 8, 4, 3, 2),
    (8, 8, 2, 3, 3, 4),
    (12, 8, 5, 4, 5, 4),
])
def test_tiled_conv_matches_lax_conv(H, W, cin, cout, k, f):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, H, W, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2,) * 2] * 2, dimension_numbers=_DN) + b
    got = tiled_conv(x, w, b, f=f)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_tiled_conv_relu_matches():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
    ref = jax.nn.relu(jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN))
    got = tiled_conv(x, w, None, f=2, relu=True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-5


def test_space_to_depth_round_trip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 2, 16, 8, 6), jnp.float32)
    assert jnp.allclose(depth_to_space(space_to_depth(x, 2), 2), x)
    assert space_to_depth(x, 2).shape == (3, 2, 8, 4, 24)
