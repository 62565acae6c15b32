#!/usr/bin/env python3
"""
One-off probe (round 3): is the encoder conv stack worth lane-filling?

docs/ENCODE_BREAKDOWN.json (B=128, bf16): conv stack = 26.3 ms net of the
549 ms step, vs ~9 ms FLOP speed-of-light — the encoder's 32-channel convs
underfill the MXU (docs/PERFORMANCE.md "~6 % MXU"). This probe A/Bs the
exact-rewrite space-to-depth stack (ops/experimental/s2d_conv.py, built round 3 for the
decoder where it tied) on the ENCODER shapes, plus the slot-attention k/v
hoist: LayerNorm + k/v projections computed per frame inside the recurrence
(21x) vs once, batched over all frames.

Decision input only — not a production path. Writes nothing.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import relay_overhead_ms, setup, timed

jax = setup()
import jax.numpy as jnp

from playslot_tpu.ops.experimental.s2d_conv import s2d_conv_block, space_to_depth, depth_to_space

M, H, W = 128 * 21, 64, 64
K = 5
CH = [3, 32, 32, 32, 32]
DT = jnp.bfloat16


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(M, H, W, CH[0]), DT)
    ws = [jnp.asarray(rng.randn(K, K, CH[i], CH[i + 1]) * 0.05, DT)
          for i in range(4)]
    bs = [jnp.asarray(rng.randn(CH[i + 1]) * 0.05, DT) for i in range(4)]

    ov = relay_overhead_ms()
    print(f"relay overhead: {ov:.1f} ms")

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def baseline(x, ws, bs):
        y = x
        for i in range(4):
            y = jax.lax.conv_general_dilated(
                y, ws[i], (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn)
            y = y + bs[i]
            if i < 3:
                y = jax.nn.relu(y)
        return jnp.sum(y.astype(jnp.float32))

    t_base = timed(baseline, x, ws, bs)
    print(f"baseline conv stack: {t_base:.1f} ms ({t_base - ov:.1f} net)")

    @jax.jit
    def s2d_stack(x, ws, bs):
        y = space_to_depth(x, 2)
        for i in range(4):
            y = s2d_conv_block(y, ws[i], bs[i], 2, relu=(i < 3))
        y = depth_to_space(y, 2)
        return jnp.sum(y.astype(jnp.float32))

    t_s2d = timed(s2d_stack, x, ws, bs)
    print(f"s2d f=2 conv stack:  {t_s2d:.1f} ms ({t_s2d - ov:.1f} net)")

    # exactness spot-check (f32)
    xf = x.astype(jnp.float32)
    wf = [w.astype(jnp.float32) for w in ws]
    bf = [b.astype(jnp.float32) for b in bs]

    def run_base(x, ws, bs):
        y = x
        for i in range(4):
            y = jax.lax.conv_general_dilated(
                y, ws[i], (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn)
            y = y + bs[i]
            if i < 3:
                y = jax.nn.relu(y)
        return y

    def run_s2d(x, ws, bs):
        y = space_to_depth(x, 2)
        for i in range(4):
            y = s2d_conv_block(y, ws[i], bs[i], 2, relu=(i < 3))
        return depth_to_space(y, 2)

    a = jax.jit(run_base)(xf[:8], wf, bf)
    b = jax.jit(run_s2d)(xf[:8], wf, bf)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    print(f"s2d rel err (f32): {err:.2e}")

    # ---- k/v hoist: LN + 2 projections, per-frame (21x) vs batched
    B, T, N, D = 128, 21, 64 * 64, 128
    feats = jnp.asarray(rng.rand(B, T, N, D), DT)
    wk = jnp.asarray(rng.randn(D, D) * 0.05, DT)
    wv = jnp.asarray(rng.randn(D, D) * 0.05, DT)

    def ln(z):
        m = jnp.mean(z.astype(jnp.float32), -1, keepdims=True)
        v = jnp.var(z.astype(jnp.float32), -1, keepdims=True)
        return ((z - m) / jnp.sqrt(v + 1e-5)).astype(z.dtype)

    @jax.jit
    def per_frame(feats, wk, wv):
        acc = 0.0
        for t in range(T):
            z = ln(feats[:, t])
            acc = acc + jnp.sum((z @ wk).astype(jnp.float32)) + jnp.sum(
                (z @ wv).astype(jnp.float32))
        return acc

    @jax.jit
    def hoisted(feats, wk, wv):
        z = ln(feats.reshape(B * T, N, D))
        return jnp.sum((z @ wk).astype(jnp.float32)) + jnp.sum(
            (z @ wv).astype(jnp.float32))

    t_pf = timed(per_frame, feats, wk, wv)
    t_h = timed(hoisted, feats, wk, wv)
    print(f"LN+k/v per-frame (21x): {t_pf:.1f} ms ({t_pf - ov:.1f} net)")
    print(f"LN+k/v hoisted:         {t_h:.1f} ms ({t_h - ov:.1f} net)")


if __name__ == "__main__":
    main()
