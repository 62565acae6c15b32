"""Pallas kernel parity vs XLA fallbacks (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from playslot_tpu.ops.slot_attention import slot_attention_iteration
from playslot_tpu.ops.vq import nearest_codeword
from playslot_tpu.ops.masks import build_slot_causal_mask
from playslot_tpu.ops.pallas.slot_attention_kernel import (
    slot_attention_iteration_pallas)
from playslot_tpu.ops.pallas.block_causal_attention_kernel import (
    block_causal_attention_pallas)
from playslot_tpu.ops.pallas.vq_kernel import nearest_codeword_pallas


def test_slot_attention_kernel_parity():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(3, 8, 32), jnp.float32)
    k = jnp.asarray(rng.randn(3, 64, 32), jnp.float32)
    v = jnp.asarray(rng.randn(3, 64, 32), jnp.float32)
    upd_ref, attn_ref = slot_attention_iteration(q, k, v)
    upd, attn = slot_attention_iteration_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(upd), np.asarray(upd_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                               atol=1e-5, rtol=1e-5)


def test_block_causal_attention_kernel_parity():
    rng = np.random.RandomState(1)
    S, F, Dh = 4, 3, 16
    T = S * F
    q = jnp.asarray(rng.randn(2, T, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(2, T, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, Dh), jnp.float32)

    # XLA reference with the materialized mask
    scale = Dh ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    mask = build_slot_causal_mask(F, S)
    logits = jnp.where(mask[None] == 0, -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bqk,bkd->bqd", attn, v)

    out = block_causal_attention_pallas(q, k, v, num_slots=S, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_vq_kernel_parity():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(5, 7, 16), jnp.float32)
    cb = jnp.asarray(rng.randn(12, 16), jnp.float32)
    zq_ref, idx_ref = nearest_codeword(z, cb)
    zq, idx = nearest_codeword_pallas(z, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref),
                               atol=1e-5, rtol=1e-5)


def test_decoder_stack_kernel_parity():
    from playslot_tpu.ops.experimental.decoder_stack_kernel import decoder_stack_pallas
    rng = np.random.RandomState(0)
    M, H, W, C, CO, L = 2, 16, 16, 8, 4, 2
    x = jnp.asarray(rng.randn(M, H, W, C).astype(np.float32)) * 0.3
    ws = jnp.asarray(rng.randn(L, 5, 5, C, C).astype(np.float32)) * 0.1
    bs = jnp.asarray(rng.randn(L, C).astype(np.float32)) * 0.1
    wf = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32)) * 0.1
    bf = jnp.asarray(rng.randn(CO).astype(np.float32)) * 0.1

    dn = ("NHWC", "HWIO", "NHWC")
    y = x
    for l in range(L):
        y = jax.lax.conv_general_dilated(y, ws[l], (1, 1), [(2, 2), (2, 2)],
                                         dimension_numbers=dn) + bs[l]
        y = jnp.maximum(y, 0)
    ref = jax.lax.conv_general_dilated(y, wf, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=dn) + bf

    out = decoder_stack_pallas(x, ws, bs, wf, bf, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_decoder_stack_kernel_v2_parity():
    from playslot_tpu.ops.experimental.decoder_stack_kernel_v2 import (
        decoder_stack_pallas_v2)
    rng = np.random.RandomState(1)
    M, H, W, C, CO, L = 2, 16, 16, 8, 4, 2
    x = jnp.asarray(rng.randn(M, H, W, C).astype(np.float32)) * 0.3
    ws = jnp.asarray(rng.randn(L, 5, 5, C, C).astype(np.float32)) * 0.1
    bs = jnp.asarray(rng.randn(L, C).astype(np.float32)) * 0.1
    wf = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32)) * 0.1
    bf = jnp.asarray(rng.randn(CO).astype(np.float32)) * 0.1

    dn = ("NHWC", "HWIO", "NHWC")
    y = x
    for l in range(L):
        y = jax.lax.conv_general_dilated(y, ws[l], (1, 1), [(2, 2), (2, 2)],
                                         dimension_numbers=dn) + bs[l]
        y = jnp.maximum(y, 0)
    ref = jax.lax.conv_general_dilated(y, wf, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=dn) + bf
    out = decoder_stack_pallas_v2(x, ws, bs, wf, bf, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_decoder_stack_kernel_v3_parity():
    from playslot_tpu.ops.experimental.decoder_stack_kernel_v3 import (
        decoder_stack_pallas_v3)
    rng = np.random.RandomState(2)
    M, H, W, C, CO, L = 2, 16, 16, 8, 4, 2
    x = jnp.asarray(rng.randn(M, H, W, C).astype(np.float32)) * 0.3
    ws = jnp.asarray(rng.randn(L, 5, 5, C, C).astype(np.float32)) * 0.1
    bs = jnp.asarray(rng.randn(L, C).astype(np.float32)) * 0.1
    wf = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32)) * 0.1
    bf = jnp.asarray(rng.randn(CO).astype(np.float32)) * 0.1

    dn = ("NHWC", "HWIO", "NHWC")
    y = x
    for l in range(L):
        y = jax.lax.conv_general_dilated(y, ws[l], (1, 1), [(2, 2), (2, 2)],
                                         dimension_numbers=dn) + bs[l]
        y = jnp.maximum(y, 0)
    ref = jax.lax.conv_general_dilated(y, wf, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=dn) + bf
    for strip in (4, 8):
        out = decoder_stack_pallas_v3(x, ws, bs, wf, bf, strip=strip,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_kernels_bf16_under_highest_precision_context():
    """An ambient jax.default_matmul_precision("highest") must not poison
    in-kernel dots: Mosaic rejects fp32 contract precision on bf16 operands
    ("Bad lhs type") — every kernel pins Precision.DEFAULT internally.
    Interpret mode checks the math is unchanged under the context; the
    compile-path regression is covered by any bf16 model eval on hardware."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from playslot_tpu.ops.pallas.slot_attention_kernel import (
        slot_attention_iteration_pallas)

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 4, 32), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, 32), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 64, 32), jnp.bfloat16)
    upd0, attn0 = slot_attention_iteration_pallas(q, k, v, interpret=True)
    with jax.default_matmul_precision("highest"):
        upd1, attn1 = slot_attention_iteration_pallas(q, k, v, interpret=True)
    np.testing.assert_array_equal(np.asarray(upd0, np.float32),
                                  np.asarray(upd1, np.float32))
    np.testing.assert_array_equal(np.asarray(attn0), np.asarray(attn1))
