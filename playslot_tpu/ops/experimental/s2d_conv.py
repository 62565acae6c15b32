"""
Space-to-depth convolution — MXU lane-filling reformulation of the decoder's
stride-1 SAME convs (SURVEY.md §2.4 item 2; reference decoder
`/root/reference/src/models/EncodersDecoders/decoders.py:45-118`).

A k×k stride-1 conv with C output channels contracts (k·k·Cin) against only
C output lanes; with C=64 that fills half of the MXU's 128 lanes and caps
utilization at 50 % — the "channel-imposed ceiling" in docs/PERFORMANCE.md.
Re-gridding to the f×f space-to-depth representation turns the same conv
into a ks×ks conv over f²·C channels (ks = 2·ceil((k//2)/f)+1 via
u = f·P + c − a): output lanes f²·C fill the MXU completely for C=64, f=2.
The price is redundant zero taps — FLOPs grow by (ks·f/k)² (1.44× for
k=5, f=2) — bought back ~2× over by the lane fill.

The mapping is EXACT (same taps, same summands, float reassociation only):
  y[f·I+a, f·J+b, o] = Σ_{u,v} w[u,v,i,o] · x[f·I+a+u, f·J+b+v, i]
with u = f·P + c − a:  W2[P, Q, (c,d,i), (a,b,o)] = w[u, v, i, o], zero
when |u| or |v| exceeds k//2 — realized by zero-padding w and gathering so
out-of-range taps index the zero halo.

Whole stacks run in s2d space (ReLU and bias are phase-oblivious; the bias
is tiled per phase), with ONE s2d at entry and ONE d2s at exit.
"""

import numpy as np

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x, f):
    """(..., H, W, C) -> (..., H/f, W/f, f*f*C), phase-major channel order."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // f, f, W // f, f, C)
    perm = list(range(len(lead))) + [len(lead), len(lead) + 2,
                                     len(lead) + 1, len(lead) + 3,
                                     len(lead) + 4]
    return x.transpose(*perm).reshape(*lead, H // f, W // f, f * f * C)


def depth_to_space(y, f):
    """Inverse of space_to_depth."""
    *lead, Hf, Wf, FC = y.shape
    C = FC // (f * f)
    y = y.reshape(*lead, Hf, Wf, f, f, C)
    perm = list(range(len(lead))) + [len(lead), len(lead) + 2,
                                     len(lead) + 1, len(lead) + 3,
                                     len(lead) + 4]
    return y.transpose(*perm).reshape(*lead, Hf * f, Wf * f, C)


def s2d_kernel(w, f):
    """(k, k, Cin, Cout) -> (ks, ks, f*f*Cin, f*f*Cout) s2d-space kernel."""
    k = w.shape[0]
    pad = k // 2
    pmax = (pad + f - 1) // f
    ks = 2 * pmax + 1
    wp = jnp.pad(w, ((f, f), (f, f), (0, 0), (0, 0)))
    # U[P, c, a] = f*P + c - a, shifted into the padded array; indices whose
    # tap is out of the k×k support land in the zero halo.
    p = np.arange(-pmax, pmax + 1)
    c = np.arange(f)
    u = (f * p[:, None, None] + c[None, :, None] - c[None, None, :]
         + pad + f)
    g = wp[u[:, :, :, None, None, None], u[None, None, None, :, :, :]]
    # (P, c, a, Q, d, b, i, o) -> (P, Q, c, d, i, a, b, o)
    g = g.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    cin, cout = w.shape[2], w.shape[3]
    return g.reshape(ks, ks, f * f * cin, f * f * cout)


def s2d_conv_block(x_s2d, w, bias, f, relu=True):
    """One conv(+bias)(+ReLU) applied entirely in s2d space.

    x_s2d: (M, H/f, W/f, f*f*Cin); w: full-res (k, k, Cin, Cout); bias (Cout,).
    Returns (M, H/f, W/f, f*f*Cout).
    """
    wk = s2d_kernel(w.astype(x_s2d.dtype), f)
    pp = wk.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x_s2d, wk, (1, 1), [(pp, pp), (pp, pp)], dimension_numbers=_DN)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), f * f)
    return jax.nn.relu(y) if relu else y


def s2d_conv(x, w, bias=None, f=2, relu=False):
    """Drop-in stride-1 SAME conv: (M, H, W, Cin) -> (M, H, W, Cout)."""
    y = s2d_conv_block(space_to_depth(x, f), w, bias, f, relu=relu)
    return depth_to_space(y, f)


def tiled_kernel(w, f):
    """(k, k, Cin, Cout) -> (ws, ws, Cin, f*f*Cout), ws = f + 2*(k//2).

    Output-tiled reformulation: one stride-f conv produces all f*f output
    phases of a stride-1 SAME conv at once.  Cheaper than the s2d-input
    mapping for small kernels — FLOPs grow by (ws/k)^2 (1.78x for k=3, f=2
    vs 4x for s2d) while output lanes grow f^2-fold.  Built for the decoder
    final conv (Cout=4 fills 3% of MXU lanes; reference decoders.py:45-118).
    """
    k = w.shape[0]
    p = k // 2
    ws = f + 2 * p
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((f, f), (f, f), (0, 0), (0, 0)))
    m = np.arange(ws)
    a = np.arange(f)
    # tap index u' = m - a, valid in [0, k); out-of-range lands in the halo
    u = m[:, None] - a[None, :] + f  # (ws, f)
    g = wp[u[:, :, None, None], u[None, None, :, :]]  # (ws, f, ws, f, i, o)
    g = g.transpose(0, 2, 4, 1, 3, 5)  # (ws, ws, i, a, b, o) — d2s phase-major
    return g.reshape(ws, ws, cin, f * f * cout)


def tiled_conv(x, w, bias=None, f=2, relu=False):
    """Drop-in stride-1 SAME conv via one stride-f conv + depth_to_space.

    Exact (same taps/summands, float reassociation only).  H, W must be
    divisible by f.  x: (M, H, W, Cin); w: (k, k, Cin, Cout).
    """
    p = w.shape[0] // 2
    wk = tiled_kernel(w.astype(x.dtype), f)
    y = jax.lax.conv_general_dilated(
        x, wk, (f, f), [(p, p), (p, p)], dimension_numbers=_DN)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), f * f)
    if relu:
        y = jax.nn.relu(y)
    return depth_to_space(y, f)
