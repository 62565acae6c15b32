"""
Streaming SAVi slot extraction: lax.scan over frames with the conv encode
INSIDE the recurrence body (VERDICT r4 item 5 — the non-decode HBM ceiling).

SAVi.__call__ batches the conv encode + slot-attention k/v projections over
ALL frames before the recurrence (models/savi.py:195-208) — the right call
at small batch (one big MXU-friendly conv launch), but at bench batch the
hoisted per-frame tensors dominate HBM: at B=192 x T=21, feats + k + v are
(4032, 4096, 128) bf16 each, ~12.6 GB of the ~16 GB chip — this, not the
decoder, is what OOMed the B>=256 sweep (docs/PERFORMANCE.md).

This module restructures the forward as a scan over FRAME GROUPS: each body
encodes `frame_chunk` frames (a (B*frame_chunk)-image conv launch — at bench
batch a single frame is already an MXU-saturating conv batch) and runs that
group's slot corrections; only the (B, T, S, slot_dim) slot history (a few
MB) persists. Encoder live memory falls from O(B*T*HW*D) to
O(B*frame_chunk*HW*D), lifting the batch ceiling entirely out of the
encoder. Numerics: same per-frame math in the same order — equal up to
float reassociation (parity-tested to 1e-5 on CPU,
tests/test_streaming_encode.py). On TPU the smaller conv batches tile
differently, and the recurrence amplifies those roundings with frame
index: measured worst-case slot drift at bench scale (f32/"highest",
21 frames) grows 2.5e-4 -> 3.9e-3 monotonically — reassociation noise,
not an ordering bug. Keep eval-metric paths on the unrolled forward;
this path is for throughput/memory-bound workloads (bench).

The frame-0 special case (`num_iterations_first` != `num_iterations`,
reference src/models/BlocksUtils/attention.py:99) is handled by running
frame 0 outside the scan — the scan body is homogeneous.

Usage (outside any Module, like engine/rollout.py):
    slots = streaming_slot_history(savi, variables, videos)
"""

import jax
import jax.numpy as jnp


def streaming_slot_history(savi, variables, videos, frame_chunk=1,
                           initializer_kwargs=None, rngs=None):
    """
    (B, T, H, W, C) videos -> (B, T, S, slot_dim) slot history, scanning the
    encode + correct recurrence over frame groups of `frame_chunk` frames.
    T - 1 must be divisible by frame_chunk (frame 0 runs outside the scan).
    """
    B, T = videos.shape[0], videos.shape[1]
    initializer_kwargs = initializer_kwargs or {}
    apply_kw = {"rngs": rngs} if rngs else {}

    def encode_kv(frames):
        """(N, H, W, C) -> per-frame slot-attention k/v."""
        feats = savi.apply(variables, frames, **apply_kw,
                           method=lambda m, f: m.encode(f))
        return savi.apply(variables, feats, **apply_kw,
                          method=lambda m, f: m.slot_attention.project_inputs(f))

    def correct_predict(k, v, predicted_slots, first):
        slots, _ = savi.apply(
            variables, k, v, predicted_slots, **apply_kw,
            method=lambda m, k_, v_, s: m.slot_attention.iterate(
                k_, v_, s, first=first))
        nxt = savi.apply(variables, slots, **apply_kw,
                         method=lambda m, s: m.predict_next(s))
        return slots, nxt

    # frame 0: `num_iterations_first` refinement iterations
    slots0 = savi.apply(
        variables, **apply_kw,
        method=lambda m: m.initial_slots(batch_size=B, **initializer_kwargs))
    k0, v0 = encode_kv(videos[:, 0])
    s0, predicted = correct_predict(k0, v0, slots0, first=True)
    if T == 1:
        return s0[:, None]

    rest = T - 1
    if rest % frame_chunk:
        raise ValueError(f"T-1={rest} not divisible by {frame_chunk=}")

    # (B, T-1, ...) -> (groups, B, frame_chunk, H, W, C)
    grouped = videos[:, 1:].reshape(B, rest // frame_chunk, frame_chunk,
                                    *videos.shape[2:]).swapaxes(0, 1)

    def body(predicted_slots, frames):
        # one (B*frame_chunk)-image conv launch for the group...
        k, v = encode_kv(frames.reshape(B * frame_chunk, *frames.shape[2:]))
        k = k.reshape(B, frame_chunk, *k.shape[1:])
        v = v.reshape(B, frame_chunk, *v.shape[1:])
        group_hist = []
        # ...then the group's sequential corrections (static unroll)
        for i in range(frame_chunk):
            slots, predicted_slots = correct_predict(
                k[:, i], v[:, i], predicted_slots, first=False)
            group_hist.append(slots)
        return predicted_slots, jnp.stack(group_hist, axis=1)

    _, hist = jax.lax.scan(body, predicted, grouped)
    # (groups, B, frame_chunk, S, D) -> (B, T-1, S, D)
    hist = hist.swapaxes(0, 1).reshape(B, rest, *hist.shape[3:])
    return jnp.concatenate([s0[:, None], hist], axis=1)
