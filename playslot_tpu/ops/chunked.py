"""
Shared chunked-application helper for the decode memory lever.

The eval/bench/train paths all divide the decode working set by rendering
the batch in sequential chunks through ONE lax.map body (same compiled
program per chunk, so numerics are exactly the unchunked result). This
helper is the single implementation behind SAVi.decode_fast_chunked, the
trainers' `training.decode_chunks` knob, and the eval/bench
PLAYSLOT_*_DECODE_CHUNKS env knobs — keeping the splitting, divisibility,
and rematerialization semantics in one place.
"""

import jax


def chunked_apply(fn, x, num_chunks=1, remat=False):
    """
    Apply ``fn`` to ``x`` split into ``num_chunks`` pieces along axis 0,
    sequentially via ``lax.map``, and re-concatenate every output leaf.

    - ``remat=True`` wraps ``fn`` in ``jax.checkpoint`` (applied in the
      unchunked fallback too, so ``training.remat`` behaves the same at
      ``decode_chunks: 1``).
    - ``num_chunks <= 1`` or a leading dim smaller than ``num_chunks``
      falls back to a single full-batch call — chunking a batch of 1 (the
      stochastic eval default) cannot divide anything, so the knob is a
      no-op there rather than an error.
    - Otherwise the leading dim must divide evenly (training loaders drop
      ragged batches; eval callers fold sample axes into the batch first).

    ``fn`` may return any pytree of arrays as long as every leaf keeps the
    per-example leading dim (true of all decode outputs); leaves are
    re-assembled to the full leading dim.
    """
    if remat:
        fn = jax.checkpoint(fn)
    batch = x.shape[0]
    if num_chunks <= 1 or batch < num_chunks:
        return fn(x)
    if batch % num_chunks:
        raise ValueError(
            f"batch {batch} not divisible by chunks {num_chunks}")
    split = x.reshape(num_chunks, batch // num_chunks, *x.shape[1:])
    out = jax.lax.map(fn, split)
    return jax.tree.map(lambda a: a.reshape(batch, *a.shape[2:]), out)


def chunked_apply_reduce(fn, x, num_chunks, reduce_fn):
    """
    Chunked apply with the epilogue FUSED into the chunk body: each chunk
    computes ``reduce_fn(fn(chunk))`` and only the reduced leaves are kept
    (stacked along a leading chunk axis) — outputs the epilogue consumes
    and discards (e.g. per-slot recons/masks feeding only a composite, or
    full frames feeding only a checksum) are never written back to HBM at
    full batch size. The caller folds the per-chunk leaves (sum/concat/...).

    Equivalent by construction to ``reduce_fn`` applied per-chunk after
    ``chunked_apply`` — the fusion moves bandwidth, not math.
    """
    def body(chunk):
        return reduce_fn(fn(chunk))
    batch = x.shape[0]
    if num_chunks <= 1 or batch < num_chunks:
        return jax.tree.map(lambda a: a[None], body(x))
    if batch % num_chunks:
        raise ValueError(
            f"batch {batch} not divisible by chunks {num_chunks}")
    split = x.reshape(num_chunks, batch // num_chunks, *x.shape[1:])
    return jax.lax.map(body, split)
