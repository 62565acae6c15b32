"""Datasets and input pipeline (host-side numpy producers feeding device batches)."""

from playslot_tpu.data.loader import load_data, build_data_loader, unwrap_batch_data  # noqa: F401
