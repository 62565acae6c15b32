"""Compiled rollout drivers — pure functions over `module.apply`."""

from playslot_tpu.engine.rollout import scan_rollout, posterior_rollout  # noqa: F401
