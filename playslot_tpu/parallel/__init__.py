"""Multi-chip scaling: device mesh, sharding rules, distributed train steps."""

from playslot_tpu.parallel.mesh import make_mesh, batch_sharding, param_shardings  # noqa: F401
