"""Multi-chip / multi-host scaling layer (mesh, shard_map samplers,
jax.distributed glue).  See parallel/sharded.py for the sharding design."""
from .mesh import AXIS_M, AXIS_N, make_mesh  # noqa: F401
