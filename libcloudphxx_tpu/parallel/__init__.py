"""parallel — multi-chip domain decomposition over jax.sharding meshes.

TPU-native equivalent of the reference's MPI / multi-GPU distributed-memory
layer (SURVEY section 2.3): 1-D x-slab decomposition with ring (ppermute)
courant halos and super-droplet migration.
"""

from .decomp import (
    MIGRATING_ATTRS,
    build_multichip_step,
    local_config,
    make_mesh,
    migrate,
    replicate_state_for_mesh,
    sharded_async_step,
    sharded_sync_step,
)

__all__ = [
    "MIGRATING_ATTRS",
    "build_multichip_step",
    "local_config",
    "make_mesh",
    "migrate",
    "replicate_state_for_mesh",
    "sharded_async_step",
    "sharded_sync_step",
]
