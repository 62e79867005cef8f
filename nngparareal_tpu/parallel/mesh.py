"""Device-mesh execution of the time-slice axis.

The reference distributes the per-iteration fine solves over an MPI
master/worker pool (reference parareal.py:310-315, new_lib.py:939-945,
SLURM recipes in Burgers.py:130-185). The TPU-native equivalent is a
single SPMD program: the (N, dim) slice-state array is sharded over a 1-D
``jax.sharding.Mesh`` axis and each device integrates its own contiguous
block of slices; the per-iteration "gather of slice endpoints" is the
implicit all-gather XLA inserts when the (tiny) result feeds the
replicated sequential sweep. No pickling, no futures, no collectives in
user code.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exports shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )

SLICE_AXIS = "slices"


def make_mesh(n_devices=None, axis_name=SLICE_AXIS, devices=None):
    """1-D mesh over the time-slice axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    return Mesh(np.array(devices), (axis_name,))


def slice_sharding(mesh, axis_name=SLICE_AXIS):
    return NamedSharding(mesh, P(axis_name))


def shard_fine_fanout(fine_batch_fn, mesh, axis_name=SLICE_AXIS):
    """Wrap a vmapped fine-solve ``(t0s, t1s, U) -> U'`` in shard_map.

    Each device integrates its local block of slices; results shard the
    same way. The batch size must be divisible by the mesh size — the
    driver pads the slice axis if necessary.
    """
    sharded = shard_map(
        fine_batch_fn,
        mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    return jax.jit(sharded)
