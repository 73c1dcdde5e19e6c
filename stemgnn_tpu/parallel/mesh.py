"""Device mesh + sharding specs.

The reference has no distributed backend at all (SURVEY.md section 5:
single process, single device). This subsystem is designed TPU-first:

- mesh axes ('data', 'graph'): 'data' is batch data-parallelism; 'graph'
  partitions the node axis N of the learned latent graph (the model's
  analogue of tensor parallelism — the N x N attention/Laplacian matmuls
  are the quadratic terms, SURVEY.md section 3.3).
- sharding is expressed as jit-time constraints (GSPMD inserts the
  all-gathers/psums over ICI); the explicit shard_map + ppermute ring
  variant for the 100k-node stretch config lives in parallel/ring.py.
- multi-host: call jax.distributed.initialize() before make_mesh(); the
  mesh then spans all hosts' devices and the same program runs SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def make_mesh(
    data_axis: int = 1,
    graph_axis: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ('data', 'graph') mesh over `data_axis * graph_axis` devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = data_axis * graph_axis
    if n > len(devices):
        raise ValueError(
            f"mesh {data_axis}x{graph_axis} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.array(devices[:n]).reshape(data_axis, graph_axis)
    return Mesh(dev_array, (DATA_AXIS, GRAPH_AXIS))


def auto_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Split n devices into (data, graph) — graph axis gets the larger
    factor (the N^2 terms dominate scaling; SURVEY.md section 3.3)."""
    data = 1
    graph = n_devices
    # prefer a 2 x (n/2) split when possible so both axes are exercised
    if n_devices % 2 == 0 and n_devices > 2:
        data, graph = 2, n_devices // 2
    return data, graph


def make_globalizer(mesh: Optional[Mesh]):
    """Multi-host input adapter: host-replicated numpy/local arrays ->
    global jax.Arrays on the mesh.

    In multi-process SPMD every process runs the same program on its local
    devices; jit inputs must be GLOBAL arrays (a process-local array with a
    cross-process sharding is an error). All engine inputs (data, window
    indices, rng keys) are deterministic from the seed, hence identical on
    every process — so each process can materialize its addressable shards
    from its own host copy. Returns None single-process (no wrapping; the
    zero-copy fast path stays).
    """
    if mesh is None or jax.process_count() == 1:
        return None

    def globalize(spec: P, x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
        )

    return globalize


def constrain(x, mesh: Optional[Mesh], spec: P):
    """with_sharding_constraint that no-ops off-mesh (single device)."""
    if mesh is None or mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
