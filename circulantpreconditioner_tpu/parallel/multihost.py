"""Multi-host (multi-process) execution helpers.

The reference scales across nodes with MPI ranks (mpiexec -n 2/4,
tests/CMakeLists.txt:67-74; rank-0 assembly + VecScatter gather). The JAX
analog is multi-controller SPMD: each process calls
`jax.distributed.initialize`, sees its local devices plus the global mesh,
and the same jitted collectives span ICI within a host and DCN between
hosts. These helpers wrap initialization and the VecScatterCreateToZero
analog (gather-to-host-0 for I/O).

Multi-node is simulated in tests exactly the way the reference simulates it
— multiple processes on one machine (tests/test_multihost.py spawns worker
processes over localhost with CPU devices).
"""

from __future__ import annotations

import numpy as np

import jax


def init_multihost(coordinator: str, num_processes: int, process_id: int,
                   local_device_count: int | None = None) -> None:
    """Join the multi-process JAX runtime (MPI_Init analog). For CPU-based
    simulation set local_device_count to fan each process into several
    virtual devices (the xla_force_host_platform_device_count knob)."""
    if local_device_count is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_device_mesh(axis: str = "shard") -> "jax.sharding.Mesh":
    """1D mesh over ALL processes' devices (PETSC_COMM_WORLD analog)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def gather_to_host0(x: jax.Array) -> np.ndarray | None:
    """VecScatterCreateToZero analog: the full array on process 0 (None on
    other processes). Works for any sharded global jax.Array."""
    from jax.experimental import multihost_utils

    full = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(full) if jax.process_index() == 0 else None
