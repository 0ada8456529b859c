"""Worker process for the multi-host simulation test (NOT a pytest module).

Usage: python multihost_worker.py <pid> <nprocs> <port>
Run with JAX_PLATFORMS=cpu and PALLAS_AXON_POOL_IPS unset. Each process
contributes 2 virtual CPU devices; together they form the 'cluster' exactly
as the reference simulates multi-node with mpiexec -n 2
(/root/reference/tests/CMakeLists.txt:67-74).
"""

import sys

import numpy as np


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from circulantpreconditioner_tpu.parallel.multihost import (
        gather_to_host0,
        global_device_mesh,
        init_multihost,
    )

    init_multihost(f"localhost:{port}", nprocs, pid, local_device_count=2)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == 2 * nprocs, jax.devices()

    from circulantpreconditioner_tpu.ops.circulant import (
        CirculantTransportOperator,
        np_eigenvalue_diagonal,
    )
    from circulantpreconditioner_tpu.parallel import SlabCirculantSolver

    shape = (8, 8, 6)
    lambdas = (0.4, -0.3, 5.0)
    mesh = global_device_mesh()
    op = CirculantTransportOperator.create(shape, lambdas, jnp.float64)
    solver = SlabCirculantSolver.from_operator(op, mesh)

    # same deterministic global data on every process
    b = np.random.default_rng(0).random(shape)
    gb = jax.make_array_from_callback(
        shape, NamedSharding(mesh, P("shard", None, None)), lambda idx: b[idx]
    )
    x = solver.solve(gb)
    jax.block_until_ready(x)

    x0 = gather_to_host0(x)  # VecScatterCreateToZero analog
    if jax.process_index() == 0:
        lam = np_eigenvalue_diagonal(shape, lambdas, rfft=True)
        x_ref = np.fft.irfftn(np.fft.rfftn(b) / lam, s=shape)
        err = np.abs(x0 - x_ref).max()
        assert err < 1e-12, f"multihost solve mismatch: {err}"
        print(f"OK process0 err={err:.3e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
