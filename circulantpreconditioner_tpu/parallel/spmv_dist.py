"""Row-partitioned distributed SpMV over a device mesh.

TPU-native replacement for PETSc's MPI row-block Mat/Vec layout (MatCreateAIJ
with PETSC_DECIDE + internal VecScatter halo exchange, used in every mpi
driver, e.g. WaveSystem_..._impl_mpi.cxx:63-85).

Layout: rows are split into P contiguous blocks (padded to equal size); each
device holds its block in padded-ELL form (rows_per_shard, k). The source
vector is sharded the same way; inside shard_map each device all_gathers the
full vector (the FV operators here have bounded bandwidth, but a general
gather keeps round 1 simple and correct — the halo-minimal ppermute exchange
is an optimization tracked for the structured partitioning) and produces its
row block locally. Krylov reductions over such sharded vectors lower to
psum collectives automatically under jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from circulantpreconditioner_tpu.ops.csr import CSRMatrix


class ShardedELLMatrix:
    """Row-sharded padded-ELL operator: y = A x with x, y sharded vectors."""

    def __init__(self, A: CSRMatrix, mesh: Mesh, axis: str = "shard"):
        self.mesh = mesh
        self.axis = axis
        n, m = A.shape
        Pn = mesh.shape[axis]
        self.n = n
        self.n_padded = ((n + Pn - 1) // Pn) * Pn
        ell = A.to_ell()
        cols = np.asarray(ell.cols)
        vals = np.asarray(ell.vals)
        pad = self.n_padded - n
        if pad:
            cols = np.concatenate([cols, np.zeros((pad, cols.shape[1]), cols.dtype)])
            vals = np.concatenate([vals, np.zeros((pad, vals.shape[1]), vals.dtype)])
        row_sharding = NamedSharding(mesh, P(axis, None))
        self.cols = jax.device_put(cols, row_sharding)
        self.vals = jax.device_put(vals, row_sharding)
        self.vec_sharding = NamedSharding(mesh, P(axis))
        axis_name = axis

        def local_spmv(cols_loc, vals_loc, x_loc):
            x_full = jax.lax.all_gather(x_loc, axis_name, tiled=True)
            return jnp.sum(vals_loc * x_full[cols_loc], axis=1)

        self._spmv = jax.jit(
            jax.shard_map(
                local_spmv,
                mesh=mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis)),
                out_specs=P(axis),
            )
        )

    def shard_vector(self, x) -> jax.Array:
        """Pad a global length-n vector to n_padded and shard it."""
        x = np.asarray(x)
        if x.shape[0] != self.n_padded:
            x = np.concatenate([x, np.zeros(self.n_padded - x.shape[0], x.dtype)])
        return jax.device_put(x, self.vec_sharding)

    def unshard_vector(self, x: jax.Array) -> np.ndarray:
        return np.asarray(x)[: self.n]

    def matvec(self, x: jax.Array) -> jax.Array:
        """x: sharded padded vector → sharded padded result. Padded tail rows
        are all-zero in ELL, so they stay zero and never pollute dots."""
        return self._spmv(self.cols, self.vals, x)

    def __matmul__(self, x):
        return self.matvec(x)
