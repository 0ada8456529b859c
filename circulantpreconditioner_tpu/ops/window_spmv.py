"""Clustered-window dense SpMV — the TPU answer to UNSTRUCTURED meshes.

The reference's PETSc MatMult consumes CSR directly; on TPU a per-element
gather runs at ~0.13 Gnnz/s (measured, PROFILE.md) because XLA lowers it to
scalar-core loads. The FVCA6 tetra fixtures (half the reference's benchmark
ladder, /root/reference/meshes/README.md:22-33) have no grid topology, so the
gather-free stencil paths don't apply. This module re-expresses the assembled
operator so the hardware sees only two fast primitives:

1. Renumber cells bandwidth-tight (host, reverse Cuthill–McKee — done by
   mesh/topology.renumber_bandwidth at load). Consecutive cells then have
   overlapping neighbourhoods.
2. Group G consecutive block rows into a CLUSTER and `unit` consecutive
   block rows into a source UNIT. Per cluster, collect the exact UNION of
   source units its rows touch (welded 3DKershawTetra2 at G=8/unit=2:
   ~28 units max).
3. Store the cluster's rows as ONE dense (G·b, U·unit·b) window matrix W;
   the sparse column structure becomes static zero entries.
4. Apply: gather the U source units per cluster (a row gather of wider
   rows — ~50-100× fewer gather descriptors than element gathers), then
   one batched GEMV
       y[c] = W[c] @ window[c]
   that the MXU/VPU streams at HBM bandwidth.

`unit` trades gather descriptors against window padding: measured on the
v5e at KershawTetra2 scale, unit=1 (4-wide rows) 1.7 ms, unit=2 (8-wide
rows, 17% more W traffic) 1.06 ms ⇒ ~7 Gnnz/s vs 0.13 for element-gather
ELL (~55×). The dense-window "waste" (~15× the true nnz) buys the win
because every byte streams.

Reference parity: this is MatMult of the implicit/explicit drivers on the
tetra fixture families (tests/WaveSystem_SphericalExplosion_impl_seq.cxx:108
KSPSolve inner SpMV; meshes/README.md:30-33 ladder).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class WindowedBlockOperator:
    """y = A x for a block matrix re-laid as per-cluster dense windows.

    x is the flat cell-major vector ((n_cells·b,), cell-interleaved — the
    same layout BSRMatrix.matvec consumes, so this is a drop-in)."""

    n_brows: int
    b: int
    G: int
    unit: int
    src: jax.Array  # (ncl, U) int32 — source UNIT ids per cluster
    W: jax.Array    # (ncl, G·b, U·unit·b) dense window matrices

    def tree_flatten(self):
        return (self.src, self.W), (self.n_brows, self.b, self.G, self.unit)

    @classmethod
    def tree_unflatten(cls, aux, children):
        src, W = children
        return cls(aux[0], aux[1], aux[2], aux[3], src, W)

    @property
    def shape(self) -> tuple[int, int]:
        n = self.n_brows * self.b
        return (n, n)

    @property
    def window_bytes(self) -> int:
        return int(np.prod(self.W.shape)) * self.W.dtype.itemsize

    @classmethod
    def from_block_coo(cls, n_brows: int, brows, bcols, blocks,
                       G: int = 8, unit: int | None = None, dtype=jnp.float32):
        """Build from block-COO (duplicates summed). Host-side, O(nnzb).

        unit=None picks the smallest unit giving ≥ 8 scalars (32 B) per
        gathered row — the descriptor-vs-padding sweet spot measured for
        b=4 (unit=2); scalar operators (b=1) get unit=8 by the same rule."""
        brows = np.asarray(brows, dtype=np.int64)
        bcols = np.asarray(bcols, dtype=np.int64)
        blocks = np.asarray(blocks, dtype=np.float64)
        b = blocks.shape[-1]
        if unit is None:
            unit = max(1, -(-8 // b))
        ncl = -(-n_brows // G)

        order = np.argsort(brows // G, kind="stable")
        brows, bcols, blocks = brows[order], bcols[order], blocks[order]
        cl = brows // G
        ucols = bcols // unit
        starts = np.searchsorted(cl, np.arange(ncl + 1))

        unions = []
        U = 1
        for c in range(ncl):
            u = np.unique(ucols[starts[c]:starts[c + 1]])
            unions.append(u)
            U = max(U, len(u))

        src = np.zeros((ncl, U), dtype=np.int32)
        W = np.zeros((ncl, G * b, U * unit * b), dtype=np.float64)
        for c in range(ncl):
            u = unions[c]
            src[c, :len(u)] = u
            # pad slots repeat u[0]; their W entries stay zero so the
            # duplicated gather contributes nothing
            if len(u):
                src[c, len(u):] = u[0]
            s, e = starts[c], starts[c + 1]
            r = (brows[s:e] - c * G) * b  # local row offset
            k = (np.searchsorted(u, ucols[s:e]) * unit
                 + bcols[s:e] % unit) * b
            for i in range(b):
                for j in range(b):
                    np.add.at(W[c], (r + i, k + j), blocks[s:e, i, j])
        return cls(n_brows, b, G, unit, jnp.asarray(src),
                   jnp.asarray(W, dtype=dtype))

    @classmethod
    def from_bsr(cls, A, G: int = 8, unit: int | None = None, dtype=None):
        return cls.from_block_coo(
            A.n_brows, np.asarray(A.brow_ids), np.asarray(A.indices),
            np.asarray(A.blocks), G=G, unit=unit,
            dtype=dtype or A.blocks.dtype)

    @classmethod
    def from_csr(cls, A, G: int = 8, unit: int | None = None, dtype=None):
        """Scalar (b=1) variant from a CSRMatrix."""
        sp = A.to_scipy().tocoo()
        return cls.from_block_coo(A.shape[0], sp.row, sp.col,
                                  sp.data.reshape(-1, 1, 1), G=G, unit=unit,
                                  dtype=dtype or A.data.dtype)

    @jax.jit
    def matvec(self, x: jax.Array) -> jax.Array:
        n = self.n_brows * self.b
        ncl = self.src.shape[0]
        nu = -(-self.n_brows // self.unit)
        pad = nu * self.unit * self.b - n
        xv = (jnp.pad(x, (0, pad)) if pad else x).reshape(nu, self.unit * self.b)
        g = xv[self.src]                         # (ncl, U, unit·b) row gather
        win = g.reshape(ncl, -1)
        y = jnp.einsum("cij,cj->ci", self.W, win)
        # output rows are padded to whole clusters; trailing pad rows of W
        # are zero so the slice just drops them
        return y.reshape(-1)[:n]

    def __call__(self, x):
        return self.matvec(x)

    def matvec_partial(self) -> jax.tree_util.Partial:
        return jax.tree_util.Partial(WindowedBlockOperator.matvec, self)
