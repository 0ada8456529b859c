"""Slab-sharded distributed varying-stencil SpMV with ppermute halo exchange.

The distributed analog of ops/stencil.VaryingStencilOperator: the grid's z
axis is sharded over the device mesh; the only communication per matvec is
ONE plane of state per direction, exchanged with ring `ppermute` over ICI —
the VecScatter halo pattern of the reference's PETSc MatMult
(SURVEY.md §2.6) realized for the topologically-structured FVCA6 meshes.

Halos always wrap around the ring: on periodic meshes that is the correct
neighbor; on wall/Neumann meshes the wrapped plane is multiplied by the
all-zero boundary coefficient layer (same argument as the single-device
flat layout), so one code path serves both.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SlabStencilOperator:
    """y = A x over a z-slab-sharded grid. Built from a single-device
    VaryingStencilOperator (any layout — coefficients are re-laid out to
    grid_last (m, m, nz, ny, nx) and sharded on z)."""

    def __init__(self, V, mesh: Mesh, axis: str = "shard"):
        from circulantpreconditioner_tpu.ops.stencil import VaryingStencilOperator

        assert isinstance(V, VaryingStencilOperator)
        nz, ny, nx = V.shape_zyx
        self.Pn = mesh.shape[axis]
        if nz % self.Pn:
            raise ValueError(f"nz={nz} must divide over {self.Pn} devices")
        self.shape_zyx = V.shape_zyx
        self.m = V.m
        self.mesh = mesh
        self.axis = axis

        offsets, coefs = self._grid_last(V)
        c_sharding = NamedSharding(mesh, P(None, None, axis, None, None))
        self.coefs = tuple(jax.device_put(C, c_sharding) for C in coefs)
        self.x_sharding = NamedSharding(mesh, P(axis, None, None, None))

        m = self.m
        axis_name = axis
        Pn = self.Pn
        fwd = [(i, (i + 1) % Pn) for i in range(Pn)]
        bwd = [(i, (i - 1) % Pn) for i in range(Pn)]

        def local_matvec(x_loc, *coefs_loc):
            # x_loc (nz/P, ny, nx, m) → (m, nz/P+2, ny, nx) with halo planes
            gt = jnp.moveaxis(x_loc, -1, 0)
            lo = jax.lax.ppermute(gt[:, -1:], axis_name, fwd)  # prev rank's top
            hi = jax.lax.ppermute(gt[:, :1], axis_name, bwd)  # next rank's bottom
            xp = jnp.concatenate([lo, gt, hi], axis=1)
            nzP = gt.shape[1]
            ys = [jnp.zeros(gt.shape[1:], x_loc.dtype) for _ in range(m)]
            for off, C in zip(offsets, coefs_loc):
                dz, dy, dx = off
                nbr = xp[:, 1 + dz: 1 + dz + nzP]
                if dy:
                    nbr = jnp.roll(nbr, -dy, axis=2)
                if dx:
                    nbr = jnp.roll(nbr, -dx, axis=3)
                for i in range(m):
                    acc = ys[i]
                    for j in range(m):
                        acc = acc + C[i, j] * nbr[j]
                    ys[i] = acc
            return jnp.moveaxis(jnp.stack(ys), 0, -1)

        self._matvec = jax.jit(
            jax.shard_map(
                local_matvec,
                mesh=mesh,
                in_specs=(P(axis, None, None, None),)
                + (P(None, None, axis, None, None),) * len(self.coefs),
                out_specs=P(axis, None, None, None),
            )
        )

    @staticmethod
    def _grid_last(V):
        """Coefficients as (m, m, nz, ny, nx) host arrays + zyx offsets."""
        nz, ny, nx = V.shape_zyx
        m = V.m
        offsets, coefs = [], []
        for off, C in zip(V.offsets, V.coefs):
            C = np.asarray(C)
            if V.layout == "flat":
                # flat offsets come from the 7-point set {0, ±1, ±nx, ±nx·ny}
                table = {
                    0: (0, 0, 0),
                    1: (0, 0, 1), -1: (0, 0, -1),
                    nx: (0, 1, 0), -nx: (0, -1, 0),
                    nx * ny: (1, 0, 0), -nx * ny: (-1, 0, 0),
                }
                offsets.append(table[int(off)])
                coefs.append(C.reshape(m, m, nz, ny, nx))
            elif V.layout == "grid_last":
                offsets.append(tuple(off))
                coefs.append(C)
            else:  # block: (*grid, m, m)
                offsets.append(tuple(off))
                coefs.append(np.ascontiguousarray(C.transpose(3, 4, 0, 1, 2)))
        return tuple(offsets), tuple(coefs)

    def shard_vector(self, x) -> jax.Array:
        """Flat cell-major state → z-slab-sharded (nz, ny, nx, m) array."""
        nz, ny, nx = self.shape_zyx
        return jax.device_put(
            np.asarray(x).reshape(nz, ny, nx, self.m), self.x_sharding
        )

    def unshard_vector(self, x: jax.Array) -> np.ndarray:
        return np.asarray(x).reshape(-1)

    def matvec(self, x: jax.Array) -> jax.Array:
        return self._matvec(x, *self.coefs)

    def __call__(self, x):
        return self.matvec(x)
