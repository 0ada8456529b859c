"""Plane-blocked Pallas kernel for the wave normal-form stencil SpMV.

The XLA field-major apply (`WaveNormalStencilOperator.matvec_fm`) runs at
~150 Gnnz/s at Kershaw 64³ on v5e — each of the 6 `jnp.roll`ed neighbour
reads materializes a shifted copy of the field through HBM. This kernel
removes them: every operand is laid out 2D with the flattened grid on the
LANE axis ((m, nz·P) etc., P = nx·ny — Mosaic's (8,128) tiling then only
constrains the plane size P to a multiple of 128), the grid walks
z-planes, and each step holds a 3-plane window of the field in VMEM via
three overlapping BlockSpecs. Every flat neighbour offset
o ∈ {±1, ±nx, ±nx·ny} becomes a STATIC slice of the concatenated window —
flat-layout wrap positions carry zero coefficients by construction
(VaryingStencilOperator._flat_safe), and reads that land in the zero ghost
planes at the global z ends are likewise multiplied by the zero z-wall
coefficient layer, so no masks are needed.

HBM traffic per apply: field ×3 (window re-fetch) + coefficients + output
≈ 63 MB at 64³ → ~77 µs floor; the cell-major XLA form moved ~3× that.

Reference parity: this is the MatMult of the explicit/implicit wave drivers
(src/WaveSystem.cxx:109-176 assembles it; tests/WaveSystem_..._expl_seq.cxx:90
applies it) — same operator, TPU-shaped execution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def make_plane_stencil_matvec(Wn, interpret: bool = False,
                              planes_per_block: int = 2):
    """Build a field-major matvec for a flat-layout
    WaveNormalStencilOperator whose offsets fit a one-plane halo
    (|offset| ≤ nx·ny — true for 7-point stencils in lexicographic order)
    and whose plane size nx·ny is a multiple of 128 (lane tiling).
    Accepts (m, N), (m, nz, ny, nx), or flat (m·N,) field-major input and
    returns the same shape. `planes_per_block` trades grid-step overhead
    against VMEM footprint — measured at Kershaw 64³ on v5e: B=1 141 µs,
    B=2 118.8 µs (247 Gnnz/s, 1.66× the XLA field-major form's 197 µs),
    B=4 140 µs, B=8 fails to compile; default 2. Returned as a
    tree_util.Partial so the coefficient arrays stay runtime parameters.
    Returns None when the operator does not fit the kernel's contract."""
    if Wn.layout != "flat" or len(Wn.shape_zyx) != 3:
        return None
    nz, ny, nx = Wn.shape_zyx
    P = ny * nx
    if P % 128:
        return None
    m = Wn.m
    dim = m - 1
    offs = tuple(int(o) for o in Wn.offsets)
    if any(abs(o) > P for o in offs):
        return None
    B = int(planes_per_block)
    if B < 1:  # contract violation: fall back like the other guards
        return None
    while nz % B:
        B //= 2
    BP = B * P
    c0 = float(Wn.c0)
    diag, s, nvec = Wn.arrays  # (m,m,N), (K,N), (K,dim,N)
    K = s.shape[0]
    dtype = diag.dtype

    def kernel(wm1_ref, w0_ref, wp1_ref, d_ref, s_ref, n_ref, o_ref):
        x0 = w0_ref[:]                                  # (m, BP)
        # neighbours only reach one plane out, so a P-wide skirt from the
        # adjacent blocks suffices for any B
        win = jnp.concatenate(
            [wm1_ref[:, BP - P:], x0, wp1_ref[:, :P]], axis=1)  # (m, BP+2P)
        d = d_ref[:]                                    # (m, m, BP)
        sv = s_ref[:]                                   # (K, BP)
        nv = n_ref[:]                                   # (K, dim, BP)
        ys = []
        for i in range(m):
            acc = d[i, 0] * x0[0]
            for j in range(1, m):
                acc = acc + d[i, j] * x0[j]
            ys.append(acc)
        half = 0.5 * c0
        for k, o in enumerate(offs):
            nbr = win[:, P + o:P + BP + o]
            p = nbr[0]
            t = nv[k, 0] * nbr[1]
            for dd in range(1, dim):
                t = t + nv[k, dd] * nbr[1 + dd]
            u = sv[k] * (0.5 * p - half * t)
            ys[0] = ys[0] + half * sv[k] * (c0 * t - p)
            for dd in range(dim):
                ys[1 + dd] = ys[1 + dd] + u * nv[k, dd]
        o_ref[:] = jnp.stack(ys)

    apply = pl.pallas_call(
        kernel,
        grid=(nz // B,),
        in_specs=[
            pl.BlockSpec((m, BP), lambda i: (0, i)),        # block i-1 (+ghost)
            pl.BlockSpec((m, BP), lambda i: (0, i + 1)),    # block i
            pl.BlockSpec((m, BP), lambda i: (0, i + 2)),    # block i+1 (+ghost)
            pl.BlockSpec((m, m, BP), lambda i: (0, 0, i)),
            pl.BlockSpec((K, BP), lambda i: (0, i)),
            pl.BlockSpec((K, dim, BP), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((m, BP), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, nz * P), dtype),
        interpret=interpret,
    )

    @jax.jit
    def matvec_plane(diag_, s_, nvec_, g: jax.Array) -> jax.Array:
        """g (m, N), (m, nz, ny, nx), or flat (m·N,) field-major → same."""
        shp = g.shape
        g2 = g.reshape(m, nz * P)
        # one ghost BLOCK of zeros each side: keeps the window index maps
        # purely affine (computed/clamped maps do not lower to TPU)
        gp = jnp.pad(g2, ((0, 0), (BP, BP)))
        out = apply(gp, gp, gp, diag_, s_, nvec_)
        return out.reshape(shp)

    return jax.tree_util.Partial(matvec_plane, diag, s, nvec)
