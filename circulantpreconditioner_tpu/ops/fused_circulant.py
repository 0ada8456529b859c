"""Fully-fused 3D circulant solve: one Pallas kernel, field resident in VMEM.

The staged MXU path (ops/dft_matmul.py) is ~20 separate XLA dots; each dot
round-trips the (nz, ny, nxr) spectra through HBM, so a 100³ solve streams
~80 MB for a 4 MB field — measured at the HBM roofline (0.098 ms ≈ 819 GB/s
on v5e). This kernel performs the WHOLE pipeline of the reference's 3-op hot
kernel (/root/reference/src/FftLinearSolver_3D.c:166-190 — FFT → pointwise
divide → inverse FFT → scale) inside one `pl.pallas_call`: the field enters
VMEM once, every transform is an MXU dot fed from VMEM, and only the result
leaves. HBM traffic drops to in + out + eigen-table + DFT matrices ≈ 16 MB,
which moves the solve from HBM-bound to MXU/VPU-bound.

Measured at 100³ on TPU v5e (see PROFILE.md for the full table): 124.6 µs at
the bf16x3 tier (rel. residual 1.0e-5), 91.6 µs at the single-pass bf16 tier
(~5e-3, preconditioner-grade), vs 98 µs for the staged XLA path at bf16x3.
The all-axes fused form is bounded below by ~63 µs of bf16x3 MXU passes plus
~35 µs of in-VMEM relayouts + launch, so it only beats the staged path at
the low-precision PC tier; for the λ-sparse configurations that dominate the
reference's own workloads, ops/spectral_collapse.py's exact axis elision is
the big win (26.5 µs). Numerics are identical to MatmulCirculantSolver.

Mosaic layout discipline (the difference between a 35 s and a 10+-minute
compile, and between working code and `unsupported shape cast`):
- every reshape that merges leading dims must merge an 8-multiple
  second-to-minor dim, so the spectral extents are zero-padded to
  KP/YP/ZP = next multiples of 8 (zero columns in the padded DFT matrices
  keep the padding exactly zero through the pipeline);
- Precision.HIGH is not lowered by Mosaic; the bf16x3 tier (3 bf16 MXU
  passes with the lo·lo term dropped — the same numerics XLA uses) is built
  by hand from bf16 hi/lo splits.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from circulantpreconditioner_tpu.ops.circulant import (
    CirculantTransportOperator,
    np_eigenvalue_diagonal,
)
from circulantpreconditioner_tpu.ops.dft_matmul import (
    MatmulCirculantSolver,
    _np_dft_mats,
    _np_rdft_mats,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pl = None
    pltpu = None
    _HAS_PLTPU = False

_VMEM_LIMIT_BYTES = 110 * 1024 * 1024
_DN = (((1,), (0,)), ((), ()))


def _r8(n: int) -> int:
    return -(-n // 8) * 8


def _vmem_estimate(shape_zyx: tuple[int, ...]) -> int:
    nz, ny, nx = shape_zyx
    kp, yp, zp = _r8(nx // 2 + 1), _r8(ny), _r8(nz)
    spec = kp * yp * zp * 4
    return 10 * spec + 3 * nz * ny * nx * 4


def _mk_ops(precision: str):
    """(split, mm) pair implementing the precision tier on the MXU.

    Mosaic only lowers DEFAULT/HIGHEST dot precisions, so the "high"
    (bf16x3) tier — 3 bf16 passes with f32 accumulation, the same numerics
    XLA's Precision.HIGH uses — is built by hand: operands are split into
    bf16 (hi, lo) pairs and the lo·lo term is dropped."""
    if precision == "highest":
        split = lambda a: (a,)
        mm = lambda A, B: lax.dot_general(
            A[0], B[0], _DN, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
    elif precision == "default":
        split = lambda a: (a.astype(jnp.bfloat16),)
        mm = lambda A, B: lax.dot_general(
            A[0], B[0], _DN, preferred_element_type=jnp.float32)
    else:  # "high" = bf16x3

        def split(a):
            hi = a.astype(jnp.bfloat16)
            lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (hi, lo)

        def mm(A, B):
            d = functools.partial(lax.dot_general, dimension_numbers=_DN,
                                  preferred_element_type=jnp.float32)
            return d(A[0], B[0]) + d(A[1], B[0]) + d(A[0], B[1])

    return split, mm


def _pad_np(a: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    out = np.zeros(shape, np.float64)
    out[: a.shape[0], : a.shape[1]] = a
    return out


def _solve3d_kernel(precision, dims, g_ref, fre, fim, cy, sy, cz, sz,
                    ire_r, iim_r, ciz, siz, ciy, siy, bre, bim, o_ref):
    """g (nz,ny,nx) → o (ZP,YP,nx) padded; all refs VMEM-resident."""
    nz, ny, nx, KP, YP, ZP = dims
    split, mm = _mk_ops(precision)

    def cstage(re, im, C, S):
        """(re + i·im) ← (re + i·im)·(C + i·S), contraction on the minor axis."""
        R, I = split(re), split(im)
        Cs, Ss = split(C[:]), split(S[:])
        return mm(R, Cs) - mm(I, Ss), mm(R, Ss) + mm(I, Cs)

    # x forward (half-spectrum): (zy, nx) @ (nx, KP)
    G = split(g_ref[:].reshape(nz * ny, nx))
    re = mm(G, split(fre[:]))
    im = mm(G, split(fim[:]))

    # y stage: put y minor — (z, y, k) → (z, k, y); merge over KP (8-aligned)
    re = re.reshape(nz, ny, KP).transpose(0, 2, 1).reshape(nz * KP, ny)
    im = im.reshape(nz, ny, KP).transpose(0, 2, 1).reshape(nz * KP, ny)
    re, im = cstage(re, im, cy, sy)                       # → (nz·KP, YP)

    # z stage: put z minor — (z, k, ky) → (k, ky, z); merge over YP
    re = re.reshape(nz, KP, YP).transpose(1, 2, 0).reshape(KP * YP, nz)
    im = im.reshape(nz, KP, YP).transpose(1, 2, 0).reshape(KP * YP, nz)
    re, im = cstage(re, im, cz, sz)                       # → (KP·YP, ZP)

    # eigenvalue reciprocal multiply, tables stored (KP·YP, ZP)
    r2 = re * ire_r[:] - im * iim_r[:]
    im = re * iim_r[:] + im * ire_r[:]
    re = r2

    # inverse z (z stays minor): (KP·YP, ZP) → real z in the first nz lanes
    re, im = cstage(re, im, ciz, siz)

    # inverse y: (k, ky, z) → (k, z, ky); merge over ZP
    re = re.reshape(KP, YP, ZP).transpose(0, 2, 1).reshape(KP * ZP, YP)
    im = im.reshape(KP, YP, ZP).transpose(0, 2, 1).reshape(KP * ZP, YP)
    re, im = cstage(re, im, ciy, siy)                     # → (KP·ZP, YP)

    # inverse x: (k, z, y) → (z, y, k); merge over KP, then (zy, KP)@(KP, nx)
    re = re.reshape(KP, ZP, YP).transpose(1, 2, 0).reshape(ZP * YP, KP)
    im = im.reshape(KP, ZP, YP).transpose(1, 2, 0).reshape(ZP * YP, KP)
    x = mm(split(re), split(bre[:])) + mm(split(im), split(bim[:]))
    o_ref[:] = x.reshape(ZP, YP, nx)


@jax.tree_util.register_pytree_node_class
@dataclass
class FusedCirculantSolver:
    """Drop-in for MatmulCirculantSolver.solve with the whole pipeline fused
    into one VMEM-resident Pallas kernel (3D only; other ranks and
    VMEM-overflow shapes fall back to the staged MXU path)."""

    shape_zyx: tuple[int, ...]
    arrays: tuple
    precision: str = "high"
    interpret: bool = False

    def tree_flatten(self):
        return (self.arrays,), (self.shape_zyx, self.precision, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (arrays,) = children
        return cls(aux[0], arrays, aux[1], aux[2])

    @classmethod
    def create(cls, shape_zyx: Sequence[int], lambdas_zyx: Sequence[float],
               dtype=jnp.float32, precision: str = "high", interpret: bool = False):
        shape_zyx = tuple(int(v) for v in shape_zyx)
        # pl is None when the pallas import itself failed — interpret mode
        # can't help then either (solve() needs pl.pallas_call)
        if len(shape_zyx) != 3 or pl is None or (not _HAS_PLTPU and not interpret) \
                or _vmem_estimate(shape_zyx) > _VMEM_LIMIT_BYTES:
            return MatmulCirculantSolver.create(shape_zyx, lambdas_zyx, dtype, precision)
        nz, ny, nx = shape_zyx
        nxr = nx // 2 + 1
        KP, YP, ZP = _r8(nxr), _r8(ny), _r8(nz)
        F_re, F_im, B_re, B_im = _np_rdft_mats(nx)
        Cz, Sz, Ciz, Siz = _np_dft_mats(nz)
        Cy, Sy, Ciy, Siy = _np_dft_mats(ny)
        lam = np_eigenvalue_diagonal(shape_zyx, lambdas_zyx, rfft=True)  # (nz,ny,nxr)
        den = lam.real**2 + lam.imag**2
        ire = np.zeros((KP, YP, ZP))
        iim = np.zeros((KP, YP, ZP))
        ire[:nxr, :ny, :nz] = (lam.real / den).transpose(2, 1, 0)
        iim[:nxr, :ny, :nz] = (-lam.imag / den).transpose(2, 1, 0)
        j = lambda a, s: jnp.asarray(_pad_np(a, s), dtype)
        arrays = (
            j(F_re, (nx, KP)), j(F_im, (nx, KP)),
            j(Cy, (ny, YP)), j(Sy, (ny, YP)),
            j(Cz, (nz, ZP)), j(Sz, (nz, ZP)),
            jnp.asarray(ire.reshape(KP * YP, ZP), dtype),
            jnp.asarray(iim.reshape(KP * YP, ZP), dtype),
            j(Ciz, (ZP, ZP)), j(Siz, (ZP, ZP)),
            j(Ciy, (YP, YP)), j(Siy, (YP, YP)),
            j(B_re, (KP, nx)), j(B_im, (KP, nx)),
        )
        return cls(shape_zyx, arrays, precision, interpret)

    @classmethod
    def from_operator(cls, op: CirculantTransportOperator, precision: str = "high",
                      interpret: bool = False):
        return cls.create(op.shape_zyx, op.lambdas_zyx,
                          dtype=op.lam_rfft_re.dtype, precision=precision,
                          interpret=interpret)

    @jax.jit
    def solve(self, b: jax.Array) -> jax.Array:
        was_flat = b.ndim == 1
        g = b.reshape(self.shape_zyx)
        nz, ny, nx = self.shape_zyx
        KP, YP, ZP = _r8(nx // 2 + 1), _r8(ny), _r8(nz)
        kernel = functools.partial(_solve3d_kernel, self.precision,
                                   (nz, ny, nx, KP, YP, ZP))
        kwargs = {}
        if _HAS_PLTPU and not self.interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES,
            )
        xp = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ZP, YP, nx), g.dtype),
            interpret=self.interpret,
            **kwargs,
        )(g, *self.arrays)
        x = xp[:nz, :ny, :]
        return x.reshape(-1) if was_flat else x

    def as_preconditioner(self) -> jax.tree_util.Partial:
        return jax.tree_util.Partial(FusedCirculantSolver.solve, self)
