"""Pallas TPU kernels for the hot ops.

`complex_matmul`: (A_re + i·A_im) @ (B_re + i·B_im) → (O_re, O_im) in ONE
kernel — the core op of the DFT-by-matmul circulant solve
(ops/dft_matmul.py). Compared with expressing it as four separate XLA
einsums, the kernel reads each A tile once from HBM per K-step and feeds
all four MXU contractions from VMEM, halving LHS bandwidth, and keeps both
accumulators in VMEM scratch across the K loop.

Grid: (M/bm, N/bn, K/bk) with K innermost (same-output iterations
consecutive, required for safe accumulation). Tiles default to 128³ —
MXU-native. Shapes must be multiples of the block sizes (DFT matrices are
n×n with n the grid side; pad grids to multiples of 128 for peak rates —
see pallas_guide.md tiling constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-enabled builds; kernels fall back otherwise
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _cmm_kernel(are_ref, aim_ref, bre_ref, bim_ref, ore_ref, oim_ref, acc_re, acc_im):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_re[:] = jnp.zeros_like(acc_re)
        acc_im[:] = jnp.zeros_like(acc_im)

    ar = are_ref[:]
    ai = aim_ref[:]
    br = bre_ref[:]
    bi = bim_ref[:]
    acc_re[:] += jnp.dot(ar, br, preferred_element_type=jnp.float32) - jnp.dot(
        ai, bi, preferred_element_type=jnp.float32
    )
    acc_im[:] += jnp.dot(ar, bi, preferred_element_type=jnp.float32) + jnp.dot(
        ai, br, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _done():
        ore_ref[:] = acc_re[:].astype(ore_ref.dtype)
        oim_ref[:] = acc_im[:].astype(oim_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def complex_matmul(
    a_re: jax.Array,
    a_im: jax.Array,
    b_re: jax.Array,
    b_im: jax.Array,
    bm: int = 128,
    bn: int = 128,
    bk: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(M,K)·(K,N) complex matmul as a single Pallas kernel.

    Falls back to plain XLA dots when shapes don't tile evenly or pltpu is
    unavailable (so callers can use it unconditionally).
    """
    M, K = a_re.shape
    K2, N = b_re.shape
    assert K == K2
    if (not _HAS_PLTPU and not interpret) or M % bm or N % bn or K % bk:
        o_re = a_re @ b_re - a_im @ b_im
        o_im = a_re @ b_im + a_im @ b_re
        return o_re, o_im

    grid = (M // bm, N // bn, K // bk)
    mk = lambda i, j, k: (i, k)
    kn = lambda i, j, k: (k, j)
    mn = lambda i, j, k: (i, j)
    kwargs = dict(
        out_shape=(
            jax.ShapeDtypeStruct((M, N), a_re.dtype),
            jax.ShapeDtypeStruct((M, N), a_re.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), mk),
            pl.BlockSpec((bm, bk), mk),
            pl.BlockSpec((bk, bn), kn),
            pl.BlockSpec((bk, bn), kn),
        ],
        out_specs=(pl.BlockSpec((bm, bn), mn), pl.BlockSpec((bm, bn), mn)),
        interpret=interpret,
    )
    if _HAS_PLTPU and not interpret:
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ]
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        )
    else:  # interpret mode: emulate scratch with run_scoped-free shapes
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ] if _HAS_PLTPU else []
    return pl.pallas_call(_cmm_kernel, **kwargs)(a_re, a_im, b_re, b_im)
