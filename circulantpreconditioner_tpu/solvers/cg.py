"""Preconditioned conjugate gradient (for SPD operators), fully on-device.

Analog of PETSc KSPCG with the same convergence semantics as gmres.py:
‖r_pre‖₂ < max(rtol·‖b_pre‖₂, atol). Matrix-free; one lax.while_loop; all
reductions stay on device (→ psum under sharding).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from circulantpreconditioner_tpu.solvers.gmres import KrylovResult, _identity


def make_cg(
    A: Callable[[jax.Array], jax.Array],
    M: Callable[[jax.Array], jax.Array] | None = None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    maxiter: int = 1000,
) -> Callable[[jax.Array, jax.Array | None], KrylovResult]:
    if M is None:
        M = _identity

    @jax.jit
    def solve(b: jax.Array, x0: jax.Array | None = None) -> KrylovResult:
        x = jnp.zeros_like(b) if x0 is None else x0
        eps = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)
        bnorm = jnp.linalg.norm(M(b))
        tol = jnp.maximum(rtol * bnorm, atol)

        r = b - A(x)
        z = M(r)
        p = z
        rz = jnp.vdot(r, z).real.astype(b.dtype)

        def cond(st):
            x, r, z, p, rz, it, res = st
            return jnp.logical_and(res >= tol, it < maxiter)

        def body(st):
            x, r, z, p, rz, it, _ = st
            Ap = A(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap).real.astype(b.dtype), eps)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z).real.astype(b.dtype)
            beta = rz_new / jnp.maximum(rz, eps)
            p = z + beta * p
            res = jnp.linalg.norm(z)
            return (x, r, z, p, rz_new, it + 1, res)

        res0 = jnp.linalg.norm(z)
        x, r, z, p, rz, it, res = lax.while_loop(
            cond, body, (x, r, z, p, rz, jnp.array(0, jnp.int32), res0)
        )
        return KrylovResult(x, it, res, res < tol)

    return solve


def cg(A, b, x0=None, *, M=None, rtol=1e-5, atol=1e-5, maxiter=1000) -> KrylovResult:
    return make_cg(A, M, rtol=rtol, atol=atol, maxiter=maxiter)(b, x0)
