"""Preconditioned BiCGStab for general nonsymmetric operators, on-device.

Analog of PETSc KSPBCGS; complements GMRES for the upwind FV operators
(short recurrences — O(1) memory vs GMRES's restart basis). Right
preconditioning form; convergence on true residual norm with
‖r‖ < max(rtol·‖b‖, atol).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from circulantpreconditioner_tpu.solvers.gmres import KrylovResult, _identity


def make_bicgstab(
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
        dt = b.dtype
        eps = jnp.asarray(jnp.finfo(dt).tiny, dt)
        bnorm = jnp.linalg.norm(b)
        tol = jnp.maximum(rtol * bnorm, atol)

        r = b - A(x)
        r0 = r
        rho = jnp.asarray(1.0, dt)
        alpha = jnp.asarray(1.0, dt)
        omega = jnp.asarray(1.0, dt)
        v = jnp.zeros_like(b)
        p = jnp.zeros_like(b)

        def cond(st):
            *_, it, res = st
            return jnp.logical_and(res >= tol, it < maxiter)

        def body(st):
            x, r, v, p, rho, alpha, omega, it, _ = st
            rho_new = jnp.vdot(r0, r).real.astype(dt)
            beta = (rho_new / jnp.where(jnp.abs(rho) > eps, rho, eps)) * (
                alpha / jnp.where(jnp.abs(omega) > eps, omega, eps)
            )
            p = r + beta * (p - omega * v)
            phat = M(p)
            v = A(phat)
            alpha = rho_new / jnp.where(
                jnp.abs(jnp.vdot(r0, v).real.astype(dt)) > eps,
                jnp.vdot(r0, v).real.astype(dt),
                eps,
            )
            s = r - alpha * v
            shat = M(s)
            t = A(shat)
            tt = jnp.vdot(t, t).real.astype(dt)
            omega = jnp.vdot(t, s).real.astype(dt) / jnp.where(tt > eps, tt, eps)
            x = x + alpha * phat + omega * shat
            r = s - omega * t
            res = jnp.linalg.norm(r)
            return (x, r, v, p, rho_new, alpha, omega, it + 1, res)

        res0 = jnp.linalg.norm(r)
        st = lax.while_loop(
            cond, body, (x, r, v, p, rho, alpha, omega, jnp.array(0, jnp.int32), res0)
        )
        x, r, v, p, rho, alpha, omega, it, res = st
        return KrylovResult(x, it, res, res < tol)

    return solve


def bicgstab(A, b, x0=None, *, M=None, rtol=1e-5, atol=1e-5, maxiter=1000) -> KrylovResult:
    return make_bicgstab(A, M, rtol=rtol, atol=atol, maxiter=maxiter)(b, x0)
