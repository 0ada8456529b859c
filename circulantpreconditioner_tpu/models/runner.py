"""Generic time loop mirroring the reference drivers' structure.

Reference loop shape (e.g. TransportEquationFFT_...cxx:107-137): step until
it ≥ ntmax, t > tmax, or stationarity ‖ΔU‖₂ < precision; log/save every
output_freq steps. Steps are jitted; the loop itself is host-side so drivers
can log and write output (the reference does the same — PETSc solves inside
a C while loop). For pure benchmarking use `scan_steps`, which keeps the
whole multi-step run on device with zero host round-trips.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TimeLoopResult:
    state: jax.Array
    time: float
    iterations: int
    stationary: bool
    step_seconds: list[float] = field(default_factory=list)
    diagnostics: list[dict] = field(default_factory=list)


def run_time_loop(
    step: Callable,  # U -> (U_new, dnorm[, extra...])
    U0: jax.Array,
    dt: float,
    tmax: float = 0.05,
    ntmax: int = 2_000_000,
    precision: float = 1e-5,
    output_freq: int = 1,
    on_output: Callable | None = None,  # (it, t, U_host, extras) -> None
    log: Callable | None = print,
) -> TimeLoopResult:
    U = U0
    t = 0.0
    it = 0
    stationary = False
    result = TimeLoopResult(U, t, it, stationary)
    while it < ntmax and t <= tmax and not stationary:
        t0 = time.perf_counter()
        out = step(U)
        U_new, dnorm, *extras = out
        U_new = jax.block_until_ready(U_new)
        dt_wall = time.perf_counter() - t0
        U = U_new
        t += dt
        it += 1
        dn = float(jnp.asarray(dnorm).reshape(-1)[0])
        stationary = dn < precision
        # failure detection: implicit steppers return (.., iters, resnorm,
        # converged) — log and continue, like the reference's KSP reason
        # branch (WaveSystem_..._impl_seq.cxx:138-146)
        if len(extras) >= 3 and not bool(np.asarray(extras[2])):
            if log is not None:
                log(f"!! step {it}: linear solver did NOT converge "
                    f"(iters={int(np.asarray(extras[0]))}, "
                    f"residual={float(np.asarray(extras[1])):.3e})")
        if it % output_freq == 0 or it >= ntmax or stationary or t >= tmax:
            result.step_seconds.append(dt_wall)
            diag = {"it": it, "t": t, "dnorm": dn,
                    "extras": [np.asarray(e).tolist() for e in extras]}
            result.diagnostics.append(diag)
            if log is not None:
                log(f"-- step {it}, time {t:.6g}, dt {dt:.3g}, |dU| {dn:.3e}, "
                    f"solve wall {dt_wall*1e3:.3f} ms")
            if on_output is not None:
                on_output(it, t, np.asarray(U), extras)
    result.state = U
    result.time = t
    result.iterations = it
    result.stationary = stationary
    return result


def scan_steps(step: Callable, U0: jax.Array, n_steps: int):
    """Run `n_steps` applications of `step` fully on device via lax.scan
    (benchmark path — no host sync per step). `step` must return
    (U_new, dnorm[, ...]); extras beyond dnorm are discarded."""

    @jax.jit
    def run(U0):
        def body(U, _):
            out = step(U)
            return out[0], out[1]

        Uf, dnorms = jax.lax.scan(body, U0, None, length=n_steps)
        return Uf, dnorms

    return run(U0)
