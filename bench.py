"""Benchmark harness — run by the driver on real TPU hardware each round.

Flagship metric: circulant FFT PC applies per second (one PC apply == one
full rfftn → eigenvalue divide → irfftn solve) on the reference's largest
registered problem, the 100³ transport grid
(/root/reference/tests/CMakeLists.txt:42). The baseline is the same solve
executed with SciPy's pocketfft on this host's CPU — the stand-in for the
reference's single-node PETSc/FFTW path (the reference publishes no numbers;
BASELINE.md mandates measuring).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Timing uses a lax.scan chain of dependent solves so dispatch pipelining
cannot hide per-step latency.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_scipy_baseline(n: int, lam: np.ndarray, steps: int = 10) -> float:
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

    from circulantpreconditioner_tpu.utils import enable_compile_cache

    # persistent compilation cache: the axon remote compile of the scan graph
    # has multi-minute variance; cache hits make reruns start in seconds
    enable_compile_cache()

    from circulantpreconditioner_tpu.models.runner import scan_steps
    from circulantpreconditioner_tpu.ops.circulant import (
        CirculantTransportOperator,
        np_eigenvalue_diagonal,
    )
    from circulantpreconditioner_tpu.ops.dft_matmul import MatmulCirculantSolver
    from circulantpreconditioner_tpu.utils import retry_transient

    n = 100  # the reference's "gros calcul" grid (tests/CMakeLists.txt:42)
    h = 1.0 / n
    dt = (1e3 / 3) * (h / 6)
    lambdas_zyx = (0.0, 0.0, 1.0 * dt / h)
    op = CirculantTransportOperator.create((n, n, n), lambdas_zyx, jnp.float32)
    # DFT-by-matmul on the MXU in full-f32 precision — the TPU-native solve
    # path (the XLA FFT lowering is ~30-50x slower on this chip)
    solver = MatmulCirculantSolver.from_operator(op, precision="highest")

    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.random((n, n, n)).astype(np.float32) * 50 + 600)

    def step(u):
        u1 = solver.solve(u)
        return u1, jnp.float32(0.0)

    steps = 100

    @jax.jit
    def run(u):
        def body(v, _):
            return step(v)[0], None

        out, _ = jax.lax.scan(body, u, None, length=steps)
        return out

    # compile + warmup (transient-retry for the axon tunnel)
    print("bench: compiling scan...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    retry_transient(lambda: run(u0))
    print(f"bench: compile+warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    uf = run(u0)
    jax.block_until_ready(uf)
    per_step = (time.perf_counter() - t0) / steps
    solves_per_s = 1.0 / per_step

    # correctness gate: residual of one solve via the stencil matvec
    u1 = retry_transient(lambda: solver.solve(u0))
    r = retry_transient(
        lambda: jax.jit(lambda a, b: jnp.full((8, 128), jnp.linalg.norm(op.matvec(a) - b) / jnp.linalg.norm(b)))(u1, u0)
    )
    rel_res = float(np.asarray(r)[0, 0])
    if not rel_res < 1e-4:
        print(f"RESIDUAL CHECK FAILED: {rel_res}", file=sys.stderr)
        sys.exit(1)

    lam_np = np_eigenvalue_diagonal((n, n, n), lambdas_zyx, rfft=True)
    baseline = measure_scipy_baseline(n, lam_np)

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
