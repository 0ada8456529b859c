"""Benchmark harness — run by the driver on real TPU hardware each round.

Flagship metric: circulant FFT PC applies per second (one PC apply == one
full direct solve of C x = b) on the reference's largest registered problem,
the 100³ transport grid with velocity a = (1,0,0)
(/root/reference/tests/CMakeLists.txt:42,
 TransportEquation_SphericalExplosion_impl_mpi.cxx:258-259). The baseline is
the same solve with SciPy's pocketfft (full 3D rfftn→divide→irfftn) on this
host's CPU — the stand-in for the reference's single-node PETSc/FFTW path,
which performs a full 3D FFT per solve regardless of the velocity
(/root/reference/src/FftLinearSolver_3D.c:166-190).

The measured solver is make_circulant_solver: for this λ pattern the exact
spectral collapse applies (Λ depends only on kx ⇒ the y/z transforms cancel;
ops/spectral_collapse.py) and the solve is ONE dense MXU matmul along x.
The residual gate (1e-4, checked against the FULL 3D operator matvec) keeps
the comparison honest. `submetrics` in the same JSON line record the
full-3D formulations on identical hardware/methodology: the staged XLA DFT
pipeline (HBM-roofline-bound, see PROFILE.md) and the fused Pallas VMEM
kernel, so the flagship number is traceable to formulation, not timing
drift.

Timing methodology (load-bearing on the axon tunnel): `block_until_ready`
does not reliably wait, and per-call host dispatch over the tunnel costs more
than the solve itself — so we measure the DEVICE steady-state rate the way
production runs the workload: one jitted `lax.fori_loop` chaining K dependent
solves, completion forced by a full-array D2H fetch, min over repetitions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "submetrics"}.
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
    from circulantpreconditioner_tpu.ops.fused_circulant import FusedCirculantSolver
    from circulantpreconditioner_tpu.ops.spectral_collapse import make_circulant_solver
    from circulantpreconditioner_tpu.utils import enable_compile_cache, retry_transient

    enable_compile_cache()

    n = 100  # the reference's "gros calcul" grid (tests/CMakeLists.txt:42)
    h = 1.0 / n
    dt = (1e3 / 3) * (h / 6)
    lambdas_zyx = (0.0, 0.0, 1.0 * dt / h)
    op = CirculantTransportOperator.create((n, n, n), lambdas_zyx, jnp.float32)

    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.random((n, n, n)).astype(np.float32) * 50 + 600)
    np.asarray(u0)  # warm the D2H path (first transfer can take minutes)

    def rate_and_residual(solver, K1=1000, K2=6000, reps=5):
        """PAIRED differenced device chains: each rep times a K1-chain then a
        K2-chain back-to-back and forms per_i = (T_i(K2)−T_i(K1))/(K2−K1) —
        the fixed dispatch+fetch overhead cancels within the pair, and tunnel
        rate drift between reps cannot mix into one estimate (round-4 lesson:
        min-of-K1 and min-of-K2 taken over DIFFERENT reps produced a ~25%
        spread between driver- and builder-captured runs of identical code).
        Reported value = best pair (min per_i); the across-rep relative
        spread is recorded in submetrics so residual tunnel variance is
        quantified in-file."""
        @jax.jit
        def run_loop(u, K):
            return jax.lax.fori_loop(0, K, lambda i, v: solver.solve(v), u)

        retry_transient(lambda: run_loop(u0, 4))
        np.asarray(run_loop(u0, 4))

        def chain(K):
            t0 = time.perf_counter()
            np.asarray(run_loop(u0, K))  # fetch forces completion
            return time.perf_counter() - t0

        pers = []
        for _ in range(reps):
            t1 = chain(K1)
            t2 = chain(K2)
            pers.append(max((t2 - t1) / (K2 - K1), 1e-7))
        # a tunnel hiccup during the K1 chain can make a pair's difference
        # ~zero or negative (observed: one such pair reported 10M solves/s);
        # keep only pairs within a sane band of the median before taking
        # the best, and top up with extra pairs if too few survive
        med = sorted(pers)[len(pers) // 2]
        valid = [p for p in pers if p > 0.3 * med]
        tries = 0
        while len(valid) < 3 and tries < 4:
            t1 = chain(K1)
            t2 = chain(K2)
            p = max((t2 - t1) / (K2 - K1), 1e-7)
            pers.append(p)
            med = sorted(pers)[len(pers) // 2]
            valid = [p for p in pers if p > 0.3 * med]
            tries += 1
        per = min(valid) if valid else med
        rate_spread = ((max(valid) - min(valid)) / med) if valid else 1.0
        # residual of one solve, via the FULL 3D operator's stencil matvec
        u1 = solver.solve(u0)
        r = retry_transient(
            lambda: jax.jit(
                lambda a, b: jnp.full((8, 128),
                                      jnp.linalg.norm(op.matvec(a) - b) / jnp.linalg.norm(b))
            )(u1, u0)
        )
        return 1.0 / per, float(np.asarray(r)[0, 0]), rate_spread

    # flagship: exact spectral collapse (dense matmul along x), bf16x3 tier.
    # K sized so the one D2H fetch (~0.1 s through the tunnel) amortizes to
    # <2% of the loop for a ~30 µs/solve rate.
    print("bench: flagship (spectral collapse, high tier)...", file=sys.stderr, flush=True)
    flagship = make_circulant_solver((n, n, n), lambdas_zyx, jnp.float32, precision="high")
    solves_per_s, rel_res, spread = rate_and_residual(flagship, K1=2000, K2=20000)
    print(f"bench: flagship {solves_per_s:.0f} solves/s, residual {rel_res:.2e}, "
          f"rep spread {spread:.1%}", file=sys.stderr, flush=True)
    if not rel_res < 1e-4:
        print(f"RESIDUAL CHECK FAILED: {rel_res}", file=sys.stderr)
        sys.exit(1)

    submetrics = {"flagship_rel_residual": round(rel_res, 8),
                  "flagship_rep_spread": round(spread, 4)}

    # full-3D formulations for traceability (same hardware, same methodology)
    try:
        staged = MatmulCirculantSolver.from_operator(op, precision="high")
        v, r, _ = rate_and_residual(staged, reps=3)
        submetrics["staged_full3d_solves_per_s"] = round(v, 1)
        submetrics["staged_full3d_rel_residual"] = round(r, 8)
        print(f"bench: staged full-3D {v:.0f} solves/s (res {r:.1e})",
              file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        submetrics["staged_full3d_error"] = str(e)[:120]
    try:
        fused = FusedCirculantSolver.from_operator(op, precision="high")
        if isinstance(fused, FusedCirculantSolver):
            v, r, _ = rate_and_residual(fused, K1=500, K2=2500, reps=2)
            submetrics["fused_full3d_solves_per_s"] = round(v, 1)
            submetrics["fused_full3d_rel_residual"] = round(r, 8)
            print(f"bench: fused full-3D {v:.0f} solves/s (res {r:.1e})",
                  file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        submetrics["fused_full3d_error"] = str(e)[:120]

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
                "submetrics": submetrics,
            }
        )
    )


if __name__ == "__main__":
    main()
