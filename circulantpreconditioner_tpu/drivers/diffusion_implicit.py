"""Diffusion (heat equation) driver — the model family the reference's
roadmap adds next (reference ToDo.md:5-6). Spherical-explosion temperature
IC, implicit Euler via CG (SPD), GMRES+projection-PC, or the FFT direct
solve on periodic cartesian grids.

    python -m circulantpreconditioner_tpu.drivers.diffusion_implicit 50 50 --method fft --periodic
    python -m ... 8 8 8 --mesh-family kershaw --method pc
"""

from __future__ import annotations

import numpy as np

from circulantpreconditioner_tpu.drivers.common import base_parser, build_mesh, make_output_cb, setup_dtype, chunk_of
from circulantpreconditioner_tpu.models import DiffusionEquation, run_time_loop


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--nu", type=float, default=1.0, help="diffusivity")
    p.add_argument("--method", choices=["cg", "gmres", "pc", "fft"], default="cg")
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--atol", type=float, default=1e-5)
    p.add_argument("--maxits", type=int, default=1000)
    args = p.parse_args(argv)
    dtype = setup_dtype(args)
    if args.method == "fft":
        args.periodic = True
    mesh = build_mesh(args)
    model = DiffusionEquation(mesh, nu=args.nu, cfl=args.cfl or 1e3 / mesh.dim, dtype=dtype)
    print(f"-- implicit diffusion: mesh {mesh.name} ({mesh.n_cells} cells), "
          f"nu={args.nu}, dt={model.dt:.4g}, method={args.method}")

    if args.method == "fft":
        step = model.fft_stepper()
    elif args.method == "pc":
        from circulantpreconditioner_tpu.solvers.circulant_pc import DiffusionProjectionPC

        pc = DiffusionProjectionPC(mesh, model.dt, model.nu, dtype=dtype)
        step = model.implicit_stepper(M=pc.apply, rtol=args.rtol, atol=args.atol,
                                      maxiter=args.maxits, method="gmres")
    else:
        step = model.implicit_stepper(rtol=args.rtol, atol=args.atol,
                                      maxiter=args.maxits, method=args.method)

    res = run_time_loop(
        step, model.initial_state(), model.dt, tmax=args.tmax, ntmax=args.ntmax,
        precision=args.precision, output_freq=args.output_freq,
        chunk=chunk_of(args),
        on_output=make_output_cb(args, mesh, prefix="temperature"),
    )
    u = np.asarray(res.state)
    print(f"\nEnd at it={res.iterations} t={res.time:.6g} stationary={res.stationary}")
    print(f"temperature range [{u.min():.4f}, {u.max():.4f}], mean {u.mean():.4f}")
    return res


if __name__ == "__main__":
    main()
