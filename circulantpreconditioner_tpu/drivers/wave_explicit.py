"""WaveSystem_SphericalExplosion explicit driver analog.

Reference: tests/WaveSystem_SphericalExplosion_expl_{seq,mpi}.cxx — explicit
upwind stepping Uⁿ⁺¹ = Uⁿ − D Uⁿ on the 50×50 square (or any mesh), cfl=1/dim,
stationarity ‖dUn‖₂ < 1e-5.

    python -m circulantpreconditioner_tpu.drivers.wave_explicit 50 50
"""

from __future__ import annotations

import numpy as np

from circulantpreconditioner_tpu.drivers.common import base_parser, build_mesh, make_output_cb, setup_dtype, chunk_of
from circulantpreconditioner_tpu.models import WaveSystem, run_time_loop


def main(argv=None):
    p = base_parser(__doc__)
    args = p.parse_args(argv)
    dtype = setup_dtype(args)
    mesh = build_mesh(args)
    model = WaveSystem(mesh, cfl=args.cfl or 1.0 / mesh.dim, dtype=dtype)
    print(f"-- explicit wave: mesh {mesh.name} ({mesh.n_cells} cells), dt={model.dt:.4g}")
    step = model.explicit_stepper()
    res = run_time_loop(
        step, model.initial_state(), model.dt, tmax=args.tmax, ntmax=args.ntmax,
        precision=args.precision, output_freq=args.output_freq,
        chunk=chunk_of(args),
        on_output=make_output_cb(args, mesh, split=model.split_fields, prefix="wave"),
    )
    pfin, vfin = model.split_fields(res.state)
    print(f"\nEnd at it={res.iterations} t={res.time:.6g} stationary={res.stationary}")
    print(f"pressure range [{pfin.min():.6g}, {pfin.max():.6g}]")
    return res


if __name__ == "__main__":
    main()
