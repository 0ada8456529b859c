"""WaveSystem_SphericalExplosion explicit driver analog.

Reference: tests/WaveSystem_SphericalExplosion_expl_{seq,mpi}.cxx — explicit
upwind stepping Uⁿ⁺¹ = Uⁿ − D Uⁿ on the 50×50 square (or any mesh), cfl=1/dim,
stationarity ‖dUn‖₂ < 1e-5. `--shard` runs the expl_mpi workload: the
distributed MatMult loop (:90-135) over the device mesh with ppermute-halo
SpMV, and the VecScatterCreateToZero output gather (:51,134-135) as a
host-side unshard on every output step.

    python -m circulantpreconditioner_tpu.drivers.wave_explicit 50 50
    python -m ... --mesh-family kershaw 8 8 8 --shard slab
"""

from __future__ import annotations

import numpy as np

from circulantpreconditioner_tpu.drivers.common import base_parser, build_mesh, make_output_cb, setup_dtype, chunk_of
from circulantpreconditioner_tpu.models import WaveSystem, run_time_loop


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--shard", choices=["none", "slab", "rows"], default="none",
                   help="distribute the explicit MatMult loop over the device "
                        "mesh: 'slab' = z-slab stencil + ppermute plane halos "
                        "(topologically structured meshes), 'rows' = row-"
                        "sharded ELL SpMV (any mesh)")
    args = p.parse_args(argv)
    dtype = setup_dtype(args)
    mesh = build_mesh(args)
    model = WaveSystem(mesh, cfl=args.cfl or 1.0 / mesh.dim, dtype=dtype)
    print(f"-- explicit wave: mesh {mesh.name} ({mesh.n_cells} cells), dt={model.dt:.4g}")

    if args.shard != "none":
        return _main_sharded(args, mesh, model, dtype)

    # field-major loop when the mesh has a gather-free stencil form: the
    # (N,m)<->(m,N) relayouts otherwise dominate every matvec (see
    # WaveNormalStencilOperator.matvec_fm); convert only at I/O boundaries.
    step_fm = model.explicit_stepper_fm()
    cb = make_output_cb(args, mesh, split=model.split_fields, prefix="wave")
    if step_fm is not None:
        print("-- field-major stencil loop")
        res = run_time_loop(
            step_fm, model.pack_fm(model.initial_state()), model.dt,
            tmax=args.tmax, ntmax=args.ntmax,
            precision=args.precision, output_freq=args.output_freq,
            chunk=chunk_of(args),
            on_output=lambda it, t, G, ex: cb(it, t, model.unpack_fm(G), ex),
        )
        res.state = model.unpack_fm(res.state)
    else:
        step = model.explicit_stepper()
        res = run_time_loop(
            step, model.initial_state(), model.dt, tmax=args.tmax, ntmax=args.ntmax,
            precision=args.precision, output_freq=args.output_freq,
            chunk=chunk_of(args),
            on_output=cb,
        )
    pfin, vfin = model.split_fields(res.state)
    print(f"\nEnd at it={res.iterations} t={res.time:.6g} stationary={res.stationary}")
    print(f"pressure range [{pfin.min():.6g}, {pfin.max():.6g}]")
    return res


def _make_sharded_operator(args, mesh, model, dtype):
    """The distributed D operator: slab stencil (ppermute plane halos) when
    the mesh is topologically structured, else halo/all-gather ELL rows."""
    from circulantpreconditioner_tpu.parallel import (
        HaloELLMatrix,
        ShardedELLMatrix,
        SlabStencilOperator,
        device_mesh,
    )

    dm = device_mesh(args.devices)
    if args.shard == "slab":
        from circulantpreconditioner_tpu.ops.stencil import VaryingStencilOperator

        if getattr(mesh, "topology_shape", None) is None:
            raise SystemExit("--shard slab needs a topologically structured mesh")
        V = VaryingStencilOperator.from_bsr(model.divergence, mesh.topology_shape)
        S = SlabStencilOperator(V, dm)
        print(f"-- z-slab sharded over {dm.shape} devices (plane halos, "
              f"layout {V.layout})")
        return S
    D = model.divergence
    A = D.to_csr(dtype)
    try:
        As = HaloELLMatrix(A, dm, row_multiple=D.block_size)
        kind = f"halo ppermute (w={As.halo})"
    except ValueError:
        As = ShardedELLMatrix(A, dm, row_multiple=D.block_size)
        kind = "all-gather"
    print(f"-- row-sharded over {dm.shape} devices: {kind} SpMV "
          f"(n={As.n}, padded {As.n_padded})")
    return As


def _main_sharded(args, mesh, model, dtype):
    """Distributed explicit wave loop — the WaveSystem_..._expl_mpi.cxx
    analog: every step is one distributed MatMult + AXPY (:90-91), the
    stationarity norm is a global reduction (:96-97), and outputs gather to
    host 0 (:134-135)."""
    import jax
    import jax.numpy as jnp

    Aop = _make_sharded_operator(args, mesh, model, dtype)

    @jax.jit
    def step(u):
        du = Aop.matvec(u)
        return u - du, jnp.linalg.norm(du.reshape(-1))

    U0 = Aop.shard_vector(np.asarray(model.initial_state()))
    cb = make_output_cb(args, mesh, split=model.split_fields, prefix="wave")
    res = run_time_loop(
        step, U0, model.dt, tmax=args.tmax, ntmax=args.ntmax,
        precision=args.precision, output_freq=args.output_freq,
        chunk=chunk_of(args),
        on_output=lambda it, t, U, extras: cb(it, t, Aop.unshard_vector(U), extras),
    )
    res.state = Aop.unshard_vector(res.state)
    pfin, vfin = model.split_fields(res.state)
    print(f"\nEnd at it={res.iterations} t={res.time:.6g} stationary={res.stationary}")
    print(f"pressure range [{pfin.min():.6g}, {pfin.max():.6g}]")
    return res


if __name__ == "__main__":
    main()
