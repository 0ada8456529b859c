"""WaveSystem_SphericalExplosion implicit driver analog.

Reference: tests/WaveSystem_SphericalExplosion_impl_{seq,mpi}.cxx — implicit
(I + D)Uⁿ⁺¹ = Uⁿ via GMRES, cfl=1e3/dim, tol 1e-5, maxits 1000; PC = ILU (seq)
/ BJACOBI (mpi). Selectable here: ilu0, pbjacobi, bjacobi-ilu0, the block-
circulant direct solver (periodic cartesian), or the additive two-level
block-circulant projection PC (unstructured).

    python -m circulantpreconditioner_tpu.drivers.wave_implicit 50 50 --pc ilu0
    python -m ... --mesh-family kershaw 8 8 8 --pc circulant2l
"""

from __future__ import annotations

import numpy as np

from circulantpreconditioner_tpu.drivers.common import base_parser, build_mesh, make_output_cb, setup_dtype, chunk_of
from circulantpreconditioner_tpu.models import WaveSystem, run_time_loop
from circulantpreconditioner_tpu.solvers import preconditioners as pcs


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--pc", choices=["none", "pbjacobi", "ilu0", "bjacobi", "blockfft",
                                    "dctfft", "circulant2l", "dct2l", "dct2lm",
                                    "gridmg", "aggvcycle"],
                   default="ilu0",
                   help="blockfft/dctfft replace GMRES with an exact direct "
                        "solve (periodic / wall cartesian grids); gridmg = "
                        "geometric-Galerkin grid V-cycle (recovered-grid "
                        "meshes), aggvcycle = algebraic aggregation V-cycle "
                        "(any mesh, the warped-fixture PC)")
    p.add_argument("--n-blocks", type=int, default=4, help="bjacobi partition count")
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--atol", type=float, default=1e-5)
    p.add_argument("--maxits", type=int, default=1000)
    p.add_argument("--shard", choices=["none", "rows"], default="none",
                   help="row-sharded SpMV + psum GMRES over the device mesh "
                        "(the impl_mpi analog; pc none|pbjacobi|circulant2l)")
    args = p.parse_args(argv)
    dtype = setup_dtype(args)
    mesh = build_mesh(args)
    model = WaveSystem(mesh, cfl=args.cfl or 1e3 / mesh.dim, dtype=dtype)
    print(f"-- implicit wave: mesh {mesh.name} ({mesh.n_cells} cells), "
          f"dt={model.dt:.4g}, pc={args.pc}")

    if args.shard == "rows":
        return _main_sharded(args, mesh, model, dtype)

    side = ("right" if args.pc in ("circulant2l", "dct2l", "dct2lm", "gridmg",
                                   "aggvcycle") else "left")
    fm = False  # field-major loop (no per-matvec relayouts) when available
    coarse = None
    if args.pc in ("circulant2l", "dct2l", "dct2lm"):
        from circulantpreconditioner_tpu.solvers.circulant_pc import (
            BlockCirculantProjectionPC,
            DCTBlockProjectionPC,
        )

        cls = BlockCirculantProjectionPC if args.pc == "circulant2l" else DCTBlockProjectionPC
        coarse = cls(mesh, model.dt, model.c0, dtype=dtype)

    if args.pc == "blockfft":
        # direct block-circulant solve replaces GMRES entirely
        step = model.block_fft_stepper()
    elif args.pc == "dctfft":
        # direct wall-BC DCT/DST solve replaces GMRES entirely; field-major
        # loop (the per-step relayouts cost ~6x the solve, dct_wave.solve_fm)
        step = model.dct_fft_stepper_fm()
        fm = True
    else:
        # try the field-major GMRES loop first — the cell-major PC stack
        # (including a host inversion of every diagonal block) is only
        # built in the fallback below
        step = None
        if args.pc == "gridmg" and getattr(mesh, "topology_shape", None) is not None:
            from circulantpreconditioner_tpu.solvers.aggregation_pc import (
                GridVCyclePC,
            )

            cps = int(getattr(mesh, "cells_per_site", 1) or 1)
            pc_obj = GridVCyclePC.from_grid_model(
                model.divergence, mesh.topology_shape, cells_per_site=cps,
                A0_apply=model.implicit_matvec(),
                A0_apply_fm=model.implicit_matvec_fm(), shift=1.0, dtype=dtype)
            if cps == 1:
                step = model.implicit_stepper_fm(
                    M_fm=pc_obj.apply_fm_partial(), rtol=args.rtol,
                    atol=args.atol, maxiter=args.maxits, side=side)
                fm = step is not None
            if step is None:
                step = model.implicit_stepper(
                    M=pc_obj.apply_partial(), rtol=args.rtol, atol=args.atol,
                    maxiter=args.maxits, side=side)
        elif args.pc == "aggvcycle":
            from circulantpreconditioner_tpu.solvers.aggregation_pc import (
                AggregationVCyclePC,
            )

            pc_obj = AggregationVCyclePC.from_bsr(
                model.divergence, A0_apply=model.implicit_matvec(),
                shift=1.0, dtype=dtype)
            step = model.implicit_stepper(
                M=pc_obj.apply_partial(), rtol=args.rtol, atol=args.atol,
                maxiter=args.maxits, side=side)
        if step is None and args.pc in ("none", "pbjacobi", "circulant2l", "dct2l", "dct2lm"):
            A_fm = model.implicit_matvec_fm()
            if A_fm is not None:
                M_fm = (pcs.pbjacobi_fm(model.divergence, shift=1.0)
                        if args.pc != "none" else None)
                M_cm = None
                if args.pc == "dct2lm":
                    M_fm = pcs.multiplicative(
                        A_fm, pcs.cell_major_adapter(coarse.apply, model.nb),
                        M_fm)
                elif args.pc in ("circulant2l", "dct2l"):
                    M_cm = coarse.apply
                step = model.implicit_stepper_fm(
                    M_cm=M_cm, M_fm=M_fm, rtol=args.rtol, atol=args.atol,
                    maxiter=args.maxits, side=side)
                fm = step is not None
        if step is None:
            M = _build_cell_major_pc(args, model, coarse, dtype)
            step = model.implicit_stepper(M=M, rtol=args.rtol, atol=args.atol,
                                          maxiter=args.maxits, side=side)

    U0 = model.initial_state()
    if fm:
        print("-- field-major GMRES loop")
        U0 = model.pack_fm(U0).reshape(-1)
    unshard = model.unpack_fm if fm else None

    cb = make_output_cb(args, mesh, split=model.split_fields, prefix="wave")
    on_out = cb if unshard is None else (
        lambda it, t, U, extras: cb(it, t, unshard(U), extras))
    res = run_time_loop(
        step, U0, model.dt, tmax=args.tmax, ntmax=args.ntmax,
        precision=args.precision, output_freq=args.output_freq,
        chunk=chunk_of(args),
        on_output=on_out,
    )
    if unshard is not None:
        res.state = unshard(res.state)
    pfin, vfin = model.split_fields(res.state)
    its = [d["extras"][0] for d in res.diagnostics if d["extras"]]
    print(f"\nEnd at it={res.iterations} t={res.time:.6g} stationary={res.stationary}")
    print(f"pressure range [{pfin.min():.6g}, {pfin.max():.6g}]")
    if its:
        print(f"GMRES iterations per step: median {np.median(its):.0f}, max {np.max(its):.0f}")
    return res


def _build_cell_major_pc(args, model, coarse, dtype):
    """Cell-major preconditioner for the fallback implicit stepper."""
    from circulantpreconditioner_tpu.solvers import preconditioners as pcs

    if args.pc == "none":
        return None
    if args.pc == "pbjacobi":
        return pcs.pbjacobi(model.divergence, shift=1.0)
    if args.pc in ("ilu0", "bjacobi"):
        import scipy.sparse as sp

        from circulantpreconditioner_tpu.ops.csr import CSRMatrix

        A_I = CSRMatrix.from_scipy(
            (sp.eye(model.divergence.shape[0])
             + model.divergence.to_csr(dtype).to_scipy()).tocsr(), dtype=dtype)
        if args.pc == "ilu0":
            return pcs.ilu0(A_I).apply_partial()
        return pcs.block_jacobi_ilu0(A_I, args.n_blocks)
    pj = pcs.pbjacobi(model.divergence, shift=1.0)
    if args.pc == "dct2lm":
        return pcs.multiplicative(model.implicit_matvec(), coarse.apply, pj)
    return pcs.additive(coarse.apply, pj)


def _main_sharded(args, mesh, model, dtype):
    """Row-sharded implicit wave solve over the device mesh — the
    WaveSystem_..._impl_mpi.cxx analog (GMRES+BJACOBI distributed, :32-34,
    :139-189), extended with the distributed circulant projection PC the
    reference was building toward (ToDo.md:1)."""
    import numpy as np

    from circulantpreconditioner_tpu.models.transport import _dnorm_impl
    from circulantpreconditioner_tpu.parallel import (
        DistributedBlockCirculantPC,
        HaloELLMatrix,
        ShardedELLMatrix,
        device_mesh,
        sharded_pbjacobi,
    )
    from circulantpreconditioner_tpu.solvers import make_gmres, preconditioners as pcs

    if args.pc not in ("none", "pbjacobi", "circulant2l"):
        raise SystemExit("--shard rows supports --pc none|pbjacobi|circulant2l")
    dm = device_mesh(args.devices)
    D = model.divergence
    b = D.block_size
    A = D.to_csr(dtype)
    As = None
    if getattr(mesh, "bandwidth_ordered", False):
        # RCM-ordered unstructured mesh (tetra fixture families): the
        # clustered-window SpMV sharded with unit-halo ppermute exchange
        try:
            from circulantpreconditioner_tpu.ops.window_spmv import (
                WindowedBlockOperator,
            )
            from circulantpreconditioner_tpu.parallel import HaloWindowOperator

            As = HaloWindowOperator(
                WindowedBlockOperator.from_bsr(D, dtype=dtype), dm)
            kind = f"halo windowed (wu={As.halo_units} units)"
        except ValueError:
            As = None
    if As is None:
        try:
            As = HaloELLMatrix(A, dm, row_multiple=b)
            kind = f"halo ppermute (w={As.halo})"
        except ValueError:
            As = ShardedELLMatrix(A, dm, row_multiple=b)
            kind = "all-gather"
    print(f"-- row-sharded over {dm.shape} devices: {kind} SpMV "
          f"(n={As.n}, padded {As.n_padded})")

    M = None
    side = "left"
    if args.pc == "pbjacobi":
        Dinv = np.linalg.inv(np.asarray(D.block_diagonal())
                             + np.eye(b)[None, :, :])
        M = sharded_pbjacobi(Dinv, As.n_padded, dm, dtype=dtype)
    elif args.pc == "circulant2l":
        coarse = DistributedBlockCirculantPC(mesh, model.dt, model.c0, dm,
                                             As.n_padded, dtype=dtype)
        Dinv = np.linalg.inv(np.asarray(D.block_diagonal())
                             + np.eye(b)[None, :, :])
        M = pcs.additive(coarse.apply,
                         sharded_pbjacobi(Dinv, As.n_padded, dm, dtype=dtype))
        side = "right"
        print(f"-- distributed circulant PC grid {coarse.n_xyz}")

    solver = make_gmres(lambda v: v + As.matvec(v), M, rtol=args.rtol,
                        atol=args.atol, maxiter=args.maxits, side=side)

    def step(u):
        res = solver(u, u)
        return res.x, _dnorm_impl(res.x, u), res.iters, res.resnorm, res.converged

    U0 = As.shard_vector(np.asarray(model.initial_state()))
    cb = make_output_cb(args, mesh, split=model.split_fields, prefix="wave")
    res = run_time_loop(
        step, U0, model.dt, tmax=args.tmax, ntmax=args.ntmax,
        precision=args.precision, output_freq=args.output_freq,
        chunk=chunk_of(args),
        on_output=lambda it, t, U, extras: cb(it, t, As.unshard_vector(U), extras),
    )
    res.state = As.unshard_vector(res.state)
    pfin, vfin = model.split_fields(res.state)
    its = [d["extras"][0] for d in res.diagnostics if d["extras"]]
    print(f"\nEnd at it={res.iterations} t={res.time:.6g} stationary={res.stationary}")
    print(f"pressure range [{pfin.min():.6g}, {pfin.max():.6g}]")
    if its:
        print(f"GMRES iterations per step: median {np.median(its):.0f}, "
              f"max {np.max(its):.0f}")
    return res


if __name__ == "__main__":
    main()
