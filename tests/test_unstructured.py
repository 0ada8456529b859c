"""Unstructured mesh generators + projection-PC tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.mesh.unstructured import (
    build_mesh_from_cells,
    hex_mesh,
    kershaw_mesh,
    read_gmsh,
    tet_mesh,
)
from circulantpreconditioner_tpu.models import TransportEquation, WaveSystem
from circulantpreconditioner_tpu.solvers import make_gmres
from circulantpreconditioner_tpu.solvers.circulant_pc import (
    CirculantProjectionPC,
    derive_grid_context,
)


def test_hex_mesh_matches_structured():
    """The generic face-extraction path on a hex grid must agree with the
    structured generator (volumes, areas, counts, ratio)."""
    bounds = ((-0.5, 0.5),) * 3
    n = (3, 4, 2)
    mu = hex_mesh(bounds, n)
    ms = cartesian_mesh(bounds, n)
    mu.validate()
    assert mu.n_cells == ms.n_cells
    assert mu.n_faces == ms.n_faces
    np.testing.assert_allclose(np.sort(mu.cell_volume), np.sort(ms.cell_volume), atol=1e-12)
    np.testing.assert_allclose(mu.min_ratio_vol_surf(), ms.min_ratio_vol_surf(), atol=1e-12)


def test_tet_mesh_valid():
    m = tet_mesh(((0, 1),) * 3, (2, 2, 2))
    m.validate()
    assert m.n_cells == 2 * 2 * 2 * 6
    # tets tile the cube exactly
    np.testing.assert_allclose(m.cell_volume.sum(), 1.0, atol=1e-12)


def test_kershaw_mesh_valid():
    m = kershaw_mesh(((0, 1),) * 3, (4, 4, 4), eps=0.3)
    m.validate()
    np.testing.assert_allclose(m.cell_volume.sum(), 1.0, atol=1e-10)
    # distortion actually happened: volumes are non-uniform
    assert m.cell_volume.std() / m.cell_volume.mean() > 0.05


def test_gmsh_roundtrip(tmp_path):
    """Write a minimal MSH 2.2 file for one hex and read it back."""
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    msh = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", "8"]
    for i, p in enumerate(pts, 1):
        msh.append(f"{i} {p[0]} {p[1]} {p[2]}")
    msh += ["$EndNodes", "$Elements", "1", "1 5 2 0 1 1 2 3 4 5 6 7 8", "$EndElements"]
    f = tmp_path / "cube.msh"
    f.write_text("\n".join(msh))
    m = read_gmsh(str(f))
    m.validate()
    assert m.n_cells == 1
    np.testing.assert_allclose(m.cell_volume, [1.0], atol=1e-12)


def test_wave_on_tet_mesh_runs():
    """Implicit wave system on an unstructured tet mesh (the reference's
    meshCube.med analog) solves and stays finite."""
    m = tet_mesh(((-0.5, 0.5),) * 3, (4, 4, 4))  # fine enough that cells fall inside the shock sphere
    model = WaveSystem(m, cfl=100.0, dtype=jnp.float64)
    step = model.implicit_stepper(rtol=1e-6, atol=1e-8)
    U1, dn, iters, *_ = step(model.initial_state())
    assert np.isfinite(np.asarray(U1)).all()
    assert int(iters) > 0


def test_derive_grid_context():
    m = tet_mesh(((-0.5, 0.5),) * 3, (3, 3, 3))  # 162 cells
    n_xyz, spacing, lambdas, bbox = derive_grid_context(m, [1.0, 0, 0], dt=0.1)
    assert n_xyz == (5, 5, 5)  # round(162^(1/3)) = 5
    np.testing.assert_allclose(lambdas[0], 0.1 / spacing[0])


def test_projection_pc_transport_kershaw_correct():
    """Scalar projection-circulant PC (the completed PCSHELL) on a Kershaw
    transport operator: preconditioned GMRES converges to the same solution.
    (With Neumann BCs and one-way advection the plain operator is nearly
    lower-triangular in the sweep direction, so plain GMRES is already cheap
    — the acceleration claim lives on the wave system below.)"""
    m = kershaw_mesh(((-0.5, 0.5),) * 3, (6, 6, 6), eps=0.4)
    model = TransportEquation(m, velocity=[1.0, 0.0, 0.0], cfl=20.0, dtype=jnp.float64)
    A = model.implicit_matvec()
    b = model.initial_state()
    res_plain = make_gmres(A, rtol=1e-8, atol=1e-10, maxiter=400)(b, None)
    pc = CirculantProjectionPC(m, model.velocity, model.dt, dtype=jnp.float64)
    res_pc = make_gmres(A, pc.apply, rtol=1e-8, atol=1e-10, maxiter=400, side="right")(b, None)
    assert bool(res_pc.converged)
    r_true = np.asarray(A(res_pc.x)) - np.asarray(b)
    assert np.linalg.norm(r_true) / np.linalg.norm(np.asarray(b)) < 1e-6
    np.testing.assert_allclose(np.asarray(res_pc.x), np.asarray(res_plain.x),
                               rtol=1e-4, atol=1e-5)


def test_block_projection_pc_accelerates_wave_on_kershaw():
    """The reference's target capability (BASELINE.json): GMRES + block-
    circulant PC on the implicit wave system over a Kershaw mesh. The bare
    projection PC is rank-deficient (can't converge as a right PC alone);
    the additive two-level composite (circulant coarse + point-block Jacobi)
    must beat both plain GMRES and Jacobi-only, on the TRUE residual."""
    from circulantpreconditioner_tpu.solvers import preconditioners as pcs
    from circulantpreconditioner_tpu.solvers.circulant_pc import BlockCirculantProjectionPC

    m = kershaw_mesh(((-0.5, 0.5),) * 3, (8, 8, 8), eps=0.4)
    model = WaveSystem(m, cfl=333.0, dtype=jnp.float64)
    A = model.implicit_matvec()
    b = model.initial_state()
    res_plain = make_gmres(A, rtol=1e-8, atol=1e-10, maxiter=600)(b, None)
    jac = pcs.pbjacobi(model.divergence, shift=1.0)
    res_jac = make_gmres(A, jac, rtol=1e-8, atol=1e-10, maxiter=600, side="right")(b, None)
    coarse = BlockCirculantProjectionPC(m, model.dt, model.c0, dtype=jnp.float64)
    M = pcs.additive(coarse.apply, jac)
    res_pc = make_gmres(A, M, rtol=1e-8, atol=1e-10, maxiter=600, side="right")(b, None)
    assert bool(res_pc.converged) and bool(res_plain.converged) and bool(res_jac.converged)
    assert int(res_pc.iters) < int(res_plain.iters) * 0.7
    assert int(res_pc.iters) < int(res_jac.iters)
    # all are true solutions of the same system
    bn = np.linalg.norm(np.asarray(b))
    for res in (res_pc, res_plain, res_jac):
        r_true = np.asarray(A(res.x)) - np.asarray(b)
        assert np.linalg.norm(r_true) / bn < 1e-6


def test_projection_pc_identity_on_matching_grid():
    """On a hex mesh that IS the cartesian grid, P and P_back are inverse
    permutations and the PC equals the circulant direct solve."""
    m = hex_mesh(((-0.5, 0.5),) * 3, (4, 4, 4))
    model = TransportEquation(m, velocity=[1.0, 0.0, 0.0], cfl=50.0, dtype=jnp.float64)
    pc = CirculantProjectionPC(m, model.velocity, model.dt, dtype=jnp.float64,
                               samples_per_axis=2)
    rng = np.random.default_rng(0)
    r = rng.random(m.n_cells)
    out = np.asarray(pc.apply(jnp.asarray(r)))
    # direct circulant solve on the same grid/λ
    direct = np.asarray(pc.solver.solve(jnp.asarray(r[_perm(m, pc)]).reshape(pc.op.shape_zyx)).reshape(-1))
    np.testing.assert_allclose(out[_perm(m, pc)], direct, atol=1e-10)


def _perm(mesh, pc):
    """Permutation from unstructured cell order to cartesian x-fastest order."""
    from scipy.spatial import cKDTree

    bbox = mesh.bbox()
    dim = mesh.dim
    n = pc.n_xyz
    h = [(bbox[d, 1] - bbox[d, 0]) / n[d] for d in range(dim)]
    axes = [bbox[d, 0] + (np.arange(n[d]) + 0.5) * h[d] for d in range(dim)]
    grids = np.meshgrid(*reversed(axes), indexing="ij")
    cart = np.stack([g.reshape(-1) for g in reversed(grids)], axis=1)
    tree = cKDTree(mesh.cell_center[:, :dim])
    _, owner = tree.query(cart)
    return owner


def test_projection_volume_weights_partition_of_unity():
    """method='volume' builds the conserved getCrudeMatrix-style weights the
    reference intended (ToDo.md:12): every P row is a convex combination
    (sums to 1) and applying P to a constant cell field reproduces the
    constant exactly — kept available even though collocation sampling is
    the measured-default (see build_projection_matrices docstring)."""
    from circulantpreconditioner_tpu.solvers.circulant_pc import (
        build_projection_matrices,
        derive_grid_context,
    )

    m = kershaw_mesh(((-0.5, 0.5),) * 3, (6, 6, 6), eps=0.4)
    n_xyz, _, _, bbox = derive_grid_context(m, [0.0] * 3, dt=0.1)
    P, P_back = build_projection_matrices(m, n_xyz, bbox, dtype=jnp.float64,
                                          method="volume")
    ones = jnp.ones(m.n_cells, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(P.matvec(ones)), 1.0, atol=1e-12)
    # smooth linear field: the volume-weighted average stays within the
    # field's range and tracks voxel centers to first order
    f = jnp.asarray(m.cell_center[:, 0])
    g = np.asarray(P.matvec(f))
    assert g.min() >= float(f.min()) - 1e-12 and g.max() <= float(f.max()) + 1e-12
