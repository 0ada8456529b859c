"""Vectorized finite-volume assembly: transport (scalar CSR) and wave (BSR).

Replaces the cell/face loops + MatSetValues(ADD_VALUES) of the reference
(src/TransportEquation.cxx:75-133, src/WaveSystem.cxx:78-176) with NumPy
face-major scatter-adds producing device-resident CSR/BSR pytrees. The
assembled matrix is the "divergence matrix" D ≈ dt·L such that

    explicit step:  Uⁿ⁺¹ = Uⁿ − D Uⁿ          (WaveSystem_..._expl_seq.cxx:90-91)
    implicit step:  (I + D) Uⁿ⁺¹ = Uⁿ          (MatShift(A,1), ..._impl_seq.cxx:92)

Upwind sign convention (transport). For a face with unit normal n outward of
cell L, un = n·a, the upwind semi-discrete flux gives row L:
    D[L,L] += dt·|F|/|V_L| · max(un, 0)
    D[L,R] += dt·|F|/|V_L| · min(un, 0)      (≤ 0 — an M-matrix off-diagonal)
and symmetrically for R with −n. NOTE: the reference's scalar assembly flips
the neighbour sign (TransportEquation.cxx:109-112 adds −dt·m·un with un<0,
a positive off-diagonal), which contradicts both its own FFT/circulant
operator (first column [1,−1,…], FftLinearSolver_3D.c:80-90) and its wave
assembly ((A−|A|)/2 upwinding). We implement the standard upwind that is
consistent with the circulant solver and the SciPy oracles; on a periodic
uniform grid the assembled matrix is EXACTLY I + Σ λ_d(I − S_d) = the
operator ops/circulant.py diagonalizes (asserted in tests/test_assembly.py).

Wave-system blocks (dim+1 unknowns (p, q) per cell, src/WaveSystem.cxx:92-107):
    A(n)   = [[0, c0²nᵀ], [n, 0]],   |A|(n) = [[c0, 0], [0, c0·nnᵀ]]
    Am     = (A − |A|)/2 · dt·|F|/|V|
    interior/periodic:  D[L,R] += Am,  D[L,L] −= Am
    wall (mirror ghost U_R = (I − 2vvᵀ)U_L, v = (0, n)):
                        D[L,L] += −Am·(2vvᵀ)        (WaveSystem.cxx:150-157)
    neumann: no contribution                          (WaveSystem.cxx:168)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh.core import Mesh
from circulantpreconditioner_tpu.ops.csr import BSRMatrix, CSRMatrix


def _face_sides(mesh: Mesh):
    """Expand faces into per-side (cell, other, normal, coeff_geom, group,
    twin) arrays: each interior face contributes both orientations."""
    L = mesh.face_cells[:, 0]
    R = mesh.face_cells[:, 1]
    interior = R >= 0

    cells = [L, R[interior]]
    others = [R, L[interior]]
    normals = [mesh.face_normal, -mesh.face_normal[interior]]
    areas = [mesh.face_area, mesh.face_area[interior]]
    groups = [mesh.face_group, mesh.face_group[interior]]
    twin = mesh.periodic_twin if mesh.periodic_twin is not None else np.full(mesh.n_faces, -1)
    twins = [twin, np.full(int(interior.sum()), -1, dtype=np.int64)]

    cell = np.concatenate(cells)
    other = np.concatenate(others)
    normal = np.concatenate(normals)
    area = np.concatenate(areas)
    group = np.concatenate(groups)
    twin_cell = np.concatenate(twins)
    return cell, other, normal, area, group, twin_cell


def transport_divergence_csr(
    mesh: Mesh,
    dt: float,
    velocity,
    dtype=jnp.float32,
    boundary: str = "auto",
) -> CSRMatrix:
    """Scalar upwind divergence matrix D (without the identity shift).

    boundary: "auto" honors per-face groups (Periodic couples through the
    wrap, everything else = Neumann no-op, matching the reference's current
    transport driver behavior); "neumann" forces no-op on all boundaries.
    """
    a = np.asarray(velocity, dtype=np.float64)[: mesh.dim]
    cell, other, normal, area, group, twin_cell = _face_sides(mesh)
    un = normal @ a
    coeff = dt * area / mesh.cell_volume[cell]

    rows, cols, vals = [], [], []
    is_boundary = other < 0

    # interior (and the R-side copies): standard upwind pair
    m_int = ~is_boundary
    rows.append(cell[m_int])
    cols.append(cell[m_int])
    vals.append(coeff[m_int] * np.maximum(un[m_int], 0.0))
    rows.append(cell[m_int])
    cols.append(other[m_int])
    vals.append(coeff[m_int] * np.minimum(un[m_int], 0.0))

    if boundary == "auto" and mesh.periodic_twin is not None:
        per_code = mesh.groups.get("Periodic")
        if per_code is not None:
            m_per = is_boundary & (group == per_code) & (twin_cell >= 0)
            rows.append(cell[m_per])
            cols.append(cell[m_per])
            vals.append(coeff[m_per] * np.maximum(un[m_per], 0.0))
            rows.append(cell[m_per])
            cols.append(twin_cell[m_per])
            vals.append(coeff[m_per] * np.minimum(un[m_per], 0.0))
    # all other boundary faces: Neumann → nothing (TransportEquation.cxx:114-130)

    n = mesh.n_cells
    return CSRMatrix.from_coo(
        n, n, np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), dtype=dtype
    )


def diffusion_csr(
    mesh: Mesh,
    dt: float,
    nu: float,
    dtype=jnp.float32,
    boundary: str = "auto",
) -> CSRMatrix:
    """Scalar diffusion operator D = dt·ν·L (two-point flux approximation,
    no identity shift), so the implicit heat step is (I + D)uⁿ⁺¹ = uⁿ.

    The diffusion equation is the reference's named next capability
    (StructuredDiffusionContext / FFTPrecDiffusionContext, reference
    ToDo.md:5-6) — same FV/FFT structure with the diffusive symbol.

    TPFA flux per face: ν·|F|·(u_other − u_cell)/d with d = ‖c_other −
    c_cell‖. Periodic faces use one SHARED pair distance d = ‖x_f − c_cell‖ +
    ‖x_f' − c_twin‖ (the two face-to-center legs across the wrap), so the
    unscaled flux coefficient ν|F|/d is identical on both sides of the pair —
    on warped meshes the one-sided doubled distance would differ per side and
    silently break the SPD form behind the CG stepper. Falls back to
    2·‖x_face − c_cell‖ when the mesh has no twin-face map.
    Boundary default: insulated (Neumann no-flux), Periodic honored like the
    transport assembly. L is symmetric positive semi-definite; constants are
    in its kernel (conservation) — asserted in tests/test_diffusion.py.
    """
    L = mesh.face_cells[:, 0]
    R = mesh.face_cells[:, 1]
    interior = R >= 0
    cc = mesh.cell_center[:, : mesh.dim]
    fc = mesh.face_center[:, : mesh.dim]

    cell = np.concatenate([L, R[interior]])
    other = np.concatenate([R, L[interior]])
    area = np.concatenate([mesh.face_area, mesh.face_area[interior]])
    group = np.concatenate([mesh.face_group, mesh.face_group[interior]])
    fctr = np.concatenate([fc, fc[interior]])
    twin = mesh.periodic_twin if mesh.periodic_twin is not None else np.full(mesh.n_faces, -1)
    twin_cell = np.concatenate([twin, np.full(int(interior.sum()), -1, dtype=np.int64)])

    is_boundary = other < 0
    rows, cols, vals = [], [], []

    m_int = ~is_boundary
    d = np.linalg.norm(cc[other[m_int]] - cc[cell[m_int]], axis=1)
    coef = dt * nu * area[m_int] / (d * mesh.cell_volume[cell[m_int]])
    rows += [cell[m_int], cell[m_int]]
    cols += [cell[m_int], other[m_int]]
    vals += [coef, -coef]

    if boundary == "auto" and mesh.periodic_twin is not None:
        per_code = mesh.groups.get("Periodic")
        if per_code is not None:
            m_per = is_boundary & (group == per_code) & (twin_cell >= 0)
            twin_face = getattr(mesh, "periodic_twin_face", None)
            face_idx = np.concatenate(
                [np.arange(mesh.n_faces), np.arange(mesh.n_faces)[interior]]
            )
            tf = (np.full(mesh.n_faces, -1, dtype=np.int64) if twin_face is None
                  else np.asarray(twin_face))[face_idx[m_per]]
            d_self = np.linalg.norm(fctr[m_per] - cc[cell[m_per]], axis=1)
            d_twin = np.where(
                tf >= 0,
                np.linalg.norm(fc[np.maximum(tf, 0)] - cc[twin_cell[m_per]], axis=1),
                d_self,  # no twin-face map: doubled one-sided distance
            )
            d = d_self + d_twin
            coef = dt * nu * area[m_per] / (d * mesh.cell_volume[cell[m_per]])
            rows += [cell[m_per], cell[m_per]]
            cols += [cell[m_per], twin_cell[m_per]]
            vals += [coef, -coef]
    # all other boundaries: no flux (insulated)

    n = mesh.n_cells
    return CSRMatrix.from_coo(
        n, n, np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), dtype=dtype
    )


def diffusion_stencil(dim: int, dt: float, nu: float, spacing_xyz):
    """Periodic-uniform-grid stencil {offset_zyx: coeff} of D = dt·ν·L —
    feeds BlockCirculantOperator/MatmulBlockCirculantSolver.from_stencil
    (m=1) for the FFT direct solve and the diffusion circulant PC."""
    h = np.asarray(spacing_xyz, dtype=np.float64)[:dim]
    lam = dt * nu / (h * h)  # xyz
    offsets, blocks = [], []
    diag = 2.0 * float(lam.sum())
    offsets.append((0,) * dim)
    blocks.append([[diag]])
    for d_xyz in range(dim):
        ax_zyx = dim - 1 - d_xyz
        for sgn in (+1, -1):
            off = [0] * dim
            off[ax_zyx] = sgn
            offsets.append(tuple(off))
            blocks.append([[-float(lam[d_xyz])]])
    return offsets, np.asarray(blocks)


def wave_jacobian_blocks(normal: np.ndarray, c0: float) -> tuple[np.ndarray, np.ndarray]:
    """Batched A(n) and |A|(n) for the linear wave system; normal (k, dim).

    Mirrors jacobianMatrices (WaveSystem.cxx:92-107) without the coeff factor.
    """
    k, dim = normal.shape
    A = np.zeros((k, dim + 1, dim + 1))
    absA = np.zeros((k, dim + 1, dim + 1))
    A[:, 1:, 0] = normal
    A[:, 0, 1:] = c0 * c0 * normal
    absA[:, 0, 0] = c0
    absA[:, 1:, 1:] = c0 * normal[:, :, None] * normal[:, None, :]
    return A, absA


def wave_divergence_bsr(
    mesh: Mesh,
    dt: float,
    c0: float,
    dtype=jnp.float32,
) -> BSRMatrix:
    """Block upwind divergence matrix for the wave system ((dim+1)² blocks).

    Boundary handling by group name: "Periodic" couples through the wrap,
    "Neumann" is a no-op, anything else gets the wall mirror condition —
    exactly the reference's precedence (WaveSystem.cxx:148-173).
    """
    dim = mesh.dim
    nb = dim + 1
    cell, other, normal, area, group, twin_cell = _face_sides(mesh)
    coeff = dt * area / mesh.cell_volume[cell]

    A, absA = wave_jacobian_blocks(normal, c0)
    Am = (A - absA) * (0.5 * coeff[:, None, None])

    brows, bcols, blocks = [], [], []
    is_boundary = other < 0

    m_int = ~is_boundary
    brows += [cell[m_int], cell[m_int]]
    bcols += [other[m_int], cell[m_int]]
    blocks += [Am[m_int], -Am[m_int]]

    per_code = mesh.groups.get("Periodic")
    neu_code = mesh.groups.get("Neumann")
    if per_code is not None and mesh.periodic_twin is not None:
        m_per = is_boundary & (group == per_code) & (twin_cell >= 0)
        brows += [cell[m_per], cell[m_per]]
        bcols += [twin_cell[m_per], cell[m_per]]
        blocks += [Am[m_per], -Am[m_per]]
    else:
        m_per = np.zeros_like(is_boundary)

    m_neu = is_boundary & (group == neu_code) if neu_code is not None else np.zeros_like(is_boundary)
    m_wall = is_boundary & ~m_per & ~m_neu
    if m_wall.any():
        nw = normal[m_wall]
        k = nw.shape[0]
        v = np.zeros((k, nb))
        v[:, 1:] = nw
        mirror = 2.0 * v[:, :, None] * v[:, None, :]  # 2 v vᵀ
        wall_block = -np.einsum("kij,kjl->kil", Am[m_wall], mirror)
        brows.append(cell[m_wall])
        bcols.append(cell[m_wall])
        blocks.append(wall_block)

    n = mesh.n_cells
    return BSRMatrix.from_block_coo(
        n, n, np.concatenate(brows), np.concatenate(bcols), np.concatenate(blocks), dtype=dtype
    )


def wave_block_stencil(dim: int, dt: float, c0: float, spacing) -> tuple[list, np.ndarray]:
    """Periodic-uniform-grid block stencil {offset_zyx: B} of I + D for the
    wave system — feeds BlockCirculantOperator (the block-circulant direct
    solver / preconditioner the reference aims at but never built).
    """
    nb = dim + 1
    h = np.asarray(spacing, dtype=np.float64)[:dim]
    offsets: list[tuple[int, ...]] = []
    blocks: list[np.ndarray] = []
    center = np.eye(nb)
    for d in range(dim):  # d is the xyz axis index
        for sgn in (+1.0, -1.0):
            e = np.zeros((1, dim))
            e[0, d] = sgn
            A, absA = wave_jacobian_blocks(e, c0)
            Am = 0.5 * (A[0] - absA[0]) * (dt / h[d])
            off = [0] * dim  # zyx offset: axis index (dim-1-d) in zyx order
            off[dim - 1 - d] = int(sgn)
            offsets.append(tuple(off))
            blocks.append(Am)
            center = center - Am
    offsets.append((0,) * dim)
    blocks.append(center)
    return offsets, np.stack(blocks)
