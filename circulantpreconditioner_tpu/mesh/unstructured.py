"""Unstructured mesh support: cell-vertex → face-major conversion + generators.

Replaces the reference's dependence on SOLVERLAB/MEDCoupling mesh loading
(`Mesh(filename.med)`) and the FVCA6 fixture families (meshes/README.md):
instead of shipping MED binaries we provide *generators* for the same three
families the reference benchmarks on — uniform hexahedra, tetrahedra (each
hex split into 6), and Kershaw-distorted hexahedra — plus a Gmsh `.msh`
(v2.2 ASCII) reader for external meshes.

The cell-vertex → face-major conversion (`build_mesh_from_cells`) extracts
shared faces by canonical vertex-set hashing, computes polygon areas/normals
by fan triangulation, orients normals outward of the first incident cell,
and derives cell volumes from the divergence theorem
V = (1/3)|Σ_f (c_f · n_f) A_f| — valid for arbitrary (star-shaped) polyhedra
including Kershaw cells. Everything is validated by Mesh.validate()'s
closure check.
"""

from __future__ import annotations

import numpy as np

from circulantpreconditioner_tpu.mesh.core import INTERIOR, Mesh

# local vertex numbering of the 6 quad faces of a hexahedron with vertices
# ordered (x fastest): 0:(0,0,0) 1:(1,0,0) 2:(1,1,0) 3:(0,1,0)
#                      4:(0,0,1) 5:(1,0,1) 6:(1,1,1) 7:(0,1,1)
_HEX_FACES = [
    (0, 3, 2, 1),  # z-
    (4, 5, 6, 7),  # z+
    (0, 1, 5, 4),  # y-
    (3, 7, 6, 2),  # y+
    (0, 4, 7, 3),  # x-
    (1, 2, 6, 5),  # x+
]

# 4 triangle faces of a tetrahedron (outward for positively-oriented tets)
_TET_FACES = [(1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1)]


def weld_points(points: np.ndarray, tol: float = 1e-9):
    """Merge duplicate nodes — the MEDCoupling mergeNodes analog the
    SOLVERLAB loader relies on. Returns (points, remap) with
    remap[old_id] = new_id, or (points, None) when every node is unique.

    Several reference fixtures store each cell with its OWN copies of shared
    vertices (3DKershawTetra1.med: 3865 nodes, only 2697 distinct
    coordinates). Face extraction matches faces by vertex-id sets, so
    without welding tens of thousands of interior faces stay unmatched and
    are silently treated as boundary — a wrong operator. Nodes are keyed on
    round(p / (tol·scale)): exact and near-exact duplicates merge, distinct
    mesh nodes (separated by ≫ tol·scale) never do.

    Two copies of one vertex whose float noise straddles a rounding-bin
    boundary land in different bins (ADVICE r4) — a cKDTree pass over the
    bin representatives catches those by true distance and merges them via
    union-find, so the weld is binning-artifact-free."""
    pts = np.asarray(points, dtype=np.float64)
    scale = float(np.abs(pts).max()) or 1.0
    key = np.round(pts / (tol * scale)).astype(np.int64)
    _, first_idx, inverse = np.unique(key, axis=0, return_index=True,
                                      return_inverse=True)
    inverse = inverse.reshape(-1)
    reps = pts[first_idx]
    # distance-true pass over the representatives: bin-straddling duplicates
    # are within tol·scale of each other but hashed apart
    from scipy.spatial import cKDTree

    pairs = cKDTree(reps).query_pairs(r=tol * scale, output_type="ndarray")
    if len(first_idx) == len(pts) and pairs.size == 0:
        return pts, None
    parent = np.arange(len(reps))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(a) for a in range(len(reps))])
    uniq, compact = np.unique(roots, return_inverse=True)
    return reps[uniq], compact[inverse].astype(np.int64)

# splitting of a hex into 6 tets (all positively oriented, shared diagonal 0-6)
_HEX_TO_TETS = [
    (0, 1, 2, 6),
    (0, 2, 3, 6),
    (0, 3, 7, 6),
    (0, 7, 4, 6),
    (0, 4, 5, 6),
    (0, 5, 1, 6),
]


def _polygon_area_normal_center(pts: np.ndarray):
    """Fan triangulation around the vertex centroid; returns (area, unit
    normal, area-weighted centroid). Works for planar and mildly non-planar
    quads (Kershaw)."""
    c = pts.mean(axis=0)
    total = np.zeros(3)
    center = np.zeros(3)
    k = len(pts)
    for i in range(k):
        a, b = pts[i], pts[(i + 1) % k]
        tri_n = 0.5 * np.cross(a - c, b - c)
        total += tri_n
        tri_area = np.linalg.norm(tri_n)
        center += tri_area * (a + b + c) / 3.0
    area = np.linalg.norm(total)
    if area < 1e-300:
        raise ValueError("degenerate face")
    return area, total / area, center / max(area, 1e-300)


def _fast_build_homogeneous(points, cells_arr, default_group, name):
    """Vectorized fast path for homogeneous hex/tet meshes: native (C++)
    face extraction when available (native/fvcore.cpp), NumPy hashing
    otherwise, and fully vectorized face geometry. The fan-triangulation
    area vector Σ ½(aᵢ−c)×(aᵢ₊₁−c) is independent of the fan point c, so
    padding triangles with a duplicated vertex is exact."""
    from circulantpreconditioner_tpu.native import extract_faces

    n_cells, nv = cells_arr.shape
    out = extract_faces(cells_arr)
    if out is None:
        # NumPy fallback: sorted-vertex-key dedup via lexsort
        table = _HEX_FACES if nv == 8 else _TET_FACES
        faces = np.concatenate([cells_arr[:, list(f)] for f in table], axis=0)
        if faces.shape[1] == 3:
            faces = np.concatenate([faces, np.full((len(faces), 1), -1, np.int64)], axis=1)
        owner = np.tile(np.arange(n_cells, dtype=np.int64), len(table))
        key = np.sort(faces, axis=1)
        order = np.lexsort(key.T[::-1])
        key_s, faces_s, owner_s = key[order], faces[order], owner[order]
        new = np.ones(len(key_s), dtype=bool)
        new[1:] = (key_s[1:] != key_s[:-1]).any(axis=1)
        fid = np.cumsum(new) - 1
        nF = int(fid[-1]) + 1 if len(fid) else 0
        fv = np.full((nF, 4), -1, dtype=np.int64)
        fc = np.full((nF, 2), -1, dtype=np.int64)
        first = new
        fv[fid[first]] = faces_s[first]
        fc[fid[first], 0] = owner_s[first]
        second = ~new
        if second.any():
            counts = np.bincount(fid, minlength=nF)
            if counts.max() > 2:
                raise ValueError("broken mesh: face shared by >2 cells")
            fc[fid[second], 1] = owner_s[second]
    else:
        fv, fc = out

    nF = len(fv)
    # geometry, vectorized: pad tri faces by repeating vertex 0.
    # Everything runs on per-COMPONENT contiguous (nF, 4)/(nF,) arrays:
    # stride-3 access over large buffers (np.cross, (..,3) slices) runs ~50×
    # slower than contiguous on this host, turning 64³ builds into minutes.
    fvp = fv.copy()
    pad = fvp[:, 3] < 0
    fvp[pad, 3] = fvp[pad, 0]
    comp = [np.ascontiguousarray(points[:, d]) for d in range(3)]
    Pc = [cd[fvp] for cd in comp]  # 3 × (nF, 4)
    cc = [p.mean(axis=1) for p in Pc]  # fan point (area indep. of it)
    bc = [p[:, [1, 2, 3, 0]] for p in Pc]
    d1 = [p - m[:, None] for p, m in zip(Pc, cc)]
    d2 = [p - m[:, None] for p, m in zip(bc, cc)]
    tri_n = [
        0.5 * (d1[1] * d2[2] - d1[2] * d2[1]),
        0.5 * (d1[2] * d2[0] - d1[0] * d2[2]),
        0.5 * (d1[0] * d2[1] - d1[1] * d2[0]),
    ]  # 3 × (nF, 4)
    total = [t.sum(axis=1) for t in tri_n]
    area = np.sqrt(total[0] ** 2 + total[1] ** 2 + total[2] ** 2)
    if (area < 1e-300).any():
        raise ValueError("degenerate face")
    normal_c = [t / area for t in total]
    tri_area = np.sqrt(tri_n[0] ** 2 + tri_n[1] ** 2 + tri_n[2] ** 2)  # (nF,4)
    tri_w = np.maximum(tri_area.sum(axis=1), 1e-300)
    center_c = [
        ((p + b_ + m[:, None]) / 3.0 * tri_area).sum(axis=1) / tri_w
        for p, b_, m in zip(Pc, bc, cc)
    ]

    centroid_c = [cd[cells_arr].mean(axis=1) for cd in comp]  # 3 × (nC,)
    fc0 = fc[:, 0]
    dot = sum(n_ * (ce - cen[fc0]) for n_, ce, cen in zip(normal_c, center_c, centroid_c))
    sign = np.where(dot < 0, -1.0, 1.0)
    normal_c = [n_ * sign for n_ in normal_c]

    cell_volume = np.zeros(n_cells)
    contrib = area * sum(c_ * n_ for c_, n_ in zip(center_c, normal_c)) / 3.0
    np.add.at(cell_volume, fc0, contrib)
    m2 = fc[:, 1] >= 0
    np.add.at(cell_volume, fc[m2, 1], -contrib[m2])

    normal = np.stack(normal_c, axis=1)
    center = np.stack(center_c, axis=1)
    cell_centroid = np.stack(centroid_c, axis=1)

    groups = {default_group: 1}
    face_group = np.where(fc[:, 1] < 0, 1, INTERIOR).astype(np.int32)
    mesh = Mesh(
        dim=3,
        cell_center=cell_centroid,
        cell_volume=cell_volume,
        face_cells=fc,
        face_normal=normal,
        face_area=area,
        face_center=center,
        face_group=face_group,
        groups=groups,
        periodic_twin=None,
        structured_shape=None,
        bounds=None,
        name=name,
    )
    mesh.points = points  # type: ignore[attr-defined]
    mesh.cell_vertices = [tuple(r) for r in cells_arr]  # type: ignore[attr-defined]
    mesh.face_vertices = fv  # type: ignore[attr-defined]  # (nF,4) int64, -1 pad
    return mesh


def build_mesh_from_cells(
    points: np.ndarray,  # (nV, 3) (or (nV, dim))
    cells: list[tuple[int, ...]],  # vertex tuples per cell
    cell_faces: list[list[tuple[int, ...]]] | None = None,  # local face defs per cell
    default_group: str = "Wall",
    name: str = "unstructured",
) -> Mesh:
    """Generic converter. If `cell_faces` is None, cells are assumed hexes
    (8 vertices) or tets (4 vertices) and the canonical face tables used.
    Homogeneous hex/tet meshes take the vectorized/native fast path."""
    points = np.asarray(points, dtype=np.float64)
    dim = points.shape[1]
    if dim == 2:
        points = np.concatenate([points, np.zeros((len(points), 1))], axis=1)

    n_cells = len(cells)
    if cell_faces is None and n_cells:
        sizes = {len(c) for c in cells}
        if sizes in ({4}, {8}):
            return _fast_build_homogeneous(
                points, np.asarray(cells, dtype=np.int64), default_group, name
            )
    face_map: dict[tuple[int, ...], int] = {}
    f_vertices: list[tuple[int, ...]] = []
    f_cells: list[list[int]] = []

    for ci, cv in enumerate(cells):
        if cell_faces is not None:
            local = cell_faces[ci]
        elif len(cv) == 8:
            local = _HEX_FACES
        elif len(cv) == 4:
            local = _TET_FACES
        else:
            raise ValueError(f"cell {ci}: unsupported vertex count {len(cv)}")
        for lf in local:
            gv = tuple(cv[i] for i in lf)
            key = tuple(sorted(gv))
            j = face_map.get(key)
            if j is None:
                face_map[key] = len(f_vertices)
                f_vertices.append(gv)
                f_cells.append([ci])
            else:
                f_cells[j].append(ci)

    nF = len(f_vertices)
    face_cells = np.full((nF, 2), -1, dtype=np.int64)
    face_normal = np.zeros((nF, 3))
    face_area = np.zeros(nF)
    face_center = np.zeros((nF, 3))

    # cell centroids (vertex mean — adequate for orientation tests)
    cell_centroid = np.array([points[list(cv)].mean(axis=0) for cv in cells])

    for f, (gv, cl) in enumerate(zip(f_vertices, f_cells)):
        if len(cl) > 2:
            raise ValueError(f"face {f} shared by {len(cl)} cells — broken mesh")
        area, nrm, ctr = _polygon_area_normal_center(points[list(gv)])
        c0 = cl[0]
        if np.dot(nrm, ctr - cell_centroid[c0]) < 0:
            nrm = -nrm
        face_cells[f, 0] = c0
        if len(cl) == 2:
            face_cells[f, 1] = cl[1]
        face_normal[f] = nrm
        face_area[f] = area
        face_center[f] = ctr

    # cell volumes via divergence theorem over each cell's faces
    cell_volume = np.zeros(n_cells)
    for f in range(nF):
        contrib = face_area[f] * np.dot(face_center[f], face_normal[f]) / 3.0
        cell_volume[face_cells[f, 0]] += contrib
        if face_cells[f, 1] >= 0:
            cell_volume[face_cells[f, 1]] -= contrib

    groups = {default_group: 1}
    face_group = np.where(face_cells[:, 1] < 0, 1, INTERIOR).astype(np.int32)

    cell_center = np.zeros((n_cells, 3))
    # volume-consistent centroid: mean of area-weighted face centroids is a
    # decent approximation; keep vertex centroid (used only for ICs/plots)
    cell_center[:] = cell_centroid

    mesh = Mesh(
        dim=3,
        cell_center=cell_center[:, :3],
        cell_volume=cell_volume,
        face_cells=face_cells,
        face_normal=face_normal,
        face_area=face_area,
        face_center=face_center,
        face_group=face_group,
        groups=groups,
        periodic_twin=None,
        structured_shape=None,
        bounds=None,
        name=name,
    )
    mesh.points = points  # type: ignore[attr-defined]
    mesh.cell_vertices = cells  # type: ignore[attr-defined]
    mesh.face_vertices = f_vertices  # type: ignore[attr-defined]  # list of tuples
    return mesh


def build_mesh_from_cells_2d(
    points: np.ndarray,  # (nV, 2) or (nV, 3) with z ignored
    cells: list[tuple[int, ...]],  # ordered polygon vertex tuples per cell
    default_group: str = "Wall",
    name: str = "unstructured2d",
) -> Mesh:
    """2D counterpart of build_mesh_from_cells: polygon cells (TR3/QU4/...)
    whose "faces" are edges. Covers the reference drivers' 2D `.med` branch
    (SOLVERLAB Mesh(file.med) is dimension-generic; the 50x50 square is the
    reference wave drivers' default, WaveSystem_SphericalExplosion_expl_seq.cxx:151-175).
    Edge measure = length, normal = in-plane outward unit, cell volume =
    shoelace polygon area."""
    points = np.asarray(points, dtype=np.float64)[:, :2]

    face_map: dict[tuple[int, int], int] = {}
    f_vertices: list[tuple[int, int]] = []
    f_cells: list[list[int]] = []
    for ci, cv in enumerate(cells):
        k = len(cv)
        for a in range(k):
            gv = (cv[a], cv[(a + 1) % k])
            key = (min(gv), max(gv))
            j = face_map.get(key)
            if j is None:
                face_map[key] = len(f_vertices)
                f_vertices.append(gv)
                f_cells.append([ci])
            else:
                f_cells[j].append(ci)

    n_cells = len(cells)
    cell_centroid = np.array([points[list(cv)].mean(axis=0) for cv in cells])
    cell_volume = np.array([
        0.5 * abs(sum(
            points[cv[a], 0] * points[cv[(a + 1) % len(cv)], 1]
            - points[cv[(a + 1) % len(cv)], 0] * points[cv[a], 1]
            for a in range(len(cv))
        ))
        for cv in cells
    ])

    nF = len(f_vertices)
    face_cells = np.full((nF, 2), -1, dtype=np.int64)
    face_normal = np.zeros((nF, 2))
    face_area = np.zeros(nF)
    face_center = np.zeros((nF, 2))
    for f, (gv, cl) in enumerate(zip(f_vertices, f_cells)):
        if len(cl) > 2:
            raise ValueError(f"edge {f} shared by {len(cl)} cells — broken mesh")
        p0, p1 = points[gv[0]], points[gv[1]]
        t = p1 - p0
        L = float(np.hypot(*t))
        nrm = np.array([t[1], -t[0]]) / L
        ctr = 0.5 * (p0 + p1)
        c0 = cl[0]
        if np.dot(nrm, ctr - cell_centroid[c0]) < 0:
            nrm = -nrm
        face_cells[f, 0] = c0
        if len(cl) == 2:
            face_cells[f, 1] = cl[1]
        face_normal[f] = nrm
        face_area[f] = L
        face_center[f] = ctr

    groups = {default_group: 1}
    face_group = np.where(face_cells[:, 1] < 0, 1, INTERIOR).astype(np.int32)
    mesh = Mesh(
        dim=2,
        cell_center=cell_centroid,
        cell_volume=cell_volume,
        face_cells=face_cells,
        face_normal=face_normal,
        face_area=face_area,
        face_center=face_center,
        face_group=face_group,
        groups=groups,
        periodic_twin=None,
        structured_shape=None,
        bounds=None,
        name=name,
    )
    mesh.points = points  # type: ignore[attr-defined]
    mesh.cell_vertices = cells  # type: ignore[attr-defined]
    mesh.face_vertices = f_vertices  # type: ignore[attr-defined]
    return mesh


def _hex_grid_points_cells(bounds, n, warp=None):
    nx, ny, nz = n
    bounds = np.asarray(bounds, dtype=np.float64).reshape(3, 2)
    xs = [np.linspace(bounds[d, 0], bounds[d, 1], n[d] + 1) for d in range(3)]
    Z, Y, X = np.meshgrid(xs[2], xs[1], xs[0], indexing="ij")
    pts = np.stack([X.reshape(-1), Y.reshape(-1), Z.reshape(-1)], axis=1)
    if warp is not None:
        pts = warp(pts)

    def vid(i, j, k):
        return (k * (ny + 1) + j) * (nx + 1) + i

    cells = []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                cells.append(
                    (
                        vid(i, j, k), vid(i + 1, j, k), vid(i + 1, j + 1, k), vid(i, j + 1, k),
                        vid(i, j, k + 1), vid(i + 1, j, k + 1), vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1),
                    )
                )
    return pts, cells


def hex_mesh(bounds, n, name=None) -> Mesh:
    """Uniform hexahedra as an *unstructured* mesh (FVCA6 'mesh_hexa' family,
    meshes/README.md:16-19) — exercises the generic face-extraction path."""
    pts, cells = _hex_grid_points_cells(bounds, n)
    m = build_mesh_from_cells(pts, cells, name=name or f"hexa_{'x'.join(map(str, n))}")
    m.topology_shape = tuple(int(v) for v in n)  # type: ignore[attr-defined]
    return m


def tet_mesh(bounds, n, name=None) -> Mesh:
    """Each hex split into 6 tetrahedra (FVCA6 'gentle tetrahedra' analog,
    meshes/README.md:23-26)."""
    pts, hexes = _hex_grid_points_cells(bounds, n)
    cells = [tuple(h[i] for i in tet) for h in hexes for tet in _HEX_TO_TETS]
    m = build_mesh_from_cells(pts, cells, name=name or f"tetra_{'x'.join(map(str, n))}")
    # hex-major numbering: 6 tets per hex = one SITE of the (nx,ny,nz) grid —
    # unlocks the gather-free supercell stencil SpMV
    m.topology_shape = tuple(int(v) for v in n)  # type: ignore[attr-defined]
    m.cells_per_site = 6  # type: ignore[attr-defined]
    return m


def kershaw_tet_mesh(bounds, n, eps: float = 0.3, name=None) -> Mesh:
    """Kershaw-warped hexahedra split into 6 tets each — the generated
    analog of the reference's 3DKershawTetra family
    (/root/reference/meshes/README.md:30-33), whose top rung
    (KershawTetra3, 766,976 tets) is an absent large blob in the snapshot.
    6·50³ = 750,000 tets ≈ that rung. Keeps the hex-major supercell
    numbering (topology_shape + cells_per_site=6), so the fast supercell
    stencil SpMV applies; the fixture-like welded/RCM windowed route is
    exercised on the real KershawTetra fixtures instead."""
    warp = _kershaw_warp(bounds, eps)
    pts, hexes = _hex_grid_points_cells(bounds, n, warp=warp)
    cells = [tuple(h[i] for i in tet) for h in hexes for tet in _HEX_TO_TETS]
    m = build_mesh_from_cells(
        pts, cells, name=name or f"kershawtet_{'x'.join(map(str, n))}")
    m.topology_shape = tuple(int(v) for v in n)  # type: ignore[attr-defined]
    m.cells_per_site = 6  # type: ignore[attr-defined]
    return m


def _kershaw_warp(bounds, eps: float):
    bounds = np.asarray(bounds, dtype=np.float64).reshape(3, 2)
    lo, hi = bounds[:, 0], bounds[:, 1]

    def warp(pts):
        # normalize to unit cube
        u = (pts - lo) / (hi - lo)
        x, y, z = u[:, 0], u[:, 1], u[:, 2]
        # kinked shear: triangular wave in x and y scales the z displacement.
        # zn = z + a·sin(2πz)/π has slope 1 + 2a·cos(2πz) ≥ 1 − 2·amp_max =
        # eps > 0, so the map is strictly monotone in z and cells never fold
        # (inverted cells at n ≥ 12 were the failure mode of a steeper
        # profile) — valid at every resolution like the true Kershaw family.
        tri = lambda t: 1.0 - 2.0 * np.abs(t - np.floor(t + 0.5))
        amp = 0.5 * (1.0 - eps) * tri(2 * x) * tri(2 * y)
        zn = z + amp * np.sin(2 * np.pi * z) / np.pi
        out = u.copy()
        out[:, 2] = zn
        return lo + out * (hi - lo)

    return warp


def kershaw_mesh(bounds, n, eps: float = 0.3, name=None) -> Mesh:
    """Kershaw-distorted hexahedra (FVCA6 'Kershaw' family analog,
    meshes/README.md:30-40): the z coordinate is sheared by a kinked profile
    whose amplitude depends on (x, y), producing the classic zig-zag layers
    that break mesh-aligned solvers. eps ∈ (0,1] controls severity (1 =
    uniform, smaller = more distorted)."""
    warp = _kershaw_warp(bounds, eps)
    pts, cells = _hex_grid_points_cells(bounds, n, warp=warp)
    m = build_mesh_from_cells(pts, cells, name=name or f"kershaw_{'x'.join(map(str, n))}")
    # geometry is warped but the topology is still the (nx,ny,nz) grid —
    # unlocks the gather-free VaryingStencilOperator SpMV path
    m.topology_shape = tuple(int(v) for v in n)  # type: ignore[attr-defined]
    return m


def read_gmsh(path: str, name=None) -> Mesh:
    """Minimal Gmsh MSH 2.2 ASCII reader: nodes + 3D elements (tet type 4,
    hex type 5). Replaces the reference's MED loader for external meshes."""
    with open(path) as fh:
        lines = iter(fh.read().splitlines())
    nodes = {}
    cells = []
    for line in lines:
        if line.strip() == "$Nodes":
            count = int(next(lines))
            for _ in range(count):
                parts = next(lines).split()
                nodes[int(parts[0])] = [float(parts[1]), float(parts[2]), float(parts[3])]
        elif line.strip() == "$Elements":
            count = int(next(lines))
            for _ in range(count):
                parts = next(lines).split()
                etype = int(parts[1])
                ntags = int(parts[2])
                conn = [int(v) for v in parts[3 + ntags:]]
                if etype == 4:  # tet
                    cells.append(tuple(conn))
                elif etype == 5:  # hex
                    cells.append(tuple(conn))
    ids = sorted(nodes)
    remap = {v: i for i, v in enumerate(ids)}
    points = np.array([nodes[v] for v in ids])
    cells = [tuple(remap[v] for v in c) for c in cells]
    points, weld = weld_points(points)  # per-cell duplicated vertices (see weld_points)
    if weld is not None:
        cells = [tuple(int(weld[v]) for v in c) for c in cells]
    m = build_mesh_from_cells(points, cells, name=name or path)
    m.welded_nodes = weld is not None  # type: ignore[attr-defined]
    return m
