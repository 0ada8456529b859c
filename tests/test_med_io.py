"""MED writer round-trip tests (Field::writeMED analog, io/med_io.py)."""

import os

import numpy as np

from circulantpreconditioner_tpu.io import med_cell_order, read_med_field, write_med
from circulantpreconditioner_tpu.mesh import cartesian_mesh, read_med
from circulantpreconditioner_tpu.mesh.unstructured import tet_mesh


def test_structured_mesh_field_roundtrip(tmp_path):
    """Write a 3D structured mesh + 2-step field series; read both back with
    the same reader that loads the reference's fixtures."""
    m = cartesian_mesh(((0, 1),) * 3, (3, 2, 2))
    m.name = "box"
    u0 = np.arange(m.n_cells, dtype=np.float64)
    u1 = u0 * 2 + 1
    p = str(tmp_path / "out.med")
    write_med(p, m, {"T": u0}, time=0.0, it=0)
    write_med(p, m, {"T": u1}, time=0.5, it=1, append=True)

    m2 = read_med(p)
    m2.validate()
    assert m2.n_cells == m.n_cells
    np.testing.assert_allclose(np.sort(m2.cell_volume), np.sort(m.cell_volume), atol=1e-12)

    series = read_med_field(p, "T")
    assert [(it, t) for it, t, _ in series] == [(0, 0.0), (1, 0.5)]
    np.testing.assert_allclose(series[0][2][:, 0], u0)
    np.testing.assert_allclose(series[1][2][:, 0], u1)


def test_unstructured_tet_roundtrip(tmp_path):
    m = tet_mesh(((0, 1),) * 3, (2, 2, 2))
    m.name = "tets"
    vals = np.random.default_rng(0).random((m.n_cells, 4))  # 4-component field
    p = str(tmp_path / "tets.med")
    write_med(p, m, {"U": vals}, time=0.0, it=0)
    m2 = read_med(p)
    m2.validate()
    np.testing.assert_allclose(m2.cell_volume.sum(), 1.0, atol=1e-12)
    (it, t, back), = read_med_field(p, "U")
    order = med_cell_order(m)
    np.testing.assert_allclose(back, vals[order])
    np.testing.assert_allclose(order, np.arange(m.n_cells))  # homogeneous = identity


def test_mixed_cell_type_field_roundtrip(tmp_path):
    """Mixed TE4/PY5/HE8 mesh: read_med_field must concatenate the geometry
    blocks in the same vertex-count order med_cell_order documents, not
    alphabetically (HE8 < PE6 < PY5 < TE4 lexically would scramble values)."""

    class MixedMesh:
        name = "mixed"
        dim = 3
        is_structured = False
        points = np.array(
            [[float(i & 1), float((i >> 1) & 1), float(i >> 2)] for i in range(8)]
            + [[0.5, 0.5, 2.0]]
        )
        # interleave types so block reordering is non-trivial:
        # cell 0 = HE8, 1 = TE4, 2 = PY5, 3 = TE4
        cell_vertices = [
            [0, 1, 3, 2, 4, 5, 7, 6],
            [0, 1, 2, 4],
            [4, 5, 7, 6, 8],
            [1, 3, 2, 7],
        ]
        n_cells = 4

    m = MixedMesh()
    vals = np.random.default_rng(1).random((m.n_cells, 2))
    p = str(tmp_path / "mixed.med")
    write_med(p, m, {"U": vals}, time=0.0, it=0)
    (it, t, back), = read_med_field(p, "U")
    order = med_cell_order(m)
    # med order: TE4 block (cells 1,3), PY5 block (cell 2), HE8 block (cell 0)
    np.testing.assert_array_equal(order, [1, 3, 2, 0])
    np.testing.assert_allclose(back, vals[order])


def test_2d_structured_write(tmp_path):
    """2D QU4 write path (the reference's 50x50 default square)."""
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (5, 4))
    m.name = "sq"
    p = str(tmp_path / "sq.med")
    write_med(p, m, {"p": np.ones(m.n_cells)}, time=0.0, it=0)
    (it, t, back), = read_med_field(p, "p")
    assert back.shape == (20, 1)
    np.testing.assert_allclose(back[:, 0], 1.0)


def test_driver_writes_med_series(tmp_path):
    from circulantpreconditioner_tpu.drivers import wave_explicit

    wave_explicit.main(["8", "8", "--med", "--tmax", "0.001", "--ntmax", "3",
                        "--output-freq", "1", "--result-dir", str(tmp_path)])
    files = [f for f in os.listdir(tmp_path) if f.endswith(".med")]
    assert len(files) == 1
    series = read_med_field(str(tmp_path / files[0]), "pressure")
    assert len(series) >= 2  # t=0 plus at least one step
    for _, _, v in series:
        assert np.isfinite(v).all()


def test_2d_med_roundtrip_and_driver(tmp_path):
    """ESP=2 MED path: write a 2D square (QU4, the reference wave drivers'
    default 50x50 domain at small size), read it back through the ESP=2
    reader branch, check geometry, and run the explicit wave driver on the
    file — the reference's 2D `.med` acceptance
    (WaveSystem_SphericalExplosion_expl_seq.cxx:151-175)."""
    m = cartesian_mesh(((0.0, 1.0), (0.0, 1.0)), (6, 6))
    m.name = "square2d"
    p = str(tmp_path / "square2d.med")
    write_med(p, m, {"p": np.ones(m.n_cells)}, time=0.0, it=0)

    m2 = read_med(p)
    assert m2.dim == 2
    assert m2.n_cells == m.n_cells and m2.n_faces == m.n_faces
    np.testing.assert_allclose(np.sort(m2.cell_volume), np.sort(m.cell_volume), atol=1e-12)
    np.testing.assert_allclose(m2.cell_volume.sum(), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        m2.min_ratio_vol_surf(), m.min_ratio_vol_surf(), atol=1e-12)
    assert len(m2.boundary_faces()) == 4 * 6

    from circulantpreconditioner_tpu.drivers import wave_explicit

    res = wave_explicit.main(
        [p, "--tmax", "0.0001", "--ntmax", "3", "--result-dir", str(tmp_path)])
    assert np.isfinite(np.asarray(res.state)).all()


def test_2d_unstructured_triangle_roundtrip(tmp_path):
    """TR3 cells through the writer's 2D unstructured block mapping and the
    reader's ESP=2 branch."""
    from circulantpreconditioner_tpu.mesh.unstructured import build_mesh_from_cells_2d

    pts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.5]])
    cells = [(0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4)]
    m = build_mesh_from_cells_2d(pts, cells, name="tris")
    np.testing.assert_allclose(m.cell_volume.sum(), 1.0, atol=1e-14)
    p = str(tmp_path / "tris.med")
    write_med(p, m, {"u": np.arange(4.0)}, time=0.0, it=0)
    m2 = read_med(p)
    assert m2.dim == 2 and m2.n_cells == 4 and m2.n_faces == 8
    np.testing.assert_allclose(np.sort(m2.cell_volume), np.sort(m.cell_volume), atol=1e-14)
