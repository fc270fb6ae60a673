"""I/O round-trips and bundled-fixture loading."""

import numpy as np

from kss_icp_tpu.io.formats import (
    load_off,
    load_ply,
    load_points,
    load_xyz,
    save_ply,
    save_xyz,
)


def test_xyz_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3))
    p = tmp_path / "a.xyz"
    save_xyz(p, pts)
    out = load_xyz(p)
    np.testing.assert_allclose(out, pts, rtol=1e-4, atol=1e-6)


def test_save_xyz_truncates_not_appends(tmp_path, rng):
    """Fix over the reference's ios::app duplicate-append (SURVEY.md §5.4)."""
    pts = rng.normal(size=(10, 3))
    p = tmp_path / "b.xyz"
    save_xyz(p, pts)
    save_xyz(p, pts)
    assert load_xyz(p).shape == (10, 3)


def test_ply_binary_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(77, 3)).astype(np.float32)
    p = tmp_path / "c.ply"
    save_ply(p, pts)
    out = load_ply(p)
    np.testing.assert_allclose(out, pts, atol=1e-7)


def test_ply_ascii(tmp_path):
    p = tmp_path / "d.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float confidence\n"
        "end_header\n"
        "1 2 3 0.5\n4 5 6 0.7\n"
    )
    out = load_ply(p)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


def test_off(tmp_path):
    p = tmp_path / "e.off"
    p.write_text("OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    out = load_off(p)
    assert out.shape == (3, 3)
    np.testing.assert_allclose(out[1], [1, 0, 0])


def test_obj(tmp_path):
    p = tmp_path / "f.obj"
    p.write_text("# comment\nv 1 2 3\nvn 0 0 1\nv 4 5 6\nf 1 2\n")
    out = load_points(p)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


def test_bundled_gird_and_wlop(reference_data_dir):
    gird = load_points(reference_data_dir / "registration" / "Bunny.gird")
    assert gird.shape == (2813, 3)  # count recorded in the file header
    wlop = load_points(reference_data_dir / "registration" / "Bunny.wlop")
    assert wlop.shape[1] == 3 and wlop.shape[0] >= 4000


def test_bundled_off(reference_data_dir):
    off = load_points(reference_data_dir.parent / "Remesh" / "Advancing" / "Bunnyg.off")
    assert off.shape == (3951, 3)


def test_bundled_normal_cache(reference_data_dir):
    from kss_icp_tpu.io.formats import load_normals

    n = load_normals(reference_data_dir / "registration" / "Bunny.normal")
    assert n.shape == (35947, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-2)


def test_load_ply_vertex_data_normals_colors(tmp_path):
    """Full CPLYLoader surface: x y z nx ny nz r g b per vertex."""
    from kss_icp_tpu.io.formats import load_ply_vertex_data

    ply = tmp_path / "full.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
        "0 0 0 0 0 1 255 0 0\n"
        "1 2 3 1 0 0 0 255 0\n"
    )
    d = load_ply_vertex_data(ply)
    np.testing.assert_allclose(d["points"], [[0, 0, 0], [1, 2, 3]])
    np.testing.assert_allclose(d["normals"], [[0, 0, 1], [1, 0, 0]])
    np.testing.assert_allclose(d["colors"], [[255, 0, 0], [0, 255, 0]])


def test_load_ply_vertex_data_points_only(tmp_path):
    from kss_icp_tpu.io.formats import load_ply_vertex_data, save_ply

    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    p = tmp_path / "min.ply"
    save_ply(p, pts)
    d = load_ply_vertex_data(p)
    np.testing.assert_allclose(d["points"], pts, atol=1e-6)
    assert "normals" not in d and "colors" not in d


def test_ply_mesh_roundtrip_all_formats(tmp_path, rng):
    """load_mesh('x.ply') returns (V, F) with PlyLoad.cpp:118-172 semantics
    across ascii / binary LE / binary BE bodies (VERDICT r3 item 7)."""
    from kss_icp_tpu.io.formats import load_mesh

    pts = rng.normal(size=(20, 3)).astype(np.float32)
    tris = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]], np.int64)
    for fmt in ("ascii", "binary_little_endian", "binary_big_endian"):
        p = tmp_path / f"mesh_{fmt}.ply"
        save_ply(p, pts, faces=tris, fmt=fmt)
        v, f = load_mesh(p)
        np.testing.assert_allclose(v, pts, atol=1e-6)
        np.testing.assert_array_equal(f, tris)
        # The point loader must still read the vertices past a face element.
        np.testing.assert_allclose(load_ply(p), pts, atol=1e-6)


def test_ply_mesh_fan_triangulation(tmp_path):
    """A quad face fan-triangulates exactly like the reference's (0,t,t+1)
    loop (PlyLoad.cpp:150-171)."""
    from kss_icp_tpu.io.formats import load_mesh

    p = tmp_path / "quad.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    v, f = load_mesh(p)
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


def test_ply_big_endian_points(tmp_path, rng):
    pts = rng.normal(size=(15, 3)).astype(np.float32)
    p = tmp_path / "be.ply"
    save_ply(p, pts, fmt="binary_big_endian")
    np.testing.assert_allclose(load_ply(p), pts, atol=1e-7)


def test_measure_mesh_consumes_ply(tmp_path):
    """measure_mesh works end-to-end on a PLY mesh (VERDICT r3 missing #4)."""
    from kss_icp_tpu.io.formats import load_mesh
    from kss_icp_tpu.measure_mesh import mesh_angle_report

    pts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    p = tmp_path / "mm.ply"
    save_ply(p, pts, faces=tris)
    v, f = load_mesh(p)
    stats = mesh_angle_report(v, f)
    assert stats["count"] == 6 and float(stats["min"]) > 0
