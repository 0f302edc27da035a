"""Tests for the general offline PLY reader (tools/plyio.py — the
reference extras/ply.{h,cpp} analogue: ascii + both endiannesses, arbitrary
property order/types, list properties)."""

import numpy as np
import pytest

from mlsgpu_tpu.tools import plyio
from mlsgpu_tpu.utils.errors import FormatError


def _mesh_arrays():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     dtype=np.float32)
    tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]],
                    dtype=np.int32)
    return verts, tris


def _write_ascii_mesh(path, verts, tris):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment made by hand\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def _write_binary_mesh(path, verts, tris, bo):
    with open(path, "wb") as f:
        endian = ("binary_little_endian" if bo == "<"
                  else "binary_big_endian")
        f.write((f"ply\nformat {endian} 1.0\n"
                 f"element vertex {len(verts)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 f"element face {len(tris)}\n"
                 "property list uchar uint vertex_indices\n"
                 "end_header\n").encode())
        f.write(np.asarray(verts, bo + "f4").tobytes())
        rec = np.empty(len(tris), dtype=[("n", "u1"), ("i", bo + "u4", (3,))])
        rec["n"] = 3
        rec["i"] = tris
        f.write(rec.tobytes())


@pytest.mark.parametrize("kind", ["ascii", "le", "be"])
def test_read_mesh_any_formats(tmp_path, kind):
    verts, tris = _mesh_arrays()
    path = str(tmp_path / f"mesh_{kind}.ply")
    if kind == "ascii":
        _write_ascii_mesh(path, verts, tris)
    else:
        _write_binary_mesh(path, verts, tris, "<" if kind == "le" else ">")
    v, t = plyio.read_mesh_any(path)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(t, tris)


def test_read_splats_ascii_reordered(tmp_path):
    """ascii with radius before position, plus an extra property."""
    path = str(tmp_path / "pts.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float radius\nproperty float x\n"
                "property float y\nproperty float z\n"
                "property float nx\nproperty float ny\nproperty float nz\n"
                "property uchar quality_flag\nend_header\n")
        f.write("0.5 1 2 3 0 0 1 7\n")
        f.write("0.25 -1 0 1 1 0 0 9\n")
    s = plyio.read_splats_any(path, smooth=2.0)
    assert s.shape == (2, 8)
    np.testing.assert_allclose(s[0, 0:3], [1, 2, 3])
    np.testing.assert_allclose(s[:, 3], [1.0, 0.5])  # radius * smooth
    np.testing.assert_allclose(s[1, 4:7], [1, 0, 0])


def test_big_endian_scalars(tmp_path):
    path = str(tmp_path / "be.ply")
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_big_endian 1.0\n"
                b"element vertex 3\n"
                b"property double x\nproperty float y\nproperty short z\n"
                b"end_header\n")
        rec = np.empty(3, dtype=[("x", ">f8"), ("y", ">f4"), ("z", ">i2")])
        rec["x"] = [1.5, 2.5, 3.5]
        rec["y"] = [10, 20, 30]
        rec["z"] = [-1, -2, -3]
        f.write(rec.tobytes())
    els = plyio.read_ply(path)
    v = els["vertex"]
    np.testing.assert_allclose(v["x"], [1.5, 2.5, 3.5])
    np.testing.assert_allclose(v["y"], [10, 20, 30])
    np.testing.assert_array_equal(v["z"], [-1, -2, -3])


def test_ragged_lists_binary(tmp_path):
    path = str(tmp_path / "ragged.ply")
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element face 2\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n")
        f.write(bytes([3]) + np.array([0, 1, 2], "<i4").tobytes())
        f.write(bytes([4]) + np.array([0, 1, 2, 3], "<i4").tobytes())
    els = plyio.read_ply(path)
    rows = els["face"]["vertex_indices"]
    assert isinstance(rows, list) and len(rows) == 2
    np.testing.assert_array_equal(rows[0], [0, 1, 2])
    np.testing.assert_array_equal(rows[1], [0, 1, 2, 3])


def test_quad_mesh_rejected(tmp_path):
    path = str(tmp_path / "quad.ply")
    _write_ascii_mesh(path, *_mesh_arrays())
    with open(path) as f:
        text = f.read()
    text = text.replace("3 0 2 1", "4 0 2 1 3")
    with open(path, "w") as f:
        f.write(text)
    with pytest.raises(FormatError):
        plyio.read_mesh_any(path)


def test_truncated_binary_raises(tmp_path):
    verts, tris = _mesh_arrays()
    path = str(tmp_path / "trunc.ply")
    _write_binary_mesh(path, verts, tris, "<")
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-10])
    with pytest.raises(FormatError):
        plyio.read_ply(path)


def test_plymanifold_accepts_ascii(tmp_path, capsys):
    from mlsgpu_tpu.tools import plymanifold
    verts, tris = _mesh_arrays()
    path = str(tmp_path / "tetra.ply")
    _write_ascii_mesh(path, verts, tris)
    assert plymanifold.main([path]) == 0
    out = capsys.readouterr().out
    assert "manifold" in out and "4 vertices" in out


def test_plypntcat_mixed_formats(tmp_path, capsys):
    from mlsgpu_tpu.io.ply import write_splats_ply, PlyReader
    from mlsgpu_tpu.tools import plypntcat
    rng = np.random.default_rng(3)
    a = np.zeros((5, 8), np.float32)
    a[:, 0:3] = rng.random((5, 3))
    a[:, 3] = 0.1
    a[:, 6] = 1.0
    a[:, 7] = 1.0
    fast = str(tmp_path / "fast.ply")
    write_splats_ply(fast, a)
    ascii_path = str(tmp_path / "a.ply")
    with open(ascii_path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 1\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float nx\nproperty float ny\nproperty float nz\n"
                "property float radius\nend_header\n"
                "5 6 7 0 0 1 0.5\n")
    out = str(tmp_path / "cat.ply")
    assert plypntcat.main([fast, ascii_path, "-o", out]) == 0
    r = PlyReader(out, smooth=1.0)
    got = r.read()
    r.close()
    assert len(got) == 6
    np.testing.assert_allclose(got[5, 0:3], [5, 6, 7])
    np.testing.assert_allclose(got[5, 3], 0.5)


def test_draw_timeplot(tmp_path, capsys):
    from mlsgpu_tpu.tools import draw_timeplot
    trace = tmp_path / "trace.txt"
    trace.write_text(
        "EVENT loader load 0.0 1.5\n"
        "EVENT loader load 2.0 3.0\n"
        "EVENT device compute 0.5 2.5\n"
        "EVENT device pack 2.5 2.9\n"
        "garbage line\n")
    out = tmp_path / "trace.svg"
    assert draw_timeplot.main([str(trace), "-o", str(out)]) == 0
    svg = out.read_text()
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
    assert "loader" in svg and "compute" in svg
    assert svg.count("<rect") >= 4
