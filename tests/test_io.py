"""I/O tests: binary backends, PLY header parsing / reader / writer round
trips (mirrors test/test_fast_ply.cpp with in-memory fakes)."""

import numpy as np
import pytest

from mlsgpu_tpu.io import binary, ply
from mlsgpu_tpu.utils.errors import FormatError

from tests import oracle


def make_ply_bytes(n=10, extra_prop=False, fmt="binary_little_endian",
                   order=None, seed=0):
    rng = np.random.default_rng(seed)
    order = order or ["x", "y", "z", "nx", "ny", "nz", "radius"]
    lines = ["ply", f"format {fmt} 1.0", "comment test data",
             f"element vertex {n}"]
    for p in order:
        lines.append(f"property float32 {p}")
    if extra_prop:
        lines.append("property float32 confidence")
    lines.append("end_header")
    header = ("\n".join(lines) + "\n").encode()
    ncols = len(order) + (1 if extra_prop else 0)
    data = rng.uniform(0.1, 10, size=(n, ncols)).astype("<f4")
    return header + data.tobytes(), data, order


class TestBinaryBackends:
    @pytest.mark.parametrize("kind", ["syscall", "mmap"])
    def test_reader(self, tmp_path, kind):
        p = tmp_path / "f.bin"
        p.write_bytes(bytes(range(100)))
        r = binary.make_reader(kind)
        r.open(str(p))
        assert r.size() == 100
        assert r.read(10, 5) == bytes(range(10, 15))
        r.close()

    def test_syscall_writer(self, tmp_path):
        p = tmp_path / "o.bin"
        w = binary.make_writer("syscall")
        w.open(str(p))
        w.resize(10)
        w.write(4, b"abcd")
        w.write(0, b"xy")
        w.close()
        data = p.read_bytes()
        assert data[0:2] == b"xy" and data[4:8] == b"abcd" and len(data) == 10

    def test_memory_writer(self):
        store = {}
        w = binary.MemoryWriter(store)
        w.open("out.ply")
        w.write(2, b"zz")
        assert bytes(store["out.ply"]) == b"\0\0zz"


class TestPlyReader:
    def test_read_roundtrip(self):
        raw, data, order = make_ply_bytes(n=50, extra_prop=True)
        r = ply.PlyReader("mem", smooth=2.0, max_radius=5.0,
                          reader=binary.MemoryReader(raw))
        assert len(r) == 50
        splats = r.read()
        np.testing.assert_allclose(splats[:, 0:3], data[:, 0:3], rtol=1e-6)
        np.testing.assert_allclose(splats[:, 4:7], data[:, 3:6], rtol=1e-6)
        expect_r = np.minimum(data[:, 6], 5.0) * 2.0
        np.testing.assert_allclose(splats[:, 3], expect_r, rtol=1e-6)
        np.testing.assert_allclose(splats[:, 7], 1 / expect_r ** 2, rtol=1e-5)

    def test_property_order_independent(self):
        raw, data, order = make_ply_bytes(
            order=["radius", "z", "y", "x", "nz", "ny", "nx"], seed=3)
        r = ply.PlyReader("mem", reader=binary.MemoryReader(raw))
        s = r.read()
        np.testing.assert_allclose(s[:, 0], data[:, 3], rtol=1e-6)  # x
        np.testing.assert_allclose(s[:, 3], data[:, 0], rtol=1e-6)  # radius

    def test_partial_range(self):
        raw, data, _ = make_ply_bytes(n=20)
        r = ply.PlyReader("mem", reader=binary.MemoryReader(raw))
        s = r.read(5, 9)
        assert len(s) == 4
        np.testing.assert_allclose(s[:, 0], data[5:9, 0], rtol=1e-6)

    @pytest.mark.parametrize("bad", [
        b"not a ply at all",
        b"ply\nformat ascii 1.0\nelement vertex 1\nproperty float32 x\nend_header\n",
    ])
    def test_bad_headers(self, bad):
        with pytest.raises(FormatError):
            ply.PlyReader("mem", reader=binary.MemoryReader(bad + b"\0" * 64))

    def test_missing_property(self):
        raw, _, _ = make_ply_bytes(order=["x", "y", "z", "nx", "ny", "nz"])
        with pytest.raises(FormatError):
            ply.PlyReader("mem", reader=binary.MemoryReader(raw))

    def test_big_endian_rejected(self):
        raw, _, _ = make_ply_bytes(fmt="binary_big_endian")
        with pytest.raises(FormatError):
            ply.PlyReader("mem", reader=binary.MemoryReader(raw))

    def test_truncated_file(self):
        raw, _, _ = make_ply_bytes(n=50)
        with pytest.raises(FormatError):
            ply.PlyReader("mem", reader=binary.MemoryReader(raw[:-40]))


class TestPlyWriter:
    def test_mesh_roundtrip(self, tmp_path):
        path = str(tmp_path / "mesh.ply")
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32)
        tris = np.array([[0, 1, 2], [1, 3, 2]])
        w = ply.PlyWriter(comments=["made by mlsgpu_tpu"])
        w.set_num_vertices(4)
        w.set_num_triangles(2)
        w.open(path)
        # write out of order / in pieces (thread-safe ranged writes)
        w.write_triangles(1, tris[1:])
        w.write_vertices(2, verts[2:])
        w.write_vertices(0, verts[:2])
        w.write_triangles(0, tris[:1])
        w.close()
        rv, rt = ply.read_mesh(path)
        np.testing.assert_array_equal(rv, verts)
        np.testing.assert_array_equal(rt, tris)

    def test_index_offset(self, tmp_path):
        path = str(tmp_path / "m2.ply")
        w = ply.PlyWriter()
        w.set_num_vertices(3)
        w.set_num_triangles(1)
        w.open(path)
        w.write_vertices(0, np.eye(3, dtype=np.float32))
        w.write_triangles(0, np.array([[0, 1, 2]]), offset=0)
        w.close()
        _, rt = ply.read_mesh(path)
        np.testing.assert_array_equal(rt, [[0, 1, 2]])

    def test_splat_ply_roundtrip(self, tmp_path):
        path = str(tmp_path / "pts.ply")
        rng = np.random.default_rng(5)
        splats = oracle.sphere_cloud([5, 5, 5], 3.0, 100, 0.5, rng)
        ply.write_splats_ply(path, splats)
        r = ply.PlyReader(path, smooth=1.0)
        back = r.read()
        r.close()
        np.testing.assert_allclose(back[:, :7], splats[:, :7], rtol=1e-6)


class TestStreamBackends:
    def test_stream_reader_roundtrip(self, tmp_path):
        p = tmp_path / "f.bin"
        data = bytes(range(256)) * 16
        p.write_bytes(data)
        r = binary.make_reader("stream")
        r.open(str(p))
        try:
            assert r.size() == len(data)
            assert r.read(100, 50) == data[100:150]
            assert r.read(0, 10) == data[:10]
        finally:
            r.close()

    def test_stream_writer_roundtrip(self, tmp_path):
        p = tmp_path / "o.bin"
        w = binary.make_writer("stream")
        w.open(str(p))
        w.resize(100)
        w.write(10, b"hello")
        w.write(0, b"AB")
        w.close()
        data = p.read_bytes()
        assert len(data) == 100
        assert data[10:15] == b"hello" and data[0:2] == b"AB"
