"""Marching tetrahedra + welding tests against analytic distance fields
(mirrors test/test_marching.cpp: HostGenerator/SphereGenerator fixtures,
manifold verification of the output)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlsgpu_tpu.ops import marching, tables, weld
from mlsgpu_tpu.utils.manifold import check_manifold

CAPS = dict(cell_cap=1 << 14, vertex_cap=1 << 16, index_cap=3 << 16)


def run_block(field, region_cells=None, origin=(0, 0, 0), caps=CAPS):
    b = field.shape[0]
    if region_cells is None:
        region_cells = (b - 1,) * 3
    mesh = marching.generate(
        jnp.asarray(field),
        jnp.asarray(region_cells, jnp.int32),
        jnp.asarray(origin, jnp.int32), **caps)
    assert int(mesh.num_cells) <= caps["cell_cap"]
    assert int(mesh.num_vertices) <= caps["vertex_cap"]
    assert int(mesh.num_indices) <= caps["index_cap"]
    welded = weld.weld(mesh.vertices, mesh.key_hi, mesh.key_lo, mesh.triangles,
                       mesh.num_vertices, mesh.num_indices)
    nv = int(welded.num_vertices)
    ni = int(welded.num_indices)
    verts = np.asarray(welded.vertices)[:nv]
    tris = np.asarray(welded.triangles)[:ni // 3]
    keys = np.stack([np.asarray(welded.key_hi)[:nv],
                     np.asarray(welded.key_lo)[:nv]], axis=1)
    first_ext = int(welded.first_external)
    return verts, tris, keys, first_ext


def sphere_field(b, center, radius):
    g = np.arange(b, dtype=np.float64)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt((xx - center[0]) ** 2 + (yy - center[1]) ** 2
                + (zz - center[2]) ** 2) - radius
    return d.astype(np.float32)


class TestTables:
    def test_complement_symmetry(self):
        """code and ~code cut the same edges (reversed orientation)."""
        for code in range(256):
            np.testing.assert_array_equal(tables.COUNT_TABLE[code],
                                          tables.COUNT_TABLE[255 - code])
            np.testing.assert_array_equal(tables.VERT_TABLE[code],
                                          tables.VERT_TABLE[255 - code])

    def test_counts_match_tables(self):
        for code in range(256):
            nv, ni = tables.COUNT_TABLE[code]
            assert (tables.VERT_TABLE[code] >= 0).sum() == nv
            assert (tables.INDEX_TABLE[code] >= 0).sum() == ni
            inds = tables.INDEX_TABLE[code]
            assert np.all(inds[:ni] < nv)
            assert ni % 3 == 0

    def test_edges_cross_surface(self):
        """Every used edge must have endpoints on opposite sides."""
        for code in range(256):
            for e in tables.VERT_TABLE[code]:
                if e < 0:
                    continue
                v0, v1 = tables.EDGES[e]
                s0 = (code >> v0) & 1
                s1 = (code >> v1) & 1
                assert s0 != s1


class TestMarching:
    def test_sphere_is_closed_manifold(self):
        field = sphere_field(32, (15.5, 15.3, 15.8), 9.0)
        verts, tris, keys, first_ext = run_block(field)
        assert len(verts) > 100
        rep = check_manifold(verts, tris)
        assert rep.is_manifold, rep.reason
        assert rep.num_boundary_edges == 0       # fully inside the block
        assert rep.num_components == 1
        assert rep.euler_characteristics == [2]  # topological sphere
        # no external vertices (surface doesn't touch block faces)
        assert first_ext == len(verts)
        # vertices lie on the analytic sphere (within linear-interp error)
        r = np.linalg.norm(verts - np.array([15.5, 15.3, 15.8]), axis=1)
        assert np.abs(r - 9.0).max() < 0.15

    def test_orientation_outward(self):
        """Triangle normals must point toward positive field (outside)."""
        field = sphere_field(32, (15.5, 15.5, 15.5), 8.0)
        verts, tris, _, _ = run_block(field)
        c = np.array([15.5, 15.5, 15.5])
        p0, p1, p2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
        n = np.cross(p1 - p0, p2 - p0)
        outward = np.sum(n * (p0 - c), axis=1)
        assert np.all(outward > 0)

    def test_plane_boundary_and_externals(self):
        """A plane crossing the whole block: open sheet, boundary edges only
        on block faces, external vertices marked."""
        b = 16
        g = np.arange(b, dtype=np.float32)
        field = np.broadcast_to((g - 7.3)[:, None, None], (b, b, b)).copy()
        verts, tris, keys, first_ext = run_block(field)
        rep = check_manifold(verts, tris)
        assert rep.is_manifold, rep.reason
        assert rep.num_boundary_edges > 0
        assert rep.num_components == 1
        # externals exist and are exactly the ones with the flag bit
        assert first_ext < len(verts)
        ext_flag = (keys[:, 0] >> 31) == 1
        assert not ext_flag[:first_ext].any()
        assert ext_flag[first_ext:].all()
        # external vertices lie on block faces (x/y on 0 or top)
        ext_v = verts[first_ext:]
        on_face = np.zeros(len(ext_v), dtype=bool)
        for axis in range(3):
            on_face |= np.isclose(ext_v[:, axis], 0.0)
            on_face |= np.isclose(ext_v[:, axis], b - 1)
        assert on_face.all()

    def test_nan_corners_suppress_cells(self):
        field = sphere_field(16, (8, 8, 8), 5.0)
        field[:, :, :4] = np.nan  # undefined region
        verts, tris, _, _ = run_block(field)
        rep = check_manifold(verts, tris)
        assert rep.is_manifold, rep.reason
        assert rep.num_boundary_edges > 0  # sphere has a hole now
        # nothing generated strictly inside the NaN region
        assert len(verts) == 0 or verts[:, 0].min() >= 3.0

    def test_region_mask(self):
        field = sphere_field(32, (15.5, 15.5, 15.5), 9.0)
        full_v, full_t, _, _ = run_block(field)
        half_v, half_t, _, _ = run_block(field, region_cells=(31, 31, 15))
        assert len(half_v) < len(full_v)
        assert half_v[:, 2].max() <= 15.0 + 1e-6

    def test_key_offset_by_origin(self):
        """Global keys shift with the block's cell origin — the cross-block
        welding contract."""
        field = sphere_field(16, (8, 8, 8), 5.0)
        _, _, k0, _ = run_block(field, origin=(0, 0, 0))
        _, _, k1, _ = run_block(field, origin=(4, 0, 0))
        # doubled x coordinate sits in the low 21 bits of key_lo
        x0 = np.sort(k0[:, 1] & 0x1FFFFF)
        x1 = np.sort(k1[:, 1] & 0x1FFFFF)
        np.testing.assert_array_equal(x0 + 8, x1)

    def test_cross_block_key_match(self):
        """Two adjacent blocks sharing a face generate identical keys and
        bitwise-identical positions for shared-face vertices."""
        big = sphere_field(24, (11.5, 11.5, 11.5), 8.0)
        # Block A: cells [0,16) in x; Block B: cells [16,23). Blocks are
        # cubic on device; unused corners are NaN-padded.
        pad_a = np.full((24, 24, 24), np.nan, np.float32)
        pad_a[:, :, :17] = big[:, :, :17]
        pad_b = np.full((24, 24, 24), np.nan, np.float32)
        pad_b[:, :, :8] = big[:, :, 16:]
        va, ta, ka, fa = run_block(pad_a, region_cells=(16, 23, 23), origin=(0, 0, 0))
        vb, tb, kb, fb = run_block(pad_b, region_cells=(7, 23, 23), origin=(16, 0, 0))
        ext_a = {tuple(k) for k in ka[fa:]}
        ext_b = {tuple(k) for k in kb[fb:]}
        shared = ext_a & ext_b
        assert len(shared) > 10
        # positions agree exactly after shifting B into global frame
        pos_a = {tuple(k): va[fa + i] for i, k in enumerate(ka[fa:])}
        pos_b = {tuple(k): vb[fb + i] + np.array([16, 0, 0], np.float32)
                 for i, k in enumerate(kb[fb:])}
        for k in shared:
            np.testing.assert_array_equal(pos_a[k], pos_b[k])


class TestOverflow:
    def test_vertex_overflow_detected(self):
        field = sphere_field(32, (15.5, 15.5, 15.5), 12.0)
        mesh = marching.generate(
            jnp.asarray(field), jnp.asarray((31, 31, 31), jnp.int32),
            jnp.asarray((0, 0, 0), jnp.int32),
            cell_cap=64, vertex_cap=128, index_cap=384)
        assert int(mesh.num_cells) > 64  # host sees overflow and retries

    def test_true_totals_under_cell_overflow(self):
        """num_vertices/num_indices must report the TRUE requirement even
        when cell_cap itself overflows (a clamped report once let cap
        growth converge on still-too-small caps and ship a corrupt
        block)."""
        field = sphere_field(32, (15.5, 15.5, 15.5), 12.0)
        big = marching.generate(
            jnp.asarray(field), jnp.asarray((31, 31, 31), jnp.int32),
            jnp.asarray((0, 0, 0), jnp.int32),
            cell_cap=1 << 14, vertex_cap=1 << 16, index_cap=3 << 16)
        small = marching.generate(
            jnp.asarray(field), jnp.asarray((31, 31, 31), jnp.int32),
            jnp.asarray((0, 0, 0), jnp.int32),
            cell_cap=64, vertex_cap=128, index_cap=384)
        assert int(small.num_cells) == int(big.num_cells)
        assert int(small.num_vertices) == int(big.num_vertices)
        assert int(small.num_indices) == int(big.num_indices)

    def test_cap_beyond_f32_exact_bound_rejected(self):
        """Producer bases ride f32 lanes (exact to 2^24); caps past that
        must raise instead of silently corrupting triangle bases."""
        field = sphere_field(8, (3.5, 3.5, 3.5), 2.0)
        import pytest
        with pytest.raises(ValueError, match="2\\^24"):
            marching.generate(
                jnp.asarray(field), jnp.asarray((7, 7, 7), jnp.int32),
                jnp.asarray((0, 0, 0), jnp.int32),
                cell_cap=64, vertex_cap=1 << 24, index_cap=3 << 8)
        with pytest.raises(ValueError, match="2\\^24"):
            marching.generate(
                jnp.asarray(field), jnp.asarray((7, 7, 7), jnp.int32),
                jnp.asarray((0, 0, 0), jnp.int32),
                cell_cap=64, vertex_cap=1 << 8, index_cap=3 << 24)


class TestTiledClassify:
    """Tile-compacted classification (ops/marching._classify_tiled, the
    analogue of the reference's genOccupied compaction,
    kernels/marching.cl:84): bitwise-identical to the dense path whenever
    the candidate tiles fit, overflow reported via num_tiles."""

    def fields(self):
        sph = sphere_field(32, (15.5, 15.3, 15.8), 9.0)
        holed = sphere_field(24, (11.5, 11.5, 11.5), 8.0)
        holed[:, :, :5] = np.nan
        g = np.arange(16, dtype=np.float32)
        plane = np.broadcast_to((g - 7.3)[:, None, None], (16, 16, 16)).copy()
        sparse = np.full((32, 32, 32), np.nan, np.float32)
        sparse[4:12, 4:12, 4:12] = sphere_field(8, (3.5, 3.5, 3.5), 2.5)
        # 18 corners: cell count 17 is not a multiple of the 8-cell tile
        odd = sphere_field(18, (8.5, 8.5, 8.5), 6.0)
        return [(sph, (31, 31, 31)), (holed, (23, 23, 23)),
                (plane, (15, 15, 15)), (sparse, (31, 31, 31)),
                (odd, (17, 17, 17)), (sph, (31, 20, 13))]

    def test_bitwise_equals_dense(self):
        for field, region in self.fields():
            dense = marching.generate(
                jnp.asarray(field), jnp.asarray(region, jnp.int32),
                jnp.asarray((3, 5, 7), jnp.int32), **CAPS)
            tiled = marching.generate(
                jnp.asarray(field), jnp.asarray(region, jnp.int32),
                jnp.asarray((3, 5, 7), jnp.int32), **CAPS,
                tile_cap=1 << 10)
            assert int(tiled.num_cells) == int(dense.num_cells)
            assert int(tiled.num_vertices) == int(dense.num_vertices)
            assert int(tiled.num_indices) == int(dense.num_indices)
            np.testing.assert_array_equal(
                np.asarray(tiled.vertices).view(np.uint32),
                np.asarray(dense.vertices).view(np.uint32))
            np.testing.assert_array_equal(np.asarray(tiled.key_hi),
                                          np.asarray(dense.key_hi))
            np.testing.assert_array_equal(np.asarray(tiled.key_lo),
                                          np.asarray(dense.key_lo))
            np.testing.assert_array_equal(np.asarray(tiled.triangles),
                                          np.asarray(dense.triangles))

    def test_tile_overflow_reported(self):
        """tile_cap smaller than the candidate count: num_tiles reports the
        TRUE candidate count so the host grows the cap and retries."""
        field = sphere_field(32, (15.5, 15.5, 15.5), 9.0)
        tiled = marching.generate(
            jnp.asarray(field), jnp.asarray((31, 31, 31), jnp.int32),
            jnp.asarray((0, 0, 0), jnp.int32), **CAPS, tile_cap=2)
        assert int(tiled.num_tiles) > 2
        full = marching.generate(
            jnp.asarray(field), jnp.asarray((31, 31, 31), jnp.int32),
            jnp.asarray((0, 0, 0), jnp.int32), **CAPS, tile_cap=64)
        # every tile of the fully-finite field is a candidate
        assert int(full.num_tiles) == 64
        assert int(tiled.num_tiles) == 64

    def test_dense_path_reports_zero_tiles(self):
        field = sphere_field(16, (8, 8, 8), 5.0)
        mesh = marching.generate(
            jnp.asarray(field), jnp.asarray((15, 15, 15), jnp.int32),
            jnp.asarray((0, 0, 0), jnp.int32), **CAPS)
        assert int(mesh.num_tiles) == 0


class TestCodesReadback:
    """Codes-mode emission + native host rebuild vs the device mesh+weld
    path (the codes readback replaces the on-device weld of
    kernels/marching.cl:271-345 with _native.mls_rebuild_block)."""

    def _rebuild(self, field, origin=(0, 0, 0), region=None, caps=CAPS):
        import jax
        from mlsgpu_tpu import _native as nat
        from mlsgpu_tpu.ops.block import _pack_codes
        b = field.shape[0]
        region = region if region is not None else (b - 1,) * 3
        cmesh = marching.generate(
            jnp.asarray(field), jnp.asarray(region, jnp.int32),
            jnp.asarray(origin, jnp.int32), **caps, emit="codes")
        flat = np.asarray(jax.jit(
            _pack_codes, static_argnums=(1, 2))(
                cmesh, caps["cell_cap"], caps["vertex_cap"]))
        nc, nuw, ni = (int(cmesh.num_cells), int(cmesh.num_vertices),
                       int(cmesh.num_indices))
        out = nat.rebuild_block(flat, nc, nuw, ni, b - 1,
                                np.asarray(origin, np.int64),
                                np.asarray(region, np.int64))
        assert out is not None
        return out, (nc, nuw, ni)

    def test_matches_device_weld(self):
        from mlsgpu_tpu import _native as nat
        if not nat.available():
            pytest.skip("native library unavailable")
        field = sphere_field(32, (15.5, 15.3, 15.8), 9.0)
        origin = (64, 32, 0)
        (verts, tris, ext_keys, fe), (nc, nuw, ni) = self._rebuild(
            field, origin=origin)
        mverts, mtris, mkeys, mfe = run_block(field, origin=origin)

        # identical welded/external counts and triangle count
        assert len(verts) == len(mverts)
        assert fe == mfe
        assert len(tris) == len(mtris) == ni // 3

        # rebuild positions are GLOBAL; mesh-path verts are block-local
        mverts_g = mverts + np.asarray(origin, np.float32)
        # t16-quantized positions: match each rebuilt vertex to the nearest
        # device vertex within the quantization tolerance
        d = np.abs(verts[:, None, :] - mverts_g[None, :, :]).max(axis=2)
        nearest = d.min(axis=1)
        assert nearest.max() < 2e-4

        # external 63-bit weld keys agree as SETS (order differs: the host
        # rebuild uses first-occurrence order, the device weld key order)
        mk63 = (((mkeys[fe:, 0].astype(np.int64) & 0x7FFFFFFF) << 32)
                | mkeys[fe:, 1].astype(np.int64))
        assert set(int(k) for k in ext_keys) == set(int(k) for k in mk63)

        # the rebuilt mesh is the same closed manifold
        rep = check_manifold(verts, tris)
        assert rep.is_manifold, rep.reason
        assert rep.num_boundary_edges == 0

    def test_rebuild_deterministic(self):
        from mlsgpu_tpu import _native as nat
        if not nat.available():
            pytest.skip("native library unavailable")
        field = sphere_field(24, (11.5, 11.5, 11.5), 7.0)
        a, _ = self._rebuild(field)
        b, _ = self._rebuild(field)
        np.testing.assert_array_equal(a[0].view(np.uint32),
                                      b[0].view(np.uint32))
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])
        assert a[3] == b[3]

    def test_corrupt_buffer_raises(self):
        from mlsgpu_tpu import _native as nat
        if not nat.available():
            pytest.skip("native library unavailable")
        field = sphere_field(16, (8, 8, 8), 5.0)
        (_, _, _, _), (nc, nuw, ni) = self._rebuild(field)
        with pytest.raises(ValueError):
            # wrong unwelded count: emission replay must fail loudly
            from mlsgpu_tpu.ops.block import _pack_codes
            import jax
            cmesh = marching.generate(
                jnp.asarray(field), jnp.asarray((15, 15, 15), jnp.int32),
                jnp.asarray((0, 0, 0), jnp.int32), **CAPS, emit="codes")
            flat = np.asarray(jax.jit(
                _pack_codes, static_argnums=(1, 2))(
                    cmesh, CAPS["cell_cap"], CAPS["vertex_cap"]))
            nat.rebuild_block(flat, nc, max(nuw - 5, 0), ni, 15,
                              np.zeros(3, np.int64),
                              np.asarray((15, 15, 15), np.int64))
