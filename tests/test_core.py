"""Tests for the core data model: Grid (invariant rounding, subgrid — mirrors
test/test_grid.cpp), SplatArray, Morton codes."""

import numpy as np
import pytest

from mlsgpu_tpu.core.grid import Grid
from mlsgpu_tpu.core.splat import SplatArray, decode_raw_splats
from mlsgpu_tpu.ops import morton


class TestGrid:
    def test_vertices(self):
        g = Grid.make((1.0, 2.0, 3.0), 0.5, [(-2, 4), (0, 6), (2, 10)])
        np.testing.assert_allclose(g.get_vertex(0, 0, 0), [0.0, 2.0, 4.0])
        np.testing.assert_allclose(g.get_vertex(1, 1, 1), [0.5, 2.5, 4.5])
        assert g.num_vertices(0) == 7
        assert g.num_cells_axis(0) == 6
        assert g.num_cells() == 6 * 6 * 8

    def test_world_to_cell_invariance(self):
        """Adding X to the base extent decreases the result by exactly X
        (reference src/grid.h:149-163)."""
        rng = np.random.default_rng(0)
        pts = rng.uniform(-50, 50, size=(200, 3)).astype(np.float32)
        g1 = Grid.make((0.1, 0.2, 0.3), 0.07, [(0, 100)] * 3)
        g2 = g1.sub_grid(-37, 63, 11, 111, -5, 95)
        c1 = g1.world_to_cell(pts)
        c2 = g2.world_to_cell(pts)
        np.testing.assert_array_equal(c1 - c2, np.array([[-37, 11, -5]] * len(pts)))

    def test_world_vertex_roundtrip(self):
        g = Grid.make((1.0, -2.0, 0.5), 0.25, [(3, 10), (-4, 8), (0, 5)])
        v = g.get_vertex(2, 3, 4)
        np.testing.assert_allclose(g.world_to_vertex(v), [2, 3, 4], atol=1e-4)

    def test_subgrid(self):
        g = Grid.make((0, 0, 0), 1.0, [(0, 10)] * 3)
        s = g.sub_grid(2, 5, 1, 9, 0, 10)
        assert s.extents == ((2, 5), (1, 9), (0, 10))
        np.testing.assert_allclose(s.get_vertex(0, 0, 0), [2, 1, 0])

    def test_nonfinite_rejected(self):
        g = Grid.make((0, 0, 0), 1.0, [(0, 10)] * 3)
        with pytest.raises(ValueError):
            g.world_to_cell(np.array([[np.nan, 0, 0]], dtype=np.float32))


class TestSplats:
    def test_make_and_finite(self):
        pos = np.array([[0, 0, 0], [1, 2, 3], [np.inf, 0, 0]], np.float32)
        s = SplatArray.make(pos, [1, 2, 0.5], np.eye(3), None)
        assert len(s) == 3
        np.testing.assert_array_equal(s.is_finite(), [True, True, False])
        np.testing.assert_allclose(s.quality, [1.0, 0.25, 4.0])

    def test_decode_raw(self):
        raw = np.array([[1, 2, 3, 0, 0, 1, 2.0],
                        [4, 5, 6, 1, 0, 0, 100.0]], np.float32)
        s = decode_raw_splats(raw, smooth=4.0, max_radius=10.0)
        np.testing.assert_allclose(s[:, 3], [8.0, 40.0])  # clamp then scale
        np.testing.assert_allclose(s[:, 7], [1 / 64.0, 1 / 1600.0])

    def test_to_grid_frame(self):
        g = Grid.make((10.0, 0.0, 0.0), 2.0, [(1, 5)] * 3)
        s = SplatArray.make([[14.0, 4.0, 2.0]], [4.0], [[0, 0, 1]])
        grid_form = s.to_grid_frame(g)
        np.testing.assert_allclose(grid_form[0, :3], [1.0, 1.0, 0.0])
        np.testing.assert_allclose(grid_form[0, 3], 1.0 / 4.0)  # (r/spacing)^-2


class TestMorton:
    def test_roundtrip_np(self):
        rng = np.random.default_rng(1)
        xyz = rng.integers(0, 1 << 21, size=(1000, 3), dtype=np.int64)
        code = morton.encode_np(xyz[:, 0], xyz[:, 1], xyz[:, 2])
        x, y, z = morton.decode_np(code)
        np.testing.assert_array_equal(x, xyz[:, 0])
        np.testing.assert_array_equal(y, xyz[:, 1])
        np.testing.assert_array_equal(z, xyz[:, 2])

    def test_matches_bit_interleave(self):
        def slow(x, y, z):
            out = 0
            for bit in range(21):
                out |= ((x >> bit) & 1) << (3 * bit)
                out |= ((y >> bit) & 1) << (3 * bit + 1)
                out |= ((z >> bit) & 1) << (3 * bit + 2)
            return out
        for x, y, z in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                        (5, 9, 31), (1023, 511, 255), (2 ** 21 - 1,) * 3]:
            assert int(morton.encode_np(x, y, z)) == slow(x, y, z)

    def test_roundtrip_jnp(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(2)
        xyz = rng.integers(0, 1 << 10, size=(500, 3)).astype(np.uint32)
        code = morton.encode_jnp(jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]),
                                 jnp.asarray(xyz[:, 2]))
        np_code = morton.encode_np(xyz[:, 0], xyz[:, 1], xyz[:, 2])
        np.testing.assert_array_equal(np.asarray(code, dtype=np.uint64), np_code)
        x, y, z = morton.decode_jnp(code)
        np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
        np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])

    def test_shift_property(self):
        # morton(t) >> 3k == morton(t >> k) — tile_segments relies on this.
        rng = np.random.default_rng(3)
        xyz = rng.integers(0, 1 << 10, size=(100, 3), dtype=np.int64)
        code = morton.encode_np(xyz[:, 0], xyz[:, 1], xyz[:, 2])
        for k in (1, 2, 3):
            np.testing.assert_array_equal(
                code >> np.uint64(3 * k),
                morton.encode_np(xyz[:, 0] >> k, xyz[:, 1] >> k, xyz[:, 2] >> k))
