"""Cross-block bitwise determinism of shared face corners.

The reference's contract is decomposition-independent geometry
(doc/mlsgpu-user-manual.xml:494-499). ops/mls.canonical_face_field makes the
six face planes of every block's field bitwise block-independent, so two
adjacent blocks must produce IDENTICAL f32 values (and NaN pattern) on their
shared corner plane — even when the block origins are not mutually 8-aligned
(the case that produced hairline seam cracks).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlsgpu_tpu.ops import binning, mls

from tests import oracle

LEVELS = 3
SUB = 3
B = 1 << (LEVELS + SUB - 1)   # 32 corners per axis


# perCommit-tier suite (reference TestSet::perCommit, test/testutil.cpp:43-47):
# compile-heavy; deselect with `-m "not slow"` for the fast perBuild tier.
pytestmark = pytest.mark.slow


def eval_block(splats, origin, region, max_candidates=2048):
    n = len(splats)
    pos = splats[:, 0:3]
    r = splats[:, 3]
    valid = np.ones(n, bool)
    origin_j = jnp.asarray(np.asarray(origin, np.int32))
    region_j = jnp.asarray(np.asarray(region, np.int32))
    min_shift, max_shift = SUB, LEVELS + SUB - 1
    tpa = 1 << (max_shift - 3)
    binned = binning.bin_splats(jnp.asarray(splats), jnp.asarray(valid),
                                origin_j, min_shift, max_shift)
    starts, lens = binning.tile_segments(binned.entry_keys, min_shift,
                                         max_shift, tpa)
    field, _ = mls.eval_field(binned.entry_data, starts, lens, origin_j,
                              tpa, max_candidates, "sphere",
                              jnp.float32(0.0))
    field, fmax = mls.canonical_face_field(
        field, binned.entry_data, binned.entry_vals, starts, lens,
        origin_j, region_j, tpa, max_candidates, "sphere", 0.0)
    assert int(fmax) <= max_candidates
    return np.asarray(field)


@pytest.mark.parametrize("region_a", [28, 24])   # 28 % 8 != 0: misaligned
def test_shared_face_plane_bitwise_equal(region_a):
    rng = np.random.default_rng(42)
    # sphere surface crossing the x = region_a plane
    splats = oracle.sphere_cloud([region_a, 14.0, 14.0], 9.0, 6000, 1.2, rng)
    # grid-frame: positions already in cell units here (spacing 1)
    splats = splats.astype(np.float32)

    fa = eval_block(splats, (0, 0, 0), (region_a, B - 1, B - 1))
    fb = eval_block(splats, (region_a, 0, 0), (B - 1, B - 1, B - 1))

    plane_a = fa[:, :, region_a]    # [z, y] at x = region_a (A's high face)
    plane_b = fb[:, :, 0]           # B's low face

    nan_a = np.isnan(plane_a)
    nan_b = np.isnan(plane_b)
    np.testing.assert_array_equal(nan_a, nan_b)
    ok = ~nan_a
    assert ok.sum() > 100  # the surface actually crosses the plane
    np.testing.assert_array_equal(
        plane_a[ok].view(np.uint32), plane_b[ok].view(np.uint32))


def test_face_pass_preserves_interior_consistency():
    """Face values must still be a valid MLS evaluation: compare against the
    float64 oracle at face corners."""
    rng = np.random.default_rng(7)
    center = np.array([2.0, 14.0, 13.0])  # surface crosses the x=0 plane
    splats = oracle.sphere_cloud(center, 9.0, 8000, 1.2, rng).astype(np.float32)
    region = (B - 1, B - 1, B - 1)
    f = eval_block(splats, (0, 0, 0), region)
    plane = f[:, :, 0]
    zz, yy = np.nonzero(~np.isnan(plane))
    assert len(zz) > 50
    corners = np.stack([np.zeros_like(zz), yy, zz], axis=1).astype(np.float64)
    expect = oracle.mls_field_bruteforce(splats.astype(np.float64), corners,
                              boundary_factor=0.0)
    got = plane[zz, yy]
    finite = np.isfinite(expect)
    assert finite.mean() > 0.9
    np.testing.assert_allclose(got[finite], expect[finite],
                               rtol=2e-4, atol=2e-4)
