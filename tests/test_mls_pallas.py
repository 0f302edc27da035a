"""Pallas MLS kernel vs the XLA eval_field reference (interpret mode on CPU;
the real-hardware run happens in bench.py / the CLI on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlsgpu_tpu.ops import binning, mls
from mlsgpu_tpu.ops.mls_pallas import eval_field_pallas

from tests import oracle


def _setup(splats_np, origin=(0, 0, 0), levels=3, sub=3):
    origin = jnp.asarray(origin, jnp.int32)
    valid = jnp.ones(len(splats_np), dtype=bool)
    min_s, max_s = sub, levels + sub - 1
    binned = binning.bin_splats(jnp.asarray(splats_np), valid, origin,
                                min_s, max_s)
    tpa = 1 << (max_s - 3)
    starts, lens = binning.tile_segments(binned.entry_keys, min_s, max_s, tpa)
    return binned, starts, lens, origin, tpa


@pytest.mark.slow
@pytest.mark.parametrize("fit", ["sphere", "plane"])
def test_pallas_matches_xla(fit):
    rng = np.random.default_rng(31)
    splats = oracle.sphere_cloud([16.0, 15.0, 17.0], 9.0, 1500, 2.0, rng)
    binned, starts, lens, origin, tpa = _setup(splats)

    ref, mt = mls.eval_field(binned.entry_data, starts, lens, origin, tpa,
                             1024, fit, jnp.float32(0.0), tile_chunk=8)
    got, _, _ = eval_field_pallas(binned.entry_data, starts, lens, origin, tpa,
                               fit_shape=fit, boundary_factor=0.0,
                               interpret=True)
    ref = np.asarray(ref)
    got = np.asarray(got)
    # identical NaN pattern up to float-noise at decision boundaries
    assert np.mean(np.isfinite(ref) == np.isfinite(got)) > 0.9995
    both = np.isfinite(ref) & np.isfinite(got)
    assert both.sum() > 500
    np.testing.assert_allclose(got[both], ref[both], atol=1e-3)


@pytest.mark.slow
def test_pallas_chunk_boundaries():
    """Segments longer than one CHUNK exercise the DMA loop."""
    rng = np.random.default_rng(32)
    # dense cloud -> segments with several hundred entries
    splats = oracle.sphere_cloud([16.0, 16.0, 16.0], 9.0, 4000, 2.5, rng)
    binned, starts, lens, origin, tpa = _setup(splats)
    assert int(jnp.max(lens)) > 128  # must cross CHUNK boundaries

    ref, _ = mls.eval_field(binned.entry_data, starts, lens, origin, tpa,
                            4096, "sphere", jnp.float32(0.0), tile_chunk=8)
    got, _, _ = eval_field_pallas(binned.entry_data, starts, lens, origin, tpa,
                               interpret=True)
    ref = np.asarray(ref)
    got = np.asarray(got)
    both = np.isfinite(ref) & np.isfinite(got)
    assert np.mean(np.isfinite(ref) == np.isfinite(got)) > 0.9995
    np.testing.assert_allclose(got[both], ref[both], atol=1e-3)


@pytest.mark.slow
def test_pallas_empty_tiles_nan():
    rng = np.random.default_rng(33)
    splats = oracle.sphere_cloud([8.0, 8.0, 8.0], 3.0, 600, 1.5, rng)
    binned, starts, lens, origin, tpa = _setup(splats)
    got, _, _ = eval_field_pallas(binned.entry_data, starts, lens, origin, tpa,
                               interpret=True)
    assert np.isnan(np.asarray(got)[31, 31, 31])


@pytest.mark.slow
def test_pallas_tile_compaction_matches_full():
    """Occupied-tile compaction (tile_cap) must reproduce the full grid
    bitwise and report the occupied-tile count for cap growth."""
    rng = np.random.default_rng(5)
    splats = oracle.sphere_cloud([16.0, 15.0, 17.0], 9.0, 1200, 2.0, rng)
    binned, starts, lens, origin, tpa = _setup(splats)
    full, _, _ = eval_field_pallas(binned.entry_data, starts, lens, origin,
                                   tpa, fit_shape="sphere",
                                   boundary_factor=0.0, interpret=True)
    comp, _, n_occ = eval_field_pallas(binned.entry_data, starts, lens,
                                       origin, tpa, fit_shape="sphere",
                                       boundary_factor=0.0, interpret=True,
                                       tile_cap=tpa ** 3 - 1)
    full = np.asarray(full)
    comp = np.asarray(comp)
    assert 0 < int(n_occ) <= tpa ** 3
    assert np.array_equal(np.isnan(full), np.isnan(comp))
    fin = np.isfinite(full)
    assert np.array_equal(full[fin], comp[fin])
