"""On-device kernel correctness gate.

Runs the fused Pallas MLS kernel COMPILED (not interpret) on one small
block and compares it against the XLA path on the same device, so every
hardware session validates the Mosaic-compiled kernel before trusting or
timing it — the role the reference's compiled-in kernel unit tests play in
every perCommit run (kernels/mls.cl:439-481, test/test_mls.cpp:59-130).
The 171-test suite exercises the kernel only in interpret mode on CPU; a
Mosaic/regalloc regression would otherwise surface as a silently bad bench
mesh.

Wired into bench.py's preamble and exposed as
`python -m mlsgpu_tpu.ops.kernel_gate` (exit 0 = pass) for the TPU test
tier (tests/test_kernel_gate.py) and ad-hoc hardware checks.
"""

from __future__ import annotations

import numpy as np


def _gate_cloud(n: int = 1500, seed: int = 41) -> np.ndarray:
    """Deterministic synthetic sphere cloud in grid coords (the
    test/oracle fixture style) sized for one 64^3-corner block."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    out = np.empty((n, 8), np.float32)
    out[:, 0:3] = np.array([32.0, 31.0, 33.0]) + 18.0 * v
    out[:, 3] = 3.0
    out[:, 4:7] = v
    out[:, 7] = 1.0 / 9.0
    return out


def run_kernel_gate(fit_shape: str = "sphere", interpret: bool = False,
                    tile_cap: int = 511) -> dict:
    """Compare compiled eval_field_pallas against mls.eval_field on one
    64^3-corner block (levels=4, subsampling=3) on the current default
    device. Raises AssertionError on divergence; returns a summary dict.

    The tolerance mirrors tests/test_mls_pallas.py: the kernel accumulates
    moments in a different order than the XLA path, so values match to
    1e-3 and the NaN (undefined) pattern to 99.95% (decision-boundary
    float noise flips isolated corners).
    """
    import jax.numpy as jnp

    from mlsgpu_tpu.ops import binning, mls
    from mlsgpu_tpu.ops.mls_pallas import eval_field_pallas

    levels, sub = 4, 3
    min_s, max_s = sub, levels + sub - 1
    tpa = 1 << (max_s - 3)                    # 8 tiles/axis, 64^3 corners
    splats = _gate_cloud()
    origin = jnp.zeros(3, jnp.int32)
    valid = jnp.ones(len(splats), dtype=bool)
    binned = binning.bin_splats(jnp.asarray(splats), valid, origin,
                                min_s, max_s)
    starts, lens = binning.tile_segments(binned.entry_keys, min_s, max_s,
                                         tpa)

    ref, _ = mls.eval_field(binned.entry_data, starts, lens, origin, tpa,
                            1024, fit_shape, jnp.float32(0.0), tile_chunk=8)
    got, _, n_occ = eval_field_pallas(
        binned.entry_data, starts, lens, origin, tpa, fit_shape=fit_shape,
        boundary_factor=0.0, interpret=interpret, tile_cap=tile_cap)
    assert int(n_occ) <= tile_cap, (
        f"kernel gate fixture overflows its tile_cap ({int(n_occ)} > "
        f"{tile_cap}); results would be truncated")
    ref = np.asarray(ref)
    got = np.asarray(got)

    pattern = float(np.mean(np.isfinite(ref) == np.isfinite(got)))
    both = np.isfinite(ref) & np.isfinite(got)
    defined = int(both.sum())
    max_err = float(np.abs(got[both] - ref[both]).max()) if defined else 0.0

    assert pattern > 0.9995, (
        f"kernel gate: NaN-pattern agreement {pattern:.6f} <= 0.9995")
    assert defined > 500, f"kernel gate: only {defined} corners defined"
    assert max_err < 1e-3, f"kernel gate: max |pallas-xla| = {max_err:.2e}"
    return {"pattern_agreement": pattern, "defined_corners": defined,
            "max_abs_err": max_err, "occupied_tiles": int(n_occ)}


def main() -> int:
    import jax
    backend = jax.default_backend()
    interpret = backend == "cpu"
    for fit in ("sphere", "plane"):
        summary = run_kernel_gate(fit, interpret=interpret)
        print(f"kernel gate [{backend}{' interpret' if interpret else ''}] "
              f"{fit}: OK {summary}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
