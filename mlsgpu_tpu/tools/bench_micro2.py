"""Round-5 probe #2: isolate the binning key-pass cost, face-pass row
occupancy, and MLS kernel window sizing. Run on TPU."""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def timeit(name, fn, *args, reps=8):
    import jax
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        jax.block_until_ready(fn(*args))
        ts.append(time.monotonic() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:30s} {med:8.2f} ms  (min {min(ts)*1e3:.2f})", flush=True)
    return med


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--splats", type=int, default=2_000_000)
    args = p.parse_args(argv)

    from mlsgpu_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from mlsgpu_tpu.config import ReconstructConfig
    from mlsgpu_tpu.io.splat_set import SequenceSource, merge_ranges
    from mlsgpu_tpu.ops import binning, morton
    from mlsgpu_tpu.pipeline import blobs as blobs_mod
    from mlsgpu_tpu.pipeline import bucket as bucket_mod
    from mlsgpu_tpu.pipeline.reconstruct import (load_cached_caps,
                                                 prepare_block_inputs)
    from mlsgpu_tpu.utils.misc import next_pow2

    n = args.splats
    rng = np.random.default_rng(123)
    ids = np.arange(n, dtype=np.int64)
    bands = max(int(np.sqrt(n / 2)), 1)
    band = ids * bands // n
    in_band = ids - band * n // bands
    band_len = np.maximum((band + 1) * n // bands - band * n // bands, 1)
    cos_t = 1.0 - 2.0 * (band + 0.5 + 0.9 * (rng.random(n) - 0.5)) / bands
    theta = np.arccos(np.clip(cos_t, -1.0, 1.0))
    phi = ((in_band + 0.5 + 0.9 * (rng.random(n) - 0.5))
           / band_len * 2 * np.pi)
    st, ct = np.sin(theta), np.cos(theta)
    v = np.stack([st * np.cos(phi), st * np.sin(phi), ct],
                 axis=1).astype(np.float32)
    splats = np.zeros((n, 8), dtype=np.float32)
    splats[:, 0:3] = 3.0 * v
    sr = 3.0 * np.sqrt(4 * np.pi * 9.0 / n)
    splats[:, 3] = sr
    splats[:, 4:7] = v
    splats[:, 7] = 1.0 / sr ** 2

    cfg = ReconstructConfig(
        fit_grid=float(sr / 3.0), fit_smooth=1.0, fit_prune=0.02,
        levels=6, subsampling=3, max_device_splats=4 << 20,
        tile_candidates=384, progress=False)
    caps = load_cached_caps(cfg)
    info = blobs_mod.compute_blobs(SequenceSource(splats), cfg.fit_grid,
                                   cfg.micro_cells)
    buckets = bucket_mod.make_buckets(
        info, cfg.device_block_cells, cfg.micro_cells,
        max_splats=cfg.max_device_splats)
    b = max(buckets, key=lambda x: x.num_splats)
    bs, bc = info.blobs.start, info.blobs.count
    ranges = merge_ranges((int(bs[i]), int(bs[i] + bc[i]))
                          for i in b.blob_ids)
    raw = SequenceSource(splats).read_ranges(ranges)
    padded, valid = prepare_block_inputs(raw, b, info.grid,
                                         pad_to=next_pow2(len(raw)))
    region = np.asarray(b.cell_hi - b.cell_lo, np.int32)
    origin = np.asarray(b.cell_lo, np.int32)
    print(f"# block: {len(raw)} splats pad {len(padded)}, region {region}, "
          f"origin {origin}", file=sys.stderr, flush=True)

    min_shift = cfg.subsampling
    max_shift = cfg.device_shift
    tpa = 1 << (max_shift - 3)

    s_d = jnp.asarray(padded)
    v_d = jnp.asarray(valid)
    o_d = jnp.asarray(origin)
    r_d = jnp.asarray(region)
    npad = s_d.shape[0]

    # --- binning key-pass variants (per-axis form, selectively disabled) ---
    def keys_variant(s, va, o, *, do_morton=True, do_slab=True,
                     var_shift=True, ncorner=8):
        r = s[:, 3]
        px = [s[:, a] for a in range(3)]
        org = [o[a].astype(jnp.int32) for a in range(3)]
        lo_g = [jnp.floor(px[a] - r).astype(jnp.int32) for a in range(3)]
        hi_g = [jnp.floor(px[a] + r).astype(jnp.int32) for a in range(3)]
        big = jnp.maximum(jnp.maximum(hi_g[0] - lo_g[0], hi_g[1] - lo_g[1]),
                          hi_g[2] - lo_g[2])
        if var_shift:
            shift = jnp.clip(binning._level_shift1(big), min_shift, max_shift)
        else:
            shift = jnp.full_like(big, min_shift + 1)
        ilo = [jnp.maximum(lo_g[a] - org[a], 0) >> shift for a in range(3)]
        offs = jnp.asarray(binning.level_offsets(min_shift, max_shift))
        level_offset = offs[shift - min_shift]
        bound = (1 << (max_shift - shift)).astype(jnp.int32)
        r2c = r * r * 1.00001

        def axis_d2(a, d):
            addr = ilo[a] + d
            blo = ((addr << shift) + org[a]).astype(jnp.float32)
            bhi = (((addr + 1) << shift) + org[a]).astype(jnp.float32)
            nearest = jnp.clip(px[a], blo, bhi)
            dd = nearest - px[a]
            return addr, dd * dd

        addr_t = [[None, None] for _ in range(3)]
        d2_t = [[None, None] for _ in range(3)]
        for a in range(3):
            for d in (0, 1):
                addr_t[a][d], d2_t[a][d] = axis_d2(a, d)

        out = []
        corners = [(dz, dy, dx) for dz in (0, 1) for dy in (0, 1)
                   for dx in (0, 1)][:ncorner]
        for dz, dy, dx in corners:
            ax, ay, az = addr_t[0][dx], addr_t[1][dy], addr_t[2][dz]
            ok = va
            if do_slab:
                d2 = d2_t[0][dx] + d2_t[1][dy] + d2_t[2][dz]
                ok = ok & (d2 < r2c)
            ok = ok & (ax < bound) & (ay < bound) & (az < bound)
            if do_morton:
                key = level_offset + morton.encode_jnp(
                    ax.astype(jnp.uint32), ay.astype(jnp.uint32),
                    az.astype(jnp.uint32))
            else:
                key = (level_offset + ax.astype(jnp.uint32)
                       + ay.astype(jnp.uint32) * 7
                       + az.astype(jnp.uint32) * 13)
            out.append(jnp.where(ok, key, binning.INVALID_KEY))
        allk = jnp.concatenate(out)
        return jnp.sum(allk.astype(jnp.int64))

    for name, kw in [
        ("keys full", {}),
    ]:
        fn = jax.jit(functools.partial(keys_variant, **kw))
        timeit(f"bin {name}", fn, s_d, v_d, o_d)

    # --- face pass: occupancy + timing with current code ------------------
    binned = binning.bin_splats(s_d, v_d, o_d, min_shift, max_shift)
    starts, lens = jax.jit(functools.partial(
        binning.tile_segments, min_shift=min_shift, max_shift=max_shift,
        tiles_per_axis=tpa))(binned.entry_keys)
    from mlsgpu_tpu.ops import mls
    from mlsgpu_tpu.ops.mls_pallas import eval_field_pallas
    field, _, _ = eval_field_pallas(
        binned.entry_data, starts, lens, o_d, tpa, fit_shape=cfg.fit_shape,
        boundary_factor=float(cfg.boundary_factor),
        tile_cap=caps.occ_tile_cap)
    field = jax.block_until_ready(field)

    # replicate the face-pass row occupancy count
    totals = np.asarray(jnp.sum(lens, axis=1))
    n_p = tpa + 1
    nrows = 6 * n_p * n_p
    print(f"# face rows: {nrows} total", flush=True)
    # count occupied rows exactly as canonical_face_field does
    lens_j = jnp.asarray(lens)
    cum = jnp.cumsum(lens_j, axis=1)
    tot_j = cum[:, -1]

    rows = np.arange(nrows)
    f2 = n_p * n_p
    face = rows // f2
    axis_a = face // 2
    side = face % 2
    pb_i = (rows % f2) // n_p
    pc_i = rows % n_p
    axis_b = (axis_a + 1) % 3
    axis_c = (axis_a + 2) % 3
    org = origin.astype(np.int64)
    rc = region.astype(np.int64)
    plane_g = org[axis_a] + np.where(side == 1, rc[axis_a], 0)
    base_b = (org[axis_b] // 8 + pb_i) * 8
    base_c = (org[axis_c] // 8 + pc_i) * 8
    layer_a = np.where(side == 1, rc[axis_a] // 8, 0)
    lo_b = base_b - org[axis_b]
    lo_c = base_c - org[axis_c]
    tb0 = np.clip(lo_b // 8, 0, tpa - 1)
    tb1 = np.clip((lo_b + 7) // 8, 0, tpa - 1)
    tc0 = np.clip(lo_c // 8, 0, tpa - 1)
    tc1 = np.clip((lo_c + 7) // 8, 0, tpa - 1)

    def tid(ta, tb, tc):
        t = np.zeros((nrows, 3), np.int64)
        t[np.arange(nrows), axis_a] = ta
        t[np.arange(nrows), axis_b] = tb
        t[np.arange(nrows), axis_c] = tc
        return (t[:, 2] * tpa + t[:, 1]) * tpa + t[:, 0]

    tids4 = np.stack([tid(layer_a, tb0, tc0), tid(layer_a, tb0, tc1),
                      tid(layer_a, tb1, tc0), tid(layer_a, tb1, tc1)], axis=1)
    row_tot = totals[tids4].max(axis=1)
    print(f"# occupied face rows: {(row_tot > 0).sum()}, "
          f"distinct tiles/row mean "
          f"{np.mean([len(set(r)) for r in tids4]):.2f}", flush=True)

    bf = float(cfg.boundary_factor)
    for chunk in (32, 128):
        fn = jax.jit(functools.partial(
            mls.canonical_face_field, tiles_per_axis=tpa,
            max_candidates=caps.max_candidates, fit_shape=cfg.fit_shape,
            boundary_factor=bf, tile_chunk=chunk))

        def run(f, ed, ev, st, ln, o, r, fn=fn):
            out, fm = fn(f, ed, ev, st, ln, o, r)
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)), fm
        timeit(f"faces(orig) chunk={chunk}", run, field, binned.entry_data,
               binned.entry_vals, starts, lens, o_d, r_d)

    # --- MLS kernel CHUNK sweep -------------------------------------------
    import mlsgpu_tpu.ops.mls_pallas as MP
    for ch in (32, 64, 128):
        MP.CHUNK = ch
        MP.eval_field_pallas.clear_cache()

        def run_mls(ed, st, ln, o):
            f, _, nocc = MP.eval_field_pallas(
                ed, st, ln, o, tpa, fit_shape=cfg.fit_shape,
                boundary_factor=bf, tile_cap=caps.occ_tile_cap)
            return jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0)), nocc
        timeit(f"mls pallas CHUNK={ch}", run_mls, binned.entry_data,
               starts, lens, o_d)
    MP.CHUNK = 128
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
