"""Micro-benchmarks of block-step sub-stages on the bench block (round-5
device-compute attack): face-pass chunk sizing, binning sort-vs-gather
split, classify internals. Prints one timing line per variant.

Usage: python -m mlsgpu_tpu.tools.bench_micro [--splats 2000000]
"""

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
    print(f"{name:28s} {med:8.2f} ms  (min {min(ts)*1e3:.2f})", flush=True)
    return med


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--splats", type=int, default=2_000_000)
    p.add_argument("--levels", type=int, default=6)
    args = p.parse_args(argv)

    from mlsgpu_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from mlsgpu_tpu.config import ReconstructConfig
    from mlsgpu_tpu.io.splat_set import SequenceSource, merge_ranges
    from mlsgpu_tpu.ops import binning, marching, mls
    from mlsgpu_tpu.pipeline import blobs as blobs_mod
    from mlsgpu_tpu.pipeline import bucket as bucket_mod
    from mlsgpu_tpu.pipeline.reconstruct import (load_cached_caps,
                                                 prepare_block_inputs)
    from mlsgpu_tpu.tools.bench_stage import main as _  # noqa: F401
    from mlsgpu_tpu.utils.misc import next_pow2

    # same cloud construction as bench_stage
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
        levels=args.levels, subsampling=3, max_device_splats=4 << 20,
        tile_candidates=384, progress=False)
    caps = load_cached_caps(cfg)
    info = blobs_mod.compute_blobs(SequenceSource(splats), cfg.fit_grid,
                                   cfg.micro_cells)
    buckets = bucket_mod.make_buckets(
        info, cfg.device_block_cells, cfg.micro_cells,
        max_splats=cfg.max_device_splats)
    bucket_mod.skeleton_points(buckets)
    b = max(buckets, key=lambda x: x.num_splats)
    bs, bc = info.blobs.start, info.blobs.count
    ranges = merge_ranges((int(bs[i]), int(bs[i] + bc[i]))
                          for i in b.blob_ids)
    raw = SequenceSource(splats).read_ranges(ranges)
    padded, valid = prepare_block_inputs(raw, b, info.grid,
                                         pad_to=next_pow2(len(raw)))
    region = np.asarray(b.cell_hi - b.cell_lo, np.int32)
    origin = np.asarray(b.cell_lo, np.int32)
    print(f"# block: {len(raw)} splats pad {len(padded)}, region {region}",
          file=sys.stderr, flush=True)

    min_shift = cfg.subsampling
    max_shift = cfg.device_shift
    tpa = 1 << (max_shift - 3)
    K = caps.max_candidates
    bf = float(cfg.boundary_factor)

    s_d = jnp.asarray(padded)
    v_d = jnp.asarray(valid)
    r_d = jnp.asarray(region)
    o_d = jnp.asarray(origin)

    # ---- binning internals -------------------------------------------------
    npad = s_d.shape[0]

    @jax.jit
    def bin_keys_only(s, va, o):
        # keys + sort of (key, val) WITHOUT the data gather
        import mlsgpu_tpu.ops.binning as B
        pos = s[:, 0:3]
        r = s[:, 3]
        orig = o.astype(jnp.int32)[None, :]
        lo_g = jnp.floor(pos - r[:, None]).astype(jnp.int32)
        hi_g = jnp.floor(pos + r[:, None]).astype(jnp.int32)
        shift = jnp.clip(B._level_shift(lo_g, hi_g), min_shift, max_shift)
        ilo = jnp.maximum(lo_g - orig, 0) >> shift[:, None]
        offs = jnp.asarray(B.level_offsets(min_shift, max_shift))
        level_offset = offs[shift - min_shift]
        bound = (1 << (max_shift - shift)).astype(jnp.int32)
        r2c = r * r * 1.00001
        keys = []
        from mlsgpu_tpu.ops import morton
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    addr = ilo + jnp.array([dx, dy, dz], dtype=jnp.int32)
                    blo = ((addr << shift[:, None]) + orig).astype(jnp.float32)
                    bhi = (((addr + 1) << shift[:, None]) + orig).astype(jnp.float32)
                    isect = B._point_box_dist2(pos, blo, bhi) < r2c
                    inb = jnp.all(addr < bound[:, None], axis=-1)
                    key = level_offset + morton.encode_jnp(
                        addr[:, 0].astype(jnp.uint32),
                        addr[:, 1].astype(jnp.uint32),
                        addr[:, 2].astype(jnp.uint32))
                    keys.append(jnp.where(isect & inb & va, key,
                                          B.INVALID_KEY))
        all_keys = jnp.concatenate(keys)
        all_vals = jnp.tile(jnp.arange(npad, dtype=jnp.int32), 8)
        sk, sv = jax.lax.sort((all_keys, all_vals), num_keys=1)
        return jnp.sum(sk.astype(jnp.int64)), jnp.sum(sv.astype(jnp.int64))

    @jax.jit
    def bin_keys_nosort(s, va, o):
        import mlsgpu_tpu.ops.binning as B
        pos = s[:, 0:3]
        r = s[:, 3]
        orig = o.astype(jnp.int32)[None, :]
        lo_g = jnp.floor(pos - r[:, None]).astype(jnp.int32)
        hi_g = jnp.floor(pos + r[:, None]).astype(jnp.int32)
        shift = jnp.clip(B._level_shift(lo_g, hi_g), min_shift, max_shift)
        ilo = jnp.maximum(lo_g - orig, 0) >> shift[:, None]
        offs = jnp.asarray(B.level_offsets(min_shift, max_shift))
        level_offset = offs[shift - min_shift]
        bound = (1 << (max_shift - shift)).astype(jnp.int32)
        r2c = r * r * 1.00001
        acc = jnp.uint32(0)
        from mlsgpu_tpu.ops import morton
        out = []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    addr = ilo + jnp.array([dx, dy, dz], dtype=jnp.int32)
                    blo = ((addr << shift[:, None]) + orig).astype(jnp.float32)
                    bhi = (((addr + 1) << shift[:, None]) + orig).astype(jnp.float32)
                    isect = B._point_box_dist2(pos, blo, bhi) < r2c
                    inb = jnp.all(addr < bound[:, None], axis=-1)
                    key = level_offset + morton.encode_jnp(
                        addr[:, 0].astype(jnp.uint32),
                        addr[:, 1].astype(jnp.uint32),
                        addr[:, 2].astype(jnp.uint32))
                    out.append(jnp.where(isect & inb & va, key,
                                         B.INVALID_KEY))
        return jnp.sum(jnp.concatenate(out).astype(jnp.int64))

    @jax.jit
    def bin_full(s, va, o):
        bn = binning.bin_splats(s, va, o, min_shift, max_shift)
        return (jnp.sum(bn.entry_keys.astype(jnp.int64)),
                jnp.sum(bn.entry_data))

    timeit("bin keys only (no sort)", bin_keys_nosort, s_d, v_d, o_d)
    timeit("bin keys+sort (no gather)", bin_keys_only, s_d, v_d, o_d)
    timeit("bin full (sort+gather)", bin_full, s_d, v_d, o_d)

    # ---- face pass chunk sweep --------------------------------------------
    binned = binning.bin_splats(s_d, v_d, o_d, min_shift, max_shift)
    starts, lens = jax.jit(functools.partial(
        binning.tile_segments, min_shift=min_shift, max_shift=max_shift,
        tiles_per_axis=tpa))(binned.entry_keys)
    from mlsgpu_tpu.ops.mls_pallas import eval_field_pallas
    field, _, _ = eval_field_pallas(
        binned.entry_data, starts, lens, o_d, tpa, fit_shape=cfg.fit_shape,
        boundary_factor=bf, tile_cap=caps.occ_tile_cap)
    field = jax.block_until_ready(field)

    # how many face rows are occupied?
    cum = jnp.cumsum(lens, axis=1)
    totals = np.asarray(cum[:, -1])
    print(f"# nonzero tiles: {(totals > 0).sum()} / {len(totals)}",
          flush=True)

    for chunk in (32, 64, 128, 256):
        fn = jax.jit(functools.partial(
            mls.canonical_face_field, tiles_per_axis=tpa, max_candidates=K,
            fit_shape=cfg.fit_shape, boundary_factor=bf, tile_chunk=chunk))

        def run(f, ed, ev, st, ln, o, r, fn=fn):
            out, fm = fn(f, ed, ev, st, ln, o, r)
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)), fm
        timeit(f"faces chunk={chunk}", run, field, binned.entry_data,
               binned.entry_vals, starts, lens, o_d, r_d)

    # ---- classify internals ------------------------------------------------
    mtc = caps.march_tile_cap or 4096  # probe the tiled path regardless

    @jax.jit
    def classify_full(f, r):
        out = marching._classify_tiled(f, r, caps.cell_cap, mtc)
        return out[6], out[7], out[8], jnp.sum(out[0]), jnp.sum(out[1])

    @jax.jit
    def classify_candidates_only(f, r):
        # just the dense candidate-tile reduction + argsort + 9^3 gather
        b2 = f.shape[0]
        nc = b2 - 1
        tile = marching.TILE
        g = -(-nc // tile)
        gb = g * tile + 1
        fpad = jnp.pad(f, ((0, gb - b2),) * 3, constant_values=jnp.nan)
        fin8 = jnp.isfinite(fpad[:g * tile, :g * tile, :g * tile])
        cand = (fin8.reshape(g, tile, g, tile, g, tile)
                .transpose(0, 2, 4, 1, 3, 5).reshape(g ** 3, tile ** 3)
                .any(axis=1))
        num_tiles = jnp.sum(cand.astype(jnp.int32))
        order = jnp.argsort(~cand, stable=True).astype(jnp.int32)
        tcap = min(int(mtc), g ** 3)
        tids = order[:tcap]
        t_x = tids % g
        t_y = (tids // g) % g
        t_z = tids // (g * g)
        r9 = jnp.arange(tile + 1, dtype=jnp.int32)
        zi = t_z[:, None] * tile + r9[None, :]
        yi = t_y[:, None] * tile + r9[None, :]
        xi = t_x[:, None] * tile + r9[None, :]
        tf = fpad[zi[:, :, None, None], yi[:, None, :, None],
                  xi[:, None, None, :]]
        return num_tiles, jnp.sum(jnp.where(jnp.isfinite(tf), tf, 0.0))

    timeit("classify cand+gather only", classify_candidates_only, field, r_d)
    timeit("classify full", classify_full, field, r_d)

    @jax.jit
    def classify_dense_full(f, r):
        out = marching._classify_dense(f, r, caps.cell_cap)
        return out[6], out[7], out[8], jnp.sum(out[0]), jnp.sum(out[1])

    @jax.jit
    def classify_dense_signs_only(f, r):
        # dense signs/codes/tables WITHOUT the compaction machinery
        b2 = f.shape[0]
        nc = b2 - 1
        sgn = []
        code = jnp.zeros((nc, nc, nc), dtype=jnp.int32)
        finite = jnp.ones((nc, nc, nc), dtype=bool)
        for v2, (dx, dy, dz) in enumerate(marching._CORNER_OFFS):
            cv = f[dz:dz + nc, dy:dy + nc, dx:dx + nc]
            s = jnp.where(cv >= 0.0, 1, 0)
            sgn.append(s)
            code = code | (s << v2)
            finite = finite & jnp.isfinite(cv)
        nv3, nt3 = marching._cell_tables(sgn)
        occ = finite & (code != 0) & (code != 255)
        return (jnp.sum(occ.astype(jnp.int32)), jnp.sum(nv3), jnp.sum(nt3))

    timeit("classify dense signs only", classify_dense_signs_only, field, r_d)
    timeit("classify dense full", classify_dense_full, field, r_d)

    # ---- march emit (codes mode) standalone -------------------------------
    @jax.jit
    def march_codes(f, r, o):
        cm = marching.generate(f, r, o, caps.cell_cap, caps.vertex_cap,
                               caps.index_cap, tile_cap=caps.march_tile_cap,
                               emit="codes")
        return (cm.num_cells, cm.num_vertices, jnp.sum(cm.cell_ids),
                jnp.sum(cm.t16))

    timeit("march codes full", march_codes, field, r_d, o_d)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
