"""Fused-prefix device-stage timing for one representative bench block.

`--statistics-device` (ops/block.block_step_staged) fences every stage with
a block_until_ready, so each number carries a full device round trip
(~25 ms on the tunnel) — good for spotting order-of-magnitude shifts, not
for budgeting a 190 ms block. This tool times *nested jitted prefixes* of
the real block step instead (binning; +segments; +MLS; +faces; +skeleton;
+marching classify; +marching emit; full step), each as ONE fused program
timed over many reps, so stage costs come out as prefix differences with
no per-stage sync inflation. The analogue of the reference's kernel-level
event profiling (--statistics-cl, src/statistics_cl.h:43-93) at XLA
program granularity.

Usage:
    python -m mlsgpu_tpu.tools.bench_stage [--splats 2000000] [--reps 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--splats", type=int, default=2_000_000)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--levels", type=int, default=6)
    p.add_argument("--backend", default="auto",
                   help="mls backend (auto/pallas/xla)")
    args = p.parse_args(argv)

    from mlsgpu_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mlsgpu_tpu.config import ReconstructConfig
    from mlsgpu_tpu.io.splat_set import SequenceSource
    from mlsgpu_tpu.ops import binning, marching, mls
    from mlsgpu_tpu.ops.block import (_pack_codes, block_step,
                                      resolve_mls_backend, resolve_readback)
    from mlsgpu_tpu.pipeline import blobs as blobs_mod
    from mlsgpu_tpu.pipeline import bucket as bucket_mod
    from mlsgpu_tpu.pipeline.reconstruct import (load_cached_caps,
                                                 prepare_block_inputs)
    from mlsgpu_tpu.utils.misc import next_pow2

    # The bench cloud (bench.py make_cloud): equal-area lat-long sphere scan.
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
    backend = (resolve_mls_backend(args.backend)
               if args.backend == "auto" else args.backend)
    rb = resolve_readback("auto", cfg.device_levels, cfg.subsampling)
    print(f"# backend={backend} readback={rb} caps={caps}", file=sys.stderr)

    info = blobs_mod.compute_blobs(SequenceSource(splats), cfg.fit_grid,
                                   cfg.micro_cells)
    buckets = bucket_mod.make_buckets(
        info, cfg.device_block_cells, cfg.micro_cells,
        max_splats=cfg.max_device_splats)
    bucket_mod.skeleton_points(buckets)
    b = max(buckets, key=lambda x: x.num_splats)
    from mlsgpu_tpu.io.splat_set import merge_ranges
    bs, bc = info.blobs.start, info.blobs.count
    ranges = merge_ranges((int(bs[i]), int(bs[i] + bc[i]))
                          for i in b.blob_ids)
    raw = SequenceSource(splats).read_ranges(ranges)
    padded, valid = prepare_block_inputs(raw, b, info.grid,
                                         pad_to=next_pow2(len(raw)))
    region = np.asarray(b.cell_hi - b.cell_lo, np.int32)
    origin = np.asarray(b.cell_lo, np.int32)
    pts = (np.asarray(b.skeleton, np.int32) if b.skeleton is not None
           and len(b.skeleton) else None)
    print(f"# block: {len(raw)} splats pad {len(padded)}, region {region}, "
          f"skeleton {0 if pts is None else len(pts)}", file=sys.stderr)

    dev_args = [jnp.asarray(padded), jnp.asarray(valid),
                jnp.asarray(region), jnp.asarray(origin)]
    dev_pts = None if pts is None else jnp.asarray(pts)
    bf = float(cfg.boundary_factor)
    min_shift = cfg.subsampling
    max_shift = cfg.device_shift
    tpa = 1 << (max_shift - 3)
    K = caps.max_candidates

    def run_mls(entry_data, starts, lens, org):
        if backend in ("pallas", "pallas_interpret"):
            from mlsgpu_tpu.ops.mls_pallas import eval_field_pallas
            return eval_field_pallas(
                entry_data, starts, lens, org, tpa, fit_shape=cfg.fit_shape,
                boundary_factor=bf, interpret=(backend == "pallas_interpret"),
                tile_cap=caps.occ_tile_cap)
        f, mt = mls.eval_field(entry_data, starts, lens, org, tpa, K,
                               cfg.fit_shape, jnp.float32(bf), tile_chunk=32)
        return f, mt, jnp.int32(0)

    # --- nested jitted prefixes --------------------------------------------
    def p_binning(s, va, r, o):
        binned = binning.bin_splats(s, va, o, min_shift, max_shift)
        return (jnp.sum(binned.entry_keys.astype(jnp.int64)),
                jnp.sum(binned.entry_data))

    def p_segments(s, va, r, o):
        binned = binning.bin_splats(s, va, o, min_shift, max_shift)
        starts, lens = binning.tile_segments(binned.entry_keys, min_shift,
                                             max_shift, tpa)
        return jnp.sum(starts), jnp.sum(lens)

    def p_mls(s, va, r, o):
        binned = binning.bin_splats(s, va, o, min_shift, max_shift)
        starts, lens = binning.tile_segments(binned.entry_keys, min_shift,
                                             max_shift, tpa)
        field, _, _ = run_mls(binned.entry_data, starts, lens, o)
        return jnp.sum(jnp.where(jnp.isfinite(field), field, 0.0))

    def _field_through_faces(s, va, r, o, points):
        binned = binning.bin_splats(s, va, o, min_shift, max_shift)
        starts, lens = binning.tile_segments(binned.entry_keys, min_shift,
                                             max_shift, tpa)
        field, _, _ = run_mls(binned.entry_data, starts, lens, o)
        field, _ = mls.canonical_face_field(
            field, binned.entry_data, binned.entry_vals, starts, lens,
            o, r, tpa, K, cfg.fit_shape, bf, tile_chunk=32)
        if points is not None:
            field = mls.skeleton_point_field(
                field, binned.entry_data, binned.entry_vals, starts, lens,
                o, points, tpa, K, cfg.fit_shape, bf)
        return field

    def p_faces(s, va, r, o):
        field = _field_through_faces(s, va, r, o, None)
        return jnp.sum(jnp.where(jnp.isfinite(field), field, 0.0))

    def p_skeleton(s, va, r, o, points):
        field = _field_through_faces(s, va, r, o, points)
        return jnp.sum(jnp.where(jnp.isfinite(field), field, 0.0))

    def p_classify(s, va, r, o, points):
        field = _field_through_faces(s, va, r, o, points)
        if caps.march_tile_cap:
            (occ_iso, occ_code, cx, cy, cz, occ_valid, num_cells,
             true_nv, true_ni, num_tiles) = marching._classify_tiled(
                field, r, caps.cell_cap, caps.march_tile_cap)
        else:
            (occ_iso, occ_code, cx, cy, cz, occ_valid, num_cells,
             true_nv, true_ni, num_tiles) = marching._classify_dense(
                field, r, caps.cell_cap)
        return (num_cells, true_nv, true_ni, jnp.sum(occ_iso),
                jnp.sum(occ_code))

    def p_march(s, va, r, o, points):
        field = _field_through_faces(s, va, r, o, points)
        cmesh = marching.generate(field, r, o, caps.cell_cap,
                                  caps.vertex_cap, caps.index_cap,
                                  tile_cap=caps.march_tile_cap, emit="codes")
        return (cmesh.num_cells, cmesh.num_vertices,
                jnp.sum(cmesh.cell_ids), jnp.sum(cmesh.t16))

    def p_full(s, va, r, o, points):
        return block_step(
            s, va, r, o, boundary_factor=bf, points=points,
            levels=cfg.device_levels, subsampling=cfg.subsampling,
            max_candidates=K, cell_cap=caps.cell_cap,
            vertex_cap=caps.vertex_cap, index_cap=caps.index_cap,
            fit_shape=cfg.fit_shape, mls_backend=backend,
            occ_tile_cap=caps.occ_tile_cap,
            march_tile_cap=caps.march_tile_cap, readback=rb)

    variants = [
        ("binning", jax.jit(p_binning), dev_args),
        ("segments", jax.jit(p_segments), dev_args),
        ("mls", jax.jit(p_mls), dev_args),
        ("faces", jax.jit(p_faces), dev_args),
        ("skeleton", jax.jit(p_skeleton), dev_args + [dev_pts]),
        ("classify", jax.jit(p_classify), dev_args + [dev_pts]),
        ("march", jax.jit(p_march), dev_args + [dev_pts]),
        ("full", p_full, dev_args + [dev_pts]),
    ]

    results = {}
    prev = 0.0
    for name, fn, fargs in variants:
        jax.block_until_ready(fn(*fargs))  # compile + warm
        jax.block_until_ready(fn(*fargs))
        ts = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            jax.block_until_ready(fn(*fargs))
            ts.append(time.monotonic() - t0)
        med = float(np.median(ts)) * 1e3
        results[name] = med
        print(f"{name:10s} {med:8.2f} ms  (+{med - prev:7.2f} ms)  "
              f"min {min(ts) * 1e3:.2f}", flush=True)
        prev = med
    import json
    print(json.dumps({"prefix_ms": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
