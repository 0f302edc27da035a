"""Fused Pallas TPU kernel for the MLS field evaluation.

The XLA path (ops/mls.py) materializes the (tiles, 512, K) weight tensor in
HBM between the pairwise-distance einsum and the moment einsum. This kernel
fuses the whole per-tile pipeline in VMEM — DMA a window of sorted entry
splats, compute distances/weights on the VPU, accumulate the moment columns
on the MXU — so HBM traffic drops to the entry rows themselves (the same
working set the reference streams through local memory,
kernels/mls.cl:311-392, MAX_BUCKET-sized stages).

Layout notes (Mosaic tiling rules):
- entry data is stored transposed, (8 features, E candidates), so segment
  windows are 128-lane slices along the minor axis;
- segments start at arbitrary offsets, so the kernel walks 128-aligned
  windows covering [start, start+len) and masks the tails — at most one
  extra window per segment vs the unaligned ideal;
- all in-kernel math stays in (feature, candidate) orientation: the pairwise
  matmul is (512,3)x(3,128) and the moment matmul contracts the candidate
  axis of (512,128) with (16,128), so no in-kernel transposes are needed.

One grid step = one 8x8x8-corner tile. Empty tiles short-circuit to NaN
(mls.cl:325's start<0 early-out).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlsgpu_tpu.models import FIT_MODELS
from mlsgpu_tpu.models.common import RADIUS_CUTOFF
from mlsgpu_tpu.ops.mls import TILE, TILE_CORNERS

CHUNK = 128  # candidates staged per DMA window (reference MAX_BUCKET=256)


def _kernel(origin_ref,                                 # scalar prefetch (3,)
            occ_ref,                                    # scalar prefetch (C,)
            seg_starts_ref, seg_lens_ref,               # SMEM (1, L) per tile
            entry_ref,                                  # HBM (8, Epad)
            init_ref,                                   # ANY (aliased output)
            out_ref,                                    # VMEM (1, 8, 64)
            buf_ref, sem,                               # scratch
            acc_m, acc_hits,
            *, levels: int, tpa: int, fit_shape: str, boundary_factor: float):
    del init_ref  # only present to seed the aliased output with NaN
    step = pl.program_id(0)
    t = occ_ref[step]  # compacted: grid steps visit only occupied tiles
    tz = t // (tpa * tpa)
    ty = (t // tpa) % tpa
    tx = t % tpa
    row = t % 8  # segment tables arrive in 8-tile SMEM blocks (tiling rule)

    total = jnp.int32(0)
    for li in range(levels):
        total = total + seg_lens_ref[row, li]

    @pl.when(total == 0)
    def _():
        out_ref[...] = jnp.full((1, 8, 64), jnp.nan, jnp.float32)

    @pl.when(total > 0)
    def _():
        # Tile-local corner coordinates, built in-kernel (Pallas cannot
        # capture array constants): index i = cz*64 + cy*8 + cx.
        idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_CORNERS, 1), 0)
        corners = jnp.concatenate(
            [idx % TILE, (idx // TILE) % TILE, idx // (TILE * TILE)],
            axis=1).astype(jnp.float32)                     # (512, 3)
        cc = jnp.sum(corners * corners, axis=-1)            # (512,)
        # Global tile origin (see ops/mls.py: one-subtraction re-centering).
        org = jnp.stack([
            (tx * TILE + origin_ref[0]).astype(jnp.float32),
            (ty * TILE + origin_ref[1]).astype(jnp.float32),
            (tz * TILE + origin_ref[2]).astype(jnp.float32),
        ])

        acc_m[...] = jnp.zeros((TILE_CORNERS, 16), jnp.float32)
        acc_hits[...] = jnp.zeros((TILE_CORNERS, 16), jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def dma_for(slot, base):
            return pltpu.make_async_copy(
                entry_ref.at[:, pl.ds(base, CHUNK)],
                buf_ref.at[slot], sem.at[slot])

        def process_window(slot, base, start, end):
            cols = buf_ref[slot]                             # (8, CHUNK)
            gidx = base + lane                               # (1, CHUNK)
            mask = (gidx >= start) & (gidx < end)

            x = cols[0:3, :] - org[:, None]                  # (3, CHUNK)
            invr2 = cols[3:4, :]                             # (1, CHUNK)
            nrm = cols[4:7, :]
            qual = cols[7:8, :]
            x2 = jnp.sum(x * x, axis=0, keepdims=True)       # (1, CHUNK)
            ndotx = jnp.sum(nrm * x, axis=0, keepdims=True)

            dotcx = jax.lax.dot_general(
                corners, x, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (512, CHUNK)
            pp = x2 - 2.0 * dotcx + cc[:, None]
            d = pp * invr2
            keep = (d < RADIUS_CUTOFF) & mask                # (512, CHUNK)
            w = 1.0 - d
            w = w * w
            w = w * w
            w = jnp.where(keep, w * qual, 0.0)

            feats = jnp.concatenate([
                jnp.ones((1, CHUNK), jnp.float32), x, x2, nrm, ndotx,
                jnp.zeros((7, CHUNK), jnp.float32),
            ], axis=0)                                       # (16, CHUNK)
            acc_m[...] += jax.lax.dot_general(
                w, feats, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (512, 16)
            acc_hits[...] += jax.lax.dot_general(
                keep.astype(jnp.float32), feats[0:16, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        for li in range(levels):  # static unroll over octree levels
            start = seg_starts_ref[row, li]
            ln = seg_lens_ref[row, li]
            w0 = start // CHUNK
            w1 = (start + ln + CHUNK - 1) // CHUNK

            # Double-buffered window streaming: window ci+1's DMA is in
            # flight while ci computes (the stage is DMA-latency bound;
            # single-buffered was ~25% slower on a bench block).
            @pl.when(w1 > w0)
            def _():
                dma_for(w0 % 2, w0 * CHUNK).start()

            def body(ci, _):
                slot = jax.lax.rem(ci, 2)
                dma_for(slot, ci * CHUNK).wait()

                @pl.when(ci + 1 < w1)
                def _():
                    dma_for(jax.lax.rem(ci + 1, 2), (ci + 1) * CHUNK).start()

                process_window(slot, ci * CHUNK, start, start + ln)
                return 0

            jax.lax.fori_loop(w0, w1, body, 0)

        m = acc_m[...]
        sum_w = m[:, 0]
        sx = m[:, 1:4]
        sxx = m[:, 4]
        sn = m[:, 5:8]
        snx = m[:, 8]
        hits = acc_hits[...][:, 0].astype(jnp.int32)

        sum_wp = sx - corners * sum_w[:, None]
        sum_wpp = (sxx - 2.0 * jnp.sum(corners * sx, axis=-1)
                   + cc * sum_w)
        sum_wpn = snx - jnp.sum(corners * sn, axis=-1)

        fit = FIT_MODELS[fit_shape]
        f = fit(sum_w, sum_wp, sum_wpp, sn, sum_wpn, hits,
                jnp.float32(boundary_factor))
        out_ref[...] = f.reshape(1, 8, 64)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_per_axis", "fit_shape", "boundary_factor",
                     "interpret", "tile_cap"))
def eval_field_pallas(entry_data: jnp.ndarray,
                      seg_starts: jnp.ndarray,
                      seg_lens: jnp.ndarray,
                      cell_origin: jnp.ndarray,
                      tiles_per_axis: int,
                      fit_shape: str = "sphere",
                      boundary_factor: float = 0.0,
                      interpret: bool = False,
                      tile_cap: int = 0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.mls.eval_field (no K cap: segments are
    walked in full, like the reference's unbounded command list — the
    max_total diagnostic is returned as 0 for interface compatibility).

    tile_cap > 0 enables occupied-tile compaction: grid steps visit only
    tiles whose segment totals are nonzero (a surface crosses a few percent
    of tiles; empty grid steps still cost an output DMA each). Returns
    (field, max_total, num_occupied_tiles) — the caller must retry with a
    larger tile_cap when num_occupied_tiles exceeds it (tiles beyond the cap
    would silently stay NaN)."""
    tpa = int(tiles_per_axis)
    num_tiles = tpa ** 3
    levels = seg_starts.shape[1]
    e = entry_data.shape[0]
    epad = ((e + CHUNK - 1) // CHUNK + 1) * CHUNK
    entry_t = jnp.zeros((8, epad), jnp.float32)
    entry_t = entry_t.at[:, :e].set(entry_data.T)

    compact = 0 < tile_cap < num_tiles
    if compact:
        totals = jnp.sum(seg_lens, axis=1)
        occ = totals > 0
        n_occ = jnp.sum(occ.astype(jnp.int32))
        key = jnp.where(occ, jnp.arange(num_tiles, dtype=jnp.int32),
                        jnp.int32(num_tiles))
        occ_tiles = jax.lax.sort(key)[:tile_cap]
        grid_steps = tile_cap
    else:
        n_occ = jnp.int32(num_tiles)
        occ_tiles = jnp.arange(num_tiles, dtype=jnp.int32)
        grid_steps = num_tiles

    # Row num_tiles is the dump target for padding grid steps; unvisited
    # tiles keep the NaN seeded through the aliased init input.
    init = jnp.full((num_tiles + 1, 8, 64), jnp.nan, jnp.float32)

    def seg_index(step, org_ref, occ_ref):
        return (jnp.minimum(occ_ref[step], num_tiles - 1) // 8, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        # The 3-int origin and the compacted tile list are scalar-prefetched;
        # the (T, L) segment tables would blow SMEM at 256^3 blocks, so they
        # stream in as per-tile SMEM blocks instead.
        num_scalar_prefetch=2,
        grid=(grid_steps,),
        in_specs=[
            pl.BlockSpec((8, levels), seg_index, memory_space=pltpu.SMEM),
            pl.BlockSpec((8, levels), seg_index, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # (1, 8, 64) satisfies the TPU tiling rule (trailing dims equal the
        # array's); 8*64 = one 512-corner tile per grid step.
        out_specs=pl.BlockSpec(
            (1, 8, 64),
            lambda step, org_ref, occ_ref: (occ_ref[step], 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),  # double-buffered windows
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE_CORNERS, 16), jnp.float32),
            pltpu.VMEM((TILE_CORNERS, 16), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, levels=levels, tpa=tpa, fit_shape=fit_shape,
        boundary_factor=float(boundary_factor))
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 8, 64), jnp.float32),
        input_output_aliases={5: 0},  # init (arg 5 incl. prefetch) -> out
        interpret=interpret,
    )(cell_origin.astype(jnp.int32), occ_tiles,
      seg_starts.astype(jnp.int32), seg_lens.astype(jnp.int32), entry_t,
      init)

    f = f[:num_tiles].reshape(tpa, tpa, tpa, TILE, TILE, TILE)
    field = f.transpose(0, 3, 1, 4, 2, 5).reshape(
        tpa * TILE, tpa * TILE, tpa * TILE)
    return field, jnp.int32(0), n_occ
