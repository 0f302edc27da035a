"""Signed-distance field evaluation: the TPU form of kernels/mls.cl.

The reference's `processCorners` (kernels/mls.cl:299-433) walks an octree
command list per 8x8x8-corner workgroup, staging splats into local memory and
accumulating weighted moments per corner. Here the walk is already resolved
into per-tile contiguous segments (ops/binning.py); the accumulation is
restructured as dense linear algebra so it runs on the MXU:

  pairwise |x - c|^2 = |x|^2 - 2 c.x + |c|^2     -> one (512,3)x(3,K) matmul
  weights  w = relu(1-d)^4 * quality * mask       -> VPU elementwise
  moments  M = W @ [1, x, |x|^2, n, n.x]          -> one (512,K)x(K,9) matmul

Positions are re-centered on each tile's origin before the matmuls so the
|x|^2 expansion stays well-conditioned in float32 (corner-relative values are
O(tile + radius), never O(block)); the final per-corner re-centering of the
moments is exact in the same small frame.

A corner with < 4 hits or failing the boundary test gets NaN, exactly like
the reference (mls.cl:394-426).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlsgpu_tpu.models import FIT_MODELS
from mlsgpu_tpu.models.common import RADIUS_CUTOFF

TILE = 8            # corners per tile axis (the reference's WGS, src/mls.cpp:53)
TILE_CORNERS = TILE ** 3


def _corner_offsets() -> np.ndarray:
    """(512, 3) tile-local corner coordinates in (cz, cy, cx) C order,
    columns ordered (x, y, z)."""
    g = np.arange(TILE)
    cz, cy, cx = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1).astype(np.float32)


def eval_field(entry_data: jnp.ndarray,
               seg_starts: jnp.ndarray,
               seg_lens: jnp.ndarray,
               cell_origin: jnp.ndarray,
               tiles_per_axis: int,
               max_candidates: int,
               fit_shape: str,
               boundary_factor,
               tile_chunk: int = 32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the MLS signed distance on every corner of a block.

    Args:
      entry_data: (E, 8) f32 sorted entry splat data in *global* grid coords
        (col3 = 1/r^2). Splats are re-centered on each tile's global origin
        in a single f32 subtraction, so two blocks sharing a corner see
        bitwise-identical distances — block-local frames would introduce
        block-dependent rounding and cracks at seams.
      seg_starts/seg_lens: (T, L) per-tile per-level segments into entry_data.
      cell_origin: (3,) int32 global cell coords of the block origin.
      tiles_per_axis: block corners = 8 * tiles_per_axis.
      max_candidates: K, static per-tile candidate cap.
      fit_shape: 'sphere' | 'plane'.
      boundary_factor: 1 - gamma^2.
    Returns:
      field: (B, B, B) f32, indexed [z, y, x]; NaN = undefined.
      max_total: () int32 — max candidates any tile wanted; if > K the caller
        must retry with a larger K (the static-shape analogue of the
        reference's unbounded command list).
    """
    fit = FIT_MODELS[fit_shape]
    tpa = int(tiles_per_axis)
    num_tiles = tpa ** 3
    K = int(max_candidates)
    L = seg_starts.shape[1]
    E = entry_data.shape[0]

    cum = jnp.cumsum(seg_lens, axis=1)          # (T, L)
    cum0 = jnp.concatenate([jnp.zeros((num_tiles, 1), jnp.int32), cum[:, :-1]], axis=1)
    totals = cum[:, -1]
    max_total = jnp.max(totals)

    corners = jnp.asarray(_corner_offsets())     # (512, 3)
    cc = jnp.sum(corners * corners, axis=-1)     # (512,)

    ks = jnp.arange(K, dtype=jnp.int32)          # (K,)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    # Tile origins in *global* cell coords, (tz, ty, tx) C order. Integer
    # coords <= 2^21 are exact in f32.
    tz = tile_ids // (tpa * tpa)
    ty = (tile_ids // tpa) % tpa
    tx = tile_ids % tpa
    origins = (jnp.stack([tx, ty, tz], axis=1) * TILE
               + cell_origin[None, :].astype(jnp.int32)).astype(jnp.float32)

    def chunk_fn(tids):
        c_starts = seg_starts[tids]              # (C, L)
        c_cum = cum[tids]
        c_cum0 = cum0[tids]
        c_tot = totals[tids]
        c_org = origins[tids]                    # (C, 3)

        # Which level each candidate slot k falls into, then its entry index.
        lvl = jnp.sum(c_cum[:, None, :] <= ks[None, :, None], axis=-1)  # (C, K)
        lvl_c = jnp.minimum(lvl, L - 1)
        start_k = jnp.take_along_axis(c_starts, lvl_c, axis=1)
        cum0_k = jnp.take_along_axis(c_cum0, lvl_c, axis=1)
        idx = start_k + (ks[None, :] - cum0_k)
        mask = ks[None, :] < c_tot[:, None]                              # (C, K)
        idx = jnp.clip(idx, 0, E - 1)

        data = entry_data[idx]                   # (C, K, 8)
        x = data[..., 0:3] - c_org[:, None, :]   # tile-local splat positions
        invr2 = data[..., 3]
        nrm = data[..., 4:7]
        qual = data[..., 7]

        x2 = jnp.sum(x * x, axis=-1)             # (C, K)
        ndotx = jnp.sum(nrm * x, axis=-1)
        feats = jnp.concatenate([
            jnp.ones_like(x2)[..., None], x, x2[..., None], nrm, ndotx[..., None],
        ], axis=-1)                              # (C, K, 9)

        # HIGHEST precision: on TPU the default f32 matmul runs in bf16 MXU
        # passes, whose ~8-bit mantissa is catastrophic for |x-c|^2 expansion
        # (ulp(c.x) ~ 0.25 at block scale). HIGHEST uses the 6-pass f32
        # emulation and restores ~1e-6 relative accuracy.
        dotcx = jnp.einsum("cd,tkd->tck", corners, x,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)           # (C, 512, K)
        pp = x2[:, None, :] - 2.0 * dotcx + cc[None, :, None]
        d = pp * invr2[:, None, :]
        keep = (d < RADIUS_CUTOFF) & mask[:, None, :]
        w = 1.0 - d
        w = w * w
        w = w * w
        w = jnp.where(keep, w * qual[:, None, :], 0.0)
        hits = jnp.sum(keep, axis=-1)            # (C, 512)

        m = jnp.einsum("tck,tkm->tcm", w, feats,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)               # (C, 512, 9)
        sum_w = m[..., 0]
        sx = m[..., 1:4]
        sxx = m[..., 4]
        sn = m[..., 5:8]
        snx = m[..., 8]

        # Re-center moments on each corner (exact in the small tile frame).
        sum_wp = sx - corners[None] * sum_w[..., None]
        sum_wpp = (sxx - 2.0 * jnp.einsum("cd,tcd->tc", corners, sx,
                                          precision=jax.lax.Precision.HIGHEST)
                   + cc[None, :] * sum_w)
        sum_wpn = snx - jnp.einsum("cd,tcd->tc", corners, sn,
                                   precision=jax.lax.Precision.HIGHEST)

        return fit(sum_w, sum_wp, sum_wpp, sn, sum_wpn, hits, boundary_factor)

    # Occupied-tile compaction: a surface typically crosses a small fraction
    # of tiles; empty tiles (no candidates) are NaN by definition. Sorting
    # occupied tiles first and looping a *dynamic* number of chunks skips
    # the empty ones entirely (the XLA-friendly form of the reference's
    # early-out on start[code] < 0, kernels/mls.cl:325).
    chunk = min(tile_chunk, num_tiles)
    occupied = totals > 0
    order = jnp.argsort(~occupied, stable=True).astype(jnp.int32)
    n_occ = jnp.sum(occupied.astype(jnp.int32))
    n_chunks = (n_occ + chunk - 1) // chunk

    init = jnp.full((num_tiles, TILE_CORNERS), jnp.nan, jnp.float32)

    def body(carry):
        j, field = carry
        tids = jax.lax.dynamic_slice(order, (j * chunk,), (chunk,))
        f = chunk_fn(tids)
        return j + 1, field.at[tids].set(f)

    _, f = jax.lax.while_loop(lambda c: c[0] < n_chunks, body, (0, init))
    f = f.reshape(tpa, tpa, tpa, TILE, TILE, TILE)
    field = f.transpose(0, 3, 1, 4, 2, 5).reshape(tpa * TILE, tpa * TILE, tpa * TILE)
    return field, max_total
