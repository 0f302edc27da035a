"""Marching tetrahedra over a dense distance-field block.

The reference streams swathes of slices through genOccupied / scan /
generateElements with atomics and blocking readbacks
(kernels/marching.cl, src/marching.cpp:500-823). On TPU the whole block is
classified densely: occupancy codes and per-cell vertex/index counts are a
table gather, offsets are an exclusive scan, and emission is a masked scatter
(`mode='drop'`) into static-capacity buffers. Dynamic totals are returned so
the host can detect cap overflow and retry larger — the static-shape analogue
of the reference's ship-out-when-full (src/marching.h:77-80).

Vertex keys use the reference's scheme (kernels/marching.cl:144-163):
21-bit-per-axis fixed point of the doubled global edge-midpoint coordinates,
packed here into two uint32 lanes (hi: ext|z|y_hi, lo: y_lo|x) because TPUs
have no fast uint64; the external flag makes externals sort last. Unlike the
reference (which leaves z=0 implicit in its swathe order), externals are
marked on all six block faces — welding is symmetric across blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mlsgpu_tpu.ops import tables

PAD_KEY = jnp.uint32(0xFFFFFFFF)

# (8, 3) corner offsets; corner id bit a = offset along axis a.
_CORNER_OFFS = np.array([[(v >> a) & 1 for a in range(3)] for v in range(8)],
                        dtype=np.int32)


class BlockMesh(NamedTuple):
    """Unwelded marching output for one block (static-cap padded)."""
    vertices: jnp.ndarray   # (vertex_cap, 3) f32, block-local grid coords
    key_hi: jnp.ndarray     # (vertex_cap,) uint32
    key_lo: jnp.ndarray     # (vertex_cap,) uint32
    triangles: jnp.ndarray  # (index_cap // 3, 3) int32 into vertices
    num_cells: jnp.ndarray  # () int32 — occupied cells (may exceed cell_cap!)
    num_vertices: jnp.ndarray  # () int32
    num_indices: jnp.ndarray   # () int32


def generate(field: jnp.ndarray,
             region_cells: jnp.ndarray,
             cell_origin: jnp.ndarray,
             cell_cap: int,
             vertex_cap: int,
             index_cap: int) -> BlockMesh:
    """Run marching tetrahedra on a (B, B, B) corner field (indexed [z,y,x]).

    Args:
      field: signed distances, NaN = undefined.
      region_cells: (3,) int32 (x, y, z) — cells actually inside the bucket
        region (<= B-1 per axis); cells beyond are masked off.
      cell_origin: (3,) int32 (x, y, z) global cell coords of local cell 0.
      *_cap: static capacities.
    """
    assert index_cap % 3 == 0
    b = field.shape[0]
    nc = b - 1
    flat_field = field.reshape(-1)

    # --- dense classification ------------------------------------------------
    corner_vals = [
        field[dz:dz + nc, dy:dy + nc, dx:dx + nc]
        for (dx, dy, dz) in _CORNER_OFFS
    ]
    code = jnp.zeros((nc, nc, nc), dtype=jnp.int32)
    finite = jnp.ones((nc, nc, nc), dtype=bool)
    for v, cv in enumerate(corner_vals):
        code = code | (jnp.where(cv >= 0.0, 1, 0) << v)
        finite = finite & jnp.isfinite(cv)

    zz, yy, xx = jnp.meshgrid(jnp.arange(nc), jnp.arange(nc), jnp.arange(nc),
                              indexing="ij")
    in_region = ((xx < region_cells[0]) & (yy < region_cells[1])
                 & (zz < region_cells[2]))
    occupied = (finite & in_region & (code != 0) & (code != 255)).reshape(-1)
    code = code.reshape(-1)

    count_tab = jnp.asarray(tables.COUNT_TABLE)          # (256, 2)
    nv = jnp.where(occupied, count_tab[code, 0], 0)
    ni = jnp.where(occupied, count_tab[code, 1], 0)

    occ_rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    voff = jnp.cumsum(nv) - nv
    ioff = jnp.cumsum(ni) - ni
    num_cells = occ_rank[-1] + 1
    num_vertices = voff[-1] + nv[-1]
    num_indices = ioff[-1] + ni[-1]

    # --- compact occupied cells ---------------------------------------------
    flat_idx = jnp.arange(nc * nc * nc, dtype=jnp.int32)
    slot = jnp.where(occupied, occ_rank, cell_cap)
    occ_cell = jnp.zeros(cell_cap, jnp.int32).at[slot].set(flat_idx, mode="drop")
    occ_voff = jnp.zeros(cell_cap, jnp.int32).at[slot].set(voff.astype(jnp.int32), mode="drop")
    occ_ioff = jnp.zeros(cell_cap, jnp.int32).at[slot].set(ioff.astype(jnp.int32), mode="drop")
    occ_valid = jnp.arange(cell_cap) < num_cells

    # --- per-occupied-cell emission -------------------------------------------
    cz = occ_cell // (nc * nc)
    cy = (occ_cell // nc) % nc
    cx = occ_cell % nc
    cell_xyz = jnp.stack([cx, cy, cz], axis=1)            # (cap, 3) local

    offs = jnp.asarray(_CORNER_OFFS)
    base = cz * (b * b) + cy * b + cx
    corner_flat = (base[:, None]
                   + offs[None, :, 2] * (b * b) + offs[None, :, 1] * b
                   + offs[None, :, 0])                     # (cap, 8)
    iso = flat_field[corner_flat]                          # (cap, 8)
    occ_code = jnp.zeros(cell_cap, jnp.int32)
    for v in range(8):
        occ_code = occ_code | (jnp.where(iso[:, v] >= 0.0, 1, 0) << v)

    # Vertices: interpolate along each used edge (kernels/marching.cl:129-141).
    vert_tab = jnp.asarray(tables.VERT_TABLE)              # (256, MV)
    edges = jnp.asarray(tables.EDGES)                      # (19, 2)
    edge_key = jnp.asarray(tables.EDGE_KEY)                # (19, 3)
    mv = tables.MAX_CELL_VERTICES

    vedge = vert_tab[occ_code]                             # (cap, MV), -1 pad
    vvalid = (vedge >= 0) & occ_valid[:, None]
    vedge_c = jnp.maximum(vedge, 0)
    e0 = edges[vedge_c, 0]
    e1 = edges[vedge_c, 1]
    iso0 = jnp.take_along_axis(iso, e0, axis=1)
    iso1 = jnp.take_along_axis(iso, e1, axis=1)
    off0 = offs[e0]                                        # (cap, MV, 3)
    off1 = offs[e1]
    t = iso0 / (iso0 - iso1)
    pos = (cell_xyz[:, None, :] + off0).astype(jnp.float32) \
        + t[..., None] * (off1 - off0).astype(jnp.float32)

    # Keys: doubled global coordinates of the edge midpoint.
    kc_local = 2 * cell_xyz[:, None, :] + edge_key[vedge_c]   # (cap, MV, 3)
    kc = (kc_local + 2 * cell_origin[None, None, :]).astype(jnp.uint32)
    top = (2 * region_cells).astype(jnp.int32)
    ext = jnp.any(kc_local == 0, axis=-1) | jnp.any(kc_local == top[None, None, :], axis=-1)
    key_lo = kc[..., 0] | ((kc[..., 1] & jnp.uint32(0x7FF)) << 21)
    key_hi = ((kc[..., 1] >> 11) | (kc[..., 2] << 10)
              | (ext.astype(jnp.uint32) << 31))

    vtarget = jnp.where(vvalid, occ_voff[:, None] + jnp.arange(mv)[None, :],
                        vertex_cap)
    vertices = jnp.zeros((vertex_cap, 3), jnp.float32).at[
        vtarget.reshape(-1)].set(pos.reshape(-1, 3), mode="drop")
    out_hi = jnp.full(vertex_cap, PAD_KEY).at[
        vtarget.reshape(-1)].set(key_hi.reshape(-1), mode="drop")
    out_lo = jnp.full(vertex_cap, PAD_KEY).at[
        vtarget.reshape(-1)].set(key_lo.reshape(-1), mode="drop")

    # Indices: local vertex ids offset by the cell's vertex base.
    index_tab = jnp.asarray(tables.INDEX_TABLE)            # (256, MI)
    mi = tables.MAX_CELL_INDICES
    ilocal = index_tab[occ_code]                           # (cap, MI), -1 pad
    ivalid = (ilocal >= 0) & occ_valid[:, None]
    ival = occ_voff[:, None] + jnp.maximum(ilocal, 0)
    itarget = jnp.where(ivalid, occ_ioff[:, None] + jnp.arange(mi)[None, :],
                        index_cap)
    indices = jnp.zeros(index_cap, jnp.int32).at[
        itarget.reshape(-1)].set(ival.reshape(-1), mode="drop")

    return BlockMesh(
        vertices=vertices,
        key_hi=out_hi,
        key_lo=out_lo,
        triangles=indices.reshape(-1, 3),
        num_cells=num_cells.astype(jnp.int32),
        num_vertices=num_vertices.astype(jnp.int32),
        num_indices=num_indices.astype(jnp.int32),
    )
