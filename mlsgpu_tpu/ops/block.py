"""The fused per-block device step: binning -> MLS field -> marching -> weld.

This is the TPU analogue of the reference's per-bucket device hot loop
(src/workers.cpp:232-286: SplatTreeCL::enqueueBuild, MlsFunctor,
Marching::generate, mesh readback) collapsed into one `jax.jit`ted function
with fully static shapes. One call consumes a padded splat batch for one
bucket region and produces a welded block mesh plus overflow diagnostics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlsgpu_tpu.ops import binning, marching, mls, weld


class BlockResult(NamedTuple):
    vertices: jnp.ndarray        # (vertex_cap, 3) f32 block-local grid coords
    key_hi: jnp.ndarray          # (vertex_cap,) uint32
    key_lo: jnp.ndarray          # (vertex_cap,) uint32
    triangles: jnp.ndarray       # (index_cap//3, 3) int32
    num_vertices: jnp.ndarray    # () welded vertices
    first_external: jnp.ndarray  # () first external welded vertex
    num_indices: jnp.ndarray     # () valid indices (3 * triangles)
    # Overflow diagnostics (host checks against the static caps):
    max_tile_candidates: jnp.ndarray  # () int32
    num_cells: jnp.ndarray            # () int32 occupied cells
    num_unwelded: jnp.ndarray         # () int32 pre-weld vertices
    num_occ_tiles: jnp.ndarray = None  # () int32 (pallas tile compaction)
    # Optional single-transfer readback image (pack_output=True): flat u32
    # [triangle index bits (num_indices) | external key hi,lo pairs
    #  (2*(nv-fe)) | vertex f32 bits (3*nv)], live prefix length
    # num_indices + 2*(nv-fe) + 3*nv. One d2h transfer replaces four and
    # skips the internal vertices' keys entirely.
    packed: jnp.ndarray = None


def _pack_readback(welded, vertex_cap: int, index_cap: int) -> jnp.ndarray:
    """Compact the welded mesh into one flat u32 buffer (the packing
    analogue of the reference's 3-event enqueueReadMesh, src/mesh.h:141-179,
    sized to the live counts).

    Three dynamic_update_slice copies in slop-safe order: each region is
    written at the END of the previous region's live prefix, so its static
    -size slop only overwrites the previous write's dead tail (an
    elementwise gather formulation was ~20x slower — TPU random gathers run
    at ~20ns/element)."""
    vc = vertex_cap
    nv = welded.num_vertices.astype(jnp.int32)
    fe = welded.first_external.astype(jnp.int32)
    ne = nv - fe

    tris_u32 = jax.lax.bitcast_convert_type(
        welded.triangles, jnp.uint32).reshape(-1)           # (index_cap,)
    # (hi, lo) interleave, shifted so externals start at element 0; the
    # zero pad lets dynamic_slice read a full 2*vc window from 2*fe.
    kv = jnp.stack([welded.key_hi, welded.key_lo], axis=1).reshape(-1)
    kv_pad = jnp.concatenate([kv, jnp.zeros(2 * vc, jnp.uint32)])
    keys_ext = jax.lax.dynamic_slice(kv_pad, (2 * fe,), (2 * vc,))
    verts_u32 = jax.lax.bitcast_convert_type(
        welded.vertices, jnp.uint32).reshape(-1)            # (3*vc,)

    buf = jnp.zeros(index_cap + 5 * vc, jnp.uint32)
    buf = jax.lax.dynamic_update_slice(buf, tris_u32, (0,))
    buf = jax.lax.dynamic_update_slice(buf, keys_ext, (welded.num_indices,))
    buf = jax.lax.dynamic_update_slice(
        buf, verts_u32, (welded.num_indices + 2 * ne,))
    return buf


def block_step_body(splats: jnp.ndarray,
                    valid: jnp.ndarray,
                    region_cells: jnp.ndarray,
                    cell_origin: jnp.ndarray,
                    boundary_factor: float,
                    *,
                    levels: int,
                    subsampling: int,
                    max_candidates: int,
                    cell_cap: int,
                    vertex_cap: int,
                    index_cap: int,
                    fit_shape: str = "sphere",
                    tile_chunk: int = 32,
                    mls_backend: str = "xla",
                    pack_output: bool = False,
                    occ_tile_cap: int = 0) -> BlockResult:
    """Reconstruct one block (un-jitted body; see block_step).

    Args:
      splats: (Npad, 8) f32 — *global* grid cell coords, col 3 = radius
        (cells). Global coords keep shared splats bitwise identical across
        blocks (crack avoidance; see ops/mls.py).
      valid: (Npad,) bool.
      region_cells: (3,) int32 (x,y,z) actual cells in the bucket region.
      cell_origin: (3,) int32 global cell coords of the block origin.
      boundary_factor: python float, 1 - gamma^2 (static: config-constant).
    """
    min_shift = subsampling
    max_shift = levels + subsampling - 1
    tiles_per_axis = 1 << (max_shift - 3)  # block corners / 8

    binned = binning.bin_splats(splats, valid, cell_origin,
                                min_shift, max_shift)
    starts, lens = binning.tile_segments(binned.entry_keys, min_shift,
                                         max_shift, tiles_per_axis)
    if mls_backend in ("pallas", "pallas_interpret"):
        # Fused VMEM kernel (~100x+ the XLA path on TPU, ops/mls_pallas.py).
        # No candidate cap: segments are walked in full.
        from mlsgpu_tpu.ops.mls_pallas import eval_field_pallas
        field, max_total, n_occ = eval_field_pallas(
            binned.entry_data, starts, lens, cell_origin, tiles_per_axis,
            fit_shape=fit_shape,
            boundary_factor=float(boundary_factor),
            interpret=(mls_backend == "pallas_interpret"),
            tile_cap=occ_tile_cap)
    else:
        field, max_total = mls.eval_field(
            binned.entry_data, starts, lens, cell_origin, tiles_per_axis,
            max_candidates, fit_shape, jnp.float32(boundary_factor),
            tile_chunk=tile_chunk)
        n_occ = jnp.int32(0)

    mesh = marching.generate(field, region_cells, cell_origin,
                             cell_cap, vertex_cap, index_cap)
    welded = weld.weld(mesh.vertices, mesh.key_hi, mesh.key_lo,
                       mesh.triangles, mesh.num_vertices, mesh.num_indices)

    return BlockResult(
        vertices=welded.vertices,
        key_hi=welded.key_hi,
        key_lo=welded.key_lo,
        triangles=welded.triangles,
        num_vertices=welded.num_vertices,
        first_external=welded.first_external,
        num_indices=welded.num_indices,
        max_tile_candidates=max_total,
        num_cells=mesh.num_cells,
        num_unwelded=mesh.num_vertices,
        num_occ_tiles=n_occ,
        packed=(_pack_readback(welded, vertex_cap, index_cap)
                if pack_output else None),
    )


block_step = functools.partial(
    jax.jit,
    static_argnames=("boundary_factor", "levels", "subsampling",
                     "max_candidates", "cell_cap", "vertex_cap", "index_cap",
                     "fit_shape", "tile_chunk", "mls_backend", "pack_output",
                     "occ_tile_cap"),
)(block_step_body)
block_step.__doc__ = "Jitted block_step_body (one compile per static config)."


def resolve_mls_backend(requested: str = "auto") -> str:
    """'auto' -> fused Pallas kernel on TPU, XLA elsewhere."""
    if requested != "auto":
        return requested
    import jax as _jax
    return "xla" if _jax.default_backend() == "cpu" else "pallas"
