"""Composable mesh filters applied to each welded block mesh.

Re-creation of the reference's MeshFilterChain (src/mesh_filter.h:57-170):
filters transform a block's (vertices, triangles) before the mesh reaches
the mesher/output functor. The reference runs these on the device via
kernels (kernels/scale_bias.cl:33-45); here the standard grid->world
ScaleBias transform is folded into the device/write path already, so the
chain operates on the host-side block meshes — the hook exists for custom
user transforms (clipping, decimation tags, coordinate changes) with the
same composition semantics.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

MeshFilter = Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]


class ScaleBiasFilter:
    """vertices * scale + bias (the reference's ScaleBiasFilter,
    src/mesh_filter.h:66-130). Grid objects provide the world transform."""

    def __init__(self, scale: float = 1.0, bias=(0.0, 0.0, 0.0)):
        self.scale = np.float32(scale)
        self.bias = np.asarray(bias, dtype=np.float32)

    @classmethod
    def from_grid(cls, grid) -> "ScaleBiasFilter":
        ext_lo = np.array([e[0] for e in grid.extents], np.float32)
        bias = np.asarray(grid.reference, np.float32) \
            + ext_lo * np.float32(grid.spacing)
        return cls(scale=grid.spacing, bias=bias)

    def __call__(self, vertices: np.ndarray, triangles: np.ndarray):
        return vertices * self.scale + self.bias, triangles


class MeshFilterChain:
    """Ordered filter composition feeding an output functor
    (src/mesh_filter.h:132-170)."""

    def __init__(self, filters: Sequence[MeshFilter] = ()):
        self.filters: List[MeshFilter] = list(filters)

    def add_filter(self, f: MeshFilter) -> None:
        self.filters.append(f)

    def __call__(self, vertices: np.ndarray, triangles: np.ndarray):
        for f in self.filters:
            vertices, triangles = f(vertices, triangles)
        return vertices, triangles


class DeviceScaleBias:
    """Device-side affine vertex transform, applied inside the jitted block
    step (the reference's ScaleBiasFilter kernel, src/mesh_filter.h:66-130 +
    kernels/scale_bias.cl:33-45). Hashable so it can be a static jit
    argument. Operates in block-local grid coordinates; compose into a
    DeviceFilterChain for multi-filter parity."""

    def __init__(self, scale: float = 1.0, bias=(0.0, 0.0, 0.0)):
        self.scale = float(scale)
        self.bias = tuple(float(b) for b in bias)

    def __hash__(self):
        return hash((DeviceScaleBias, self.scale, self.bias))

    def __eq__(self, other):
        return (type(other) is DeviceScaleBias and self.scale == other.scale
                and self.bias == other.bias)

    def __call__(self, vertices, cell_origin):
        # Vertices here are block-local; the host later adds the unscaled
        # block origin (block_result_to_input). Apply the affine map in
        # *global* grid coords and re-subtract the origin so that addition
        # lands on scale*(v_local + origin) + bias — otherwise scale != 1
        # would make welded vertices block-origin-dependent (adjacent
        # blocks disagreeing on shared vertices).
        import jax.numpy as jnp
        org = cell_origin.astype(jnp.float32)[None, :]
        s = jnp.float32(self.scale)
        b = jnp.asarray(self.bias, jnp.float32)[None, :]
        return (vertices + org) * s + b - org


class DeviceFilterChain:
    """Ordered composition of device vertex filters (MeshFilterChain on the
    device side, src/mesh_filter.h:132-170)."""

    def __init__(self, filters: Sequence = ()):
        self.filters = tuple(filters)

    def __hash__(self):
        return hash((DeviceFilterChain, self.filters))

    def __eq__(self, other):
        return (type(other) is DeviceFilterChain
                and self.filters == other.filters)

    def __call__(self, vertices, cell_origin):
        for f in self.filters:
            vertices = f(vertices, cell_origin)
        return vertices
