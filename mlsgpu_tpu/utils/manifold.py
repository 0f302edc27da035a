"""Manifold verification for triangle meshes.

Semantic oracle re-created from the reference's test/manifold.h:45-120 and
extras/plymanifold.cpp:152-186: a mesh is manifold(-with-boundary) when

1. no triangle is degenerate (repeated vertex),
2. every *directed* edge appears at most once (consistent orientation and
   at most two triangles per undirected edge),
3. the triangles around every vertex form a single fan (vertex link is a
   simple path or cycle).

Also reports per-component metadata (vertex/triangle counts, boundary edges,
Euler characteristic) used by tests and the `plymanifold` CLI tool.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from mlsgpu_tpu.utils.union_find import UnionFind


@dataclass
class ManifoldReport:
    is_manifold: bool
    reason: Optional[str]
    num_vertices: int
    num_triangles: int
    num_boundary_edges: int
    num_components: int
    euler_characteristics: List[int]


def check_manifold(vertices: np.ndarray, triangles: np.ndarray) -> ManifoldReport:
    triangles = np.asarray(triangles, dtype=np.int64)
    nv = int(len(vertices))
    nt = int(len(triangles))

    def fail(reason: str) -> ManifoldReport:
        return ManifoldReport(False, reason, nv, nt, -1, -1, [])

    if nt and (triangles.min() < 0 or triangles.max() >= nv):
        return fail("triangle index out of range")

    a, b, c = triangles[:, 0], triangles[:, 1], triangles[:, 2]
    if np.any((a == b) | (b == c) | (a == c)):
        return fail("degenerate triangle")

    # Directed edges must be unique (orientation-consistent, <=2 per edge).
    de_from = np.concatenate([a, b, c])
    de_to = np.concatenate([b, c, a])
    directed = de_from * nv + de_to
    if len(np.unique(directed)) != len(directed):
        return fail("directed edge repeated (inconsistent orientation or >2 tris/edge)")

    # Undirected edge counts -> boundary edges.
    und = np.minimum(de_from, de_to) * nv + np.maximum(de_from, de_to)
    und_sorted = np.sort(und)
    uniq, counts = np.unique(und_sorted, return_counts=True)
    if np.any(counts > 2):
        return fail("edge shared by more than two triangles")
    num_boundary = int(np.sum(counts == 1))

    # Vertex-link check: for each vertex, triangles incident to it must form
    # one connected fan through shared edges at that vertex. Equivalent
    # counting argument: at vertex v with t incident triangles and e incident
    # edges, a single fan has e = t + 1 (open) or e = t (closed); multiple
    # fans or pinches give e > t + 1 / mixed. We verify via union-find over
    # incident triangles linked by shared undirected edges at v.
    tri_ids = np.tile(np.arange(nt, dtype=np.int64), 3)
    order = np.argsort(und, kind="stable")
    eu = und[order]
    et = tri_ids[order]
    same = eu[1:] == eu[:-1]  # pairs of triangles sharing an undirected edge
    pair_a = et[:-1][same]
    pair_b = et[1:][same]
    shared_edge = eu[:-1][same]

    # Per-vertex fan connectivity: run union-find per vertex over incident
    # triangles. Build (vertex, triangle) incidence and merge along shared
    # edges at each endpoint of the edge.
    uf = UnionFind(nt * 2)  # placeholder sizing; replaced below per vertex

    # Group incident triangles by vertex.
    inc_v = np.concatenate([a, b, c])
    inc_t = np.tile(np.arange(nt, dtype=np.int64), 3)
    vorder = np.argsort(inc_v, kind="stable")
    inc_v, inc_t = inc_v[vorder], inc_t[vorder]
    vstarts = np.searchsorted(inc_v, np.arange(nv + 1))

    # Map (vertex, triangle) -> slot index for a flat union-find.
    slot_of = {}
    for s in range(len(inc_v)):
        slot_of[(int(inc_v[s]), int(inc_t[s]))] = s
    uf = UnionFind(len(inc_v))
    ev0 = shared_edge // nv
    ev1 = shared_edge % nv
    for e0, e1, t0, t1 in zip(ev0, ev1, pair_a, pair_b):
        for v in (int(e0), int(e1)):
            uf.merge(slot_of[(v, int(t0))], slot_of[(v, int(t1))])
    roots = uf.roots()
    for v in range(nv):
        s0, s1 = vstarts[v], vstarts[v + 1]
        if s1 - s0 > 1 and len(np.unique(roots[s0:s1])) != 1:
            return fail(f"vertex {v} link is not a single fan")
        if s1 == s0:
            # isolated vertex: allowed only if mesh has no triangles at all
            if nt:
                return fail(f"isolated vertex {v}")

    # Components + Euler characteristic.
    cuf = UnionFind(nv)
    cuf.merge_pairs(np.concatenate([a, a]), np.concatenate([b, c]))
    vroots = cuf.roots()
    comp_ids = np.unique(vroots)
    eulers = []
    for cid in comp_ids:
        vs = vroots == cid
        nvc = int(np.sum(vs))
        ntc = int(np.sum(vroots[a] == cid))
        # count undirected edges in this component
        nec = int(np.sum(vroots[uniq // nv] == cid))
        eulers.append(nvc - nec + ntc)

    return ManifoldReport(True, None, nv, nt, num_boundary, len(comp_ids), eulers)
