"""Unit tests for the manifold oracle (test/manifold.h:45-120 semantics:
edge degrees, orientation, single-fan vertex links, component metadata)."""

import numpy as np

from mlsgpu_tpu.utils.manifold import check_manifold


def tetra():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    # outward-consistent orientation
    tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int64)
    return verts, tris


def test_closed_tetrahedron():
    rep = check_manifold(*tetra())
    assert rep.is_manifold
    assert rep.num_boundary_edges == 0
    assert rep.num_components == 1
    assert rep.euler_characteristics == [2]


def test_open_fan_has_boundary():
    verts = np.zeros((4, 3), np.float32)
    verts[:, 0] = np.arange(4)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    rep = check_manifold(verts, tris)
    assert rep.is_manifold
    assert rep.num_boundary_edges == 4
    assert rep.euler_characteristics == [1]  # disc


def test_two_components():
    v, t = tetra()
    v2 = np.concatenate([v, v + 10.0])
    t2 = np.concatenate([t, t + 4])
    rep = check_manifold(v2, t2)
    assert rep.is_manifold and rep.num_components == 2
    assert rep.euler_characteristics == [2, 2]


def test_inconsistent_orientation_fails():
    verts = np.zeros((4, 3), np.float32)
    verts[:, 0] = np.arange(4)
    tris = np.array([[0, 1, 2], [0, 1, 3]], np.int64)  # both traverse 0->1
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold
    assert "directed edge" in rep.reason


def test_three_triangles_per_edge_fails():
    verts = np.zeros((5, 3), np.float32)
    verts[:, 0] = np.arange(5)
    tris = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4]], np.int64)
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold


def test_open_bowtie_allowed():
    """Two OPEN fans meeting at vertex 0: allowed by the reference's
    manifold definition (test/manifold.h:82-87 — a vertex may sit on
    multiple boundary loops; this occurs on chunk cut planes)."""
    verts = np.zeros((5, 3), np.float32)
    verts[:, 0] = np.arange(5)
    tris = np.array([[0, 1, 2], [0, 3, 4]], np.int64)
    rep = check_manifold(verts, tris)
    assert rep.is_manifold
    assert rep.num_boundary_edges == 6


def _tet(a, b, c, d):
    return [[a, b, c], [a, c, d], [a, d, b], [b, d, c]]


def test_closed_bowtie_pinch_fails():
    """Two tetrahedra sharing one vertex: two closed rings at the shared
    vertex ('tunnels between interior regions', test/manifold.h:204-218)."""
    verts = np.zeros((7, 3), np.float32)
    verts[:, 0] = np.arange(7)
    tris = np.array(_tet(0, 1, 2, 3) + _tet(0, 4, 5, 6), np.int64)
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold
    assert "vertex 0" in rep.reason


def test_mixed_interior_boundary_link_fails():
    """A closed ring plus a dangling triangle at one vertex ('both in the
    interior and on the boundary', test/manifold.h:198-203)."""
    verts = np.zeros((6, 3), np.float32)
    verts[:, 0] = np.arange(6)
    tris = np.array(_tet(0, 1, 2, 3) + [[0, 4, 5]], np.int64)
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold
    assert "vertex 0" in rep.reason


def test_degenerate_triangle_fails():
    verts = np.zeros((3, 3), np.float32)
    tris = np.array([[0, 1, 1]], np.int64)
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold
    assert "degenerate" in rep.reason


def test_isolated_vertex_fails():
    verts = np.zeros((4, 3), np.float32)
    tris = np.array([[0, 1, 2]], np.int64)
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold
    assert "isolated" in rep.reason


def test_index_out_of_range_fails():
    verts = np.zeros((3, 3), np.float32)
    tris = np.array([[0, 1, 5]], np.int64)
    rep = check_manifold(verts, tris)
    assert not rep.is_manifold
