"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(the reference's mpirun-on-one-machine strategy, wscript:543-551)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlsgpu_tpu.parallel.sharded import (
    data_parallel_block_step, distributed_cell_bounds, make_mesh)
from mlsgpu_tpu.pipeline.mesher import BlockInput, OOCMesher
from mlsgpu_tpu.core.chunk import ChunkId
from mlsgpu_tpu.core.grid import Grid
from mlsgpu_tpu.utils.manifold import check_manifold

from tests import oracle

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


def test_distributed_cell_bounds():
    mesh = make_mesh()
    d = len(jax.devices())
    rng = np.random.default_rng(3)
    pos = rng.uniform(-5, 5, size=(d, 100, 3)).astype(np.float32)
    r = rng.uniform(0.1, 1.0, size=(d, 100)).astype(np.float32)
    valid = rng.random((d, 100)) < 0.7
    lo, hi, cnt = distributed_cell_bounds(
        mesh, jnp.asarray(pos), jnp.asarray(r), jnp.asarray(valid))
    pos_f = pos.reshape(-1, 3)[valid.reshape(-1)]
    r_f = r.reshape(-1)[valid.reshape(-1)]
    np.testing.assert_allclose(np.asarray(lo), (pos_f - r_f[:, None]).min(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hi), (pos_f + r_f[:, None]).max(0), rtol=1e-6)
    assert int(cnt) == valid.sum()


def test_data_parallel_blocks_weld():
    """Each device reconstructs one z-slab block of a sphere; host welding
    of the sharded results must produce a single closed manifold."""
    d = len(jax.devices())
    mesh = make_mesh()
    rng = np.random.default_rng(4)
    # sphere in a 31 x 31 x (d*15) cell volume, blocks split along z
    levels, sub = 2, 3  # 16^3-corner blocks... need >= slab size
    block = 32  # corners with levels=3
    levels = 3
    slab_cells = 15
    total_z = d * slab_cells
    center = np.array([15.0, 15.0, total_z / 2.0])
    radius = min(12.0, total_z / 2.0 - 2.5)
    n = 1000 * d
    splats = oracle.sphere_cloud(center, radius, n, 2.5, rng)

    npad = 1 << int(np.ceil(np.log2(n)))
    sp = np.zeros((d, npad, 8), np.float32)
    sp[:, :, 3] = 1.0
    va = np.zeros((d, npad), bool)
    regions = np.zeros((d, 3), np.int32)
    origins = np.zeros((d, 3), np.int32)
    for i in range(d):
        z0 = i * slab_cells
        # conservative: splats whose box intersects the slab
        sel = ((splats[:, 2] + splats[:, 3] >= z0)
               & (splats[:, 2] - splats[:, 3] < z0 + slab_cells))
        k = int(sel.sum())
        sp[i, :k] = splats[sel]  # global coords; the device re-centers
        va[i, :k] = True
        regions[i] = (31, 31, slab_cells)
        origins[i] = (0, 0, z0)

    result = data_parallel_block_step(
        mesh, jnp.asarray(sp), jnp.asarray(va), jnp.asarray(regions),
        jnp.asarray(origins), 0.0,
        levels=levels, subsampling=3, max_candidates=2048,
        cell_cap=1 << 14, vertex_cap=1 << 16, index_cap=3 << 16)

    grid = Grid.make((0, 0, 0), 1.0, [(0, 31), (0, 31), (0, total_z)])
    mesher = OOCMesher(grid, prune=0.0)
    for i in range(d):
        nv = int(result.num_vertices[i])
        ni = int(result.num_indices[i])
        fe = int(result.first_external[i])
        assert int(result.max_tile_candidates[i]) <= 2048
        verts = np.asarray(result.vertices[i])[:nv] + origins[i].astype(np.float32)
        tris = np.asarray(result.triangles[i])[:ni // 3]
        hi = np.asarray(result.key_hi[i])[fe:nv].astype(np.int64)
        lo = np.asarray(result.key_lo[i])[fe:nv].astype(np.int64)
        keys = ((hi & 0x7FFFFFFF) << 32) | lo
        mesher.add(BlockInput(ChunkId(gen=i), verts, fe, keys, tris))

    import tempfile, os
    out = os.path.join(tempfile.mkdtemp(), "dp.ply")
    mesher.write(out)
    from mlsgpu_tpu.io.ply import read_mesh
    verts, tris = read_mesh(out)
    rep = check_manifold(verts, tris)
    assert rep.is_manifold, rep.reason
    assert rep.num_boundary_edges == 0
    assert rep.num_components == 1
    assert rep.euler_characteristics == [2]
    mesher.cleanup()
