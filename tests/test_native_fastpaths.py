"""Native C++ fast paths vs the pure-numpy fallbacks.

The reference keeps its whole host runtime in C++ (mesher src/mesher.cpp,
readback src/mesh.h:141-179, final write src/mesher.cpp:763-852); our build
uses numpy fallbacks for portability and C++ for speed. These tests pin the
contracts: the native packed-readback decoder is bitwise-identical to the
numpy one, and a mesher fed through the native add/write paths produces
byte-identical PLY output to the numpy paths.
"""

import numpy as np
import pytest

from mlsgpu_tpu import _native as nat
from mlsgpu_tpu.core.chunk import ChunkId
from mlsgpu_tpu.core.grid import Grid
from mlsgpu_tpu.ops.block import (PackFormat, unpack_readback,
                                  unpack_readback_global)
from mlsgpu_tpu.pipeline.mesher import BlockInput, OOCMesher

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native library unavailable")


# ------------------------------------------------------------ packed decode
@pytest.mark.parametrize("index_mode,vertex_words,coord_bits", [
    ("u16", 3, 8), ("u16", 4, 10), ("u21x3", 4, 13), ("u32", 4, 13),
])
def test_unpack_readback_native_bitwise(index_mode, vertex_words, coord_bits):
    rng = np.random.default_rng(42)
    fmt = PackFormat(index_mode, vertex_words, coord_bits)
    nv, ni, fe = 237, 3 * 151, 180
    cell_origin = np.array([64, 128, 0], np.int64)
    total = fmt.index_cap_words(ni) + fmt.vertex_region_words(nv) + 7
    flat = rng.integers(0, 1 << 32, size=total, dtype=np.uint64
                        ).astype(np.uint32)

    ref_v, ref_t, ref_k = unpack_readback(flat, ni, nv, fe, fmt, cell_origin)
    ref_v = ref_v + cell_origin.astype(np.float32)
    got = nat.unpack_readback(flat, ni, nv, fe, index_mode, vertex_words,
                              cell_origin)
    assert got is not None
    v, t, k = got
    np.testing.assert_array_equal(v.view(np.uint32), ref_v.view(np.uint32))
    np.testing.assert_array_equal(t, ref_t)
    np.testing.assert_array_equal(k, ref_k)

    # the dispatcher helper picks the native path and matches too
    v2, t2, k2 = unpack_readback_global(flat, ni, nv, fe, fmt, cell_origin)
    np.testing.assert_array_equal(v2.view(np.uint32), ref_v.view(np.uint32))


def test_unpack_readback_native_empty():
    fmt = PackFormat("u16", 4, 10)
    flat = np.zeros(64, np.uint32)
    v, t, k = nat.unpack_readback(flat, 0, 0, 0, "u16", 4,
                                  np.zeros(3, np.int64))
    assert len(v) == 0 and len(t) == 0 and len(k) == 0


# ------------------------------------------------------- mesher add + write
def _random_blocks(rng, n_blocks=12, chunks=2):
    """Random block meshes sharing external keys across blocks (so the
    cross-block weld and clump merge paths are exercised)."""
    shared_pool = rng.integers(1 << 20, 1 << 21, size=64, dtype=np.int64)
    blocks = []
    for b in range(n_blocks):
        n = int(rng.integers(8, 200))
        fe = int(rng.integers(0, n))
        n_ext = n - fe
        verts = rng.random((n, 3), np.float32) * 100
        m = int(rng.integers(1, 3 * n))
        tris = rng.integers(0, n, size=(m, 3), dtype=np.int64)
        # half the externals reuse shared keys, half are unique
        keys = np.where(rng.random(n_ext) < 0.5,
                        rng.choice(shared_pool, size=n_ext),
                        rng.integers(1 << 30, 1 << 40, size=n_ext,
                                     dtype=np.int64))
        cid = ChunkId(gen=b, coords=(b % chunks, 0, 0))
        blocks.append(BlockInput(cid, verts, fe, keys, tris))
    return blocks


def _force_numpy_paths(mesher, monkeypatch):
    monkeypatch.setattr(OOCMesher, "_add_native",
                        lambda self, *a, **k: False)
    monkeypatch.setattr(nat, "available", lambda: False)


@pytest.mark.parametrize("prune", [0.0, 0.25])
def test_mesher_native_matches_numpy_output(tmp_path, monkeypatch, prune):
    grid = Grid.make((0, 0, 0), 0.5, [(0, 128)] * 3)
    rng_seed = 7
    blocks = _random_blocks(np.random.default_rng(rng_seed))

    m_nat = OOCMesher(grid, prune=prune)
    for blk in blocks:
        m_nat.add(blk)
    out_nat = str(tmp_path / "nat.ply")
    m_nat.write(out_nat, split_size=1 << 20)  # chunked: one file per chunk
    outs_nat = sorted(tmp_path.glob("nat_*.ply"))
    m_nat.cleanup()

    with monkeypatch.context() as mp:
        m_np = OOCMesher(grid, prune=prune)
        _force_numpy_paths(m_np, mp)
        for blk in blocks:
            m_np.add(blk)
        out_np = str(tmp_path / "ref.ply")
        m_np.write(out_np, split_size=1 << 20)
        outs_np = sorted(tmp_path.glob("ref_*.ply"))
        m_np.cleanup()

    assert len(outs_nat) == len(outs_np) > 0
    for a, b in zip(outs_nat, outs_np):
        assert a.read_bytes() == b.read_bytes(), (a, b)


def test_mesher_native_corrupt_block_raises():
    from mlsgpu_tpu.utils.errors import StateError
    grid = Grid.make((0, 0, 0), 1.0, [(0, 100)] * 3)
    mesher = OOCMesher(grid)
    v = np.zeros((3, 3), np.float32)
    t = np.array([[0, 1, 7]])  # 7 out of range
    with pytest.raises(StateError):
        mesher.add(BlockInput(ChunkId(), v, 3, np.zeros(0, np.int64), t))
    mesher.cleanup()


def test_write_pass_helpers_match_numpy():
    rng = np.random.default_rng(3)
    n, m = 1000, 1800
    raw_v = np.empty((n, 4), np.uint32)
    raw_v[:, :3] = (rng.random((n, 3), np.float32) * 100).view(np.uint32)
    raw_v[:, 3] = rng.integers(0, 50, size=n)      # clump lane
    parent = np.arange(64, dtype=np.int64)
    parent[10] = 3                                  # one merged clump
    pruned = np.sort(np.array([3, 17], np.int64))   # prune roots 3, 17

    kept, remap = nat.write_pass_a(raw_v, parent, pruned, nv_base=5)
    roots = np.where(parent[raw_v[:, 3]] == raw_v[:, 3],
                     raw_v[:, 3], parent[raw_v[:, 3]])
    keep = ~np.isin(roots, pruned)
    assert kept == int(keep.sum())
    exp = np.full(n, 0xFFFFFFFF, np.uint32)
    exp[keep] = 5 + np.arange(kept, dtype=np.uint32)
    np.testing.assert_array_equal(remap, exp)

    ext_lo = np.array([1, 2, 3], np.float32)
    reference = np.array([0.5, 0.25, 0.125], np.float32)
    world = nat.write_verts(raw_v, remap, ext_lo, 0.5, reference)
    ref_world = (raw_v[keep, :3].view(np.float32) + ext_lo) \
        * np.float32(0.5) + reference
    np.testing.assert_array_equal(world.view(np.uint32),
                                  ref_world.view(np.uint32))

    raw_t = rng.integers(0, n, size=(m, 3), dtype=np.uint64
                         ).astype(np.uint32)
    payload = nat.write_tris(raw_t, remap)
    tk = remap[raw_t[:, 0]] != 0xFFFFFFFF
    tris = remap[raw_t[tk]]
    exp_rec = np.empty((len(tris), 13), np.uint8)
    exp_rec[:, 0] = 3
    exp_rec[:, 1:] = tris.astype("<u4").view(np.uint8).reshape(-1, 12)
    assert payload == exp_rec.tobytes()
    assert nat.count_tris_kept(raw_t, remap) == int(tk.sum())
