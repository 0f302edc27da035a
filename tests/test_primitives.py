"""Unit tests for L0 primitives: misc arithmetic, errors, union-find,
statistics, timeplot, progress (mirrors the reference's perBuild tier:
test/test_misc.cpp, test/test_union_find.cpp, test/test_statistics.cpp)."""

import io

import numpy as np
import pytest

from mlsgpu_tpu.config import ReconstructConfig, parse_capacity
from mlsgpu_tpu.utils import misc, timeplot
from mlsgpu_tpu.utils.errors import InvalidOption
from mlsgpu_tpu.utils.progress import ProgressCounter, ProgressDisplay
from mlsgpu_tpu.utils.statistics import Registry
from mlsgpu_tpu.utils.union_find import UnionFind


def test_misc_arithmetic():
    assert misc.div_up(0, 4) == 0
    assert misc.div_up(1, 4) == 1
    assert misc.div_up(4, 4) == 1
    assert misc.div_up(5, 4) == 2
    assert misc.round_up(5, 4) == 8
    assert misc.round_up(8, 4) == 8
    assert misc.div_down(-1, 4) == -1
    assert misc.div_down(-4, 4) == -1
    assert misc.div_down(3, 4) == 0
    assert misc.next_pow2(0) == 1
    assert misc.next_pow2(1) == 1
    assert misc.next_pow2(5) == 8
    assert misc.next_pow2(8) == 8


def test_union_find_basic():
    uf = UnionFind(10)
    uf.merge(0, 1)
    uf.merge(1, 2)
    uf.merge(5, 6)
    assert uf.find(0) == uf.find(2)
    assert uf.find(0) != uf.find(5)
    assert uf.component_size(2) == 3
    assert uf.component_size(5) == 2
    assert uf.component_size(9) == 1


def test_union_find_merge_pairs_matches_sequential():
    rng = np.random.default_rng(42)
    n = 500
    pairs = rng.integers(0, n, size=(800, 2))

    seq = UnionFind(n)
    for x, y in pairs:
        seq.merge(int(x), int(y))
    vec = UnionFind(n)
    vec.merge_pairs(pairs[:, 0], pairs[:, 1])

    # Same partition (compare canonicalized labels)...
    r1 = seq.roots()
    r2 = vec.roots()
    _, l1 = np.unique(r1, return_inverse=True)
    _, l2 = np.unique(r2, return_inverse=True)
    # partitions equal iff the label pairs are in bijection
    m1 = {}
    for x, y in zip(l1, l2):
        assert m1.setdefault(x, y) == y
    # ...and same component sizes
    sizes1 = sorted(np.unique(r1, return_counts=True)[1])
    sizes2 = sorted(np.unique(r2, return_counts=True)[1])
    assert sizes1 == sizes2
    # explicit size metadata agrees with actual component sizes
    for x in range(0, n, 37):
        assert vec.component_size(x) == int(np.sum(r2 == r2[x]))


def test_statistics_registry():
    reg = Registry()
    reg.counter("bucket.count").add(3)
    reg.counter("bucket.count").add(2)
    assert reg.counter("bucket.count").get() == 5

    v = reg.variable("pass.time")
    for x in (1.0, 2.0, 3.0):
        v.add(x)
    assert v.get_mean() == pytest.approx(2.0)
    assert v.get_stddev() == pytest.approx(1.0)

    p = reg.peak("mem.mesher")
    p.add(100)
    p.add(50)
    p.sub(120)
    assert p.get() == 30
    assert p.get_max() == 150

    with reg.timer("phase.t"):
        pass
    assert reg.timer("phase.t").n == 1

    # merge (the MPI statistics-gather analogue)
    other = Registry()
    other.counter("bucket.count").add(7)
    other.variable("pass.time").add(4.0)
    reg.merge(other)
    assert reg.counter("bucket.count").get() == 12
    assert reg.variable("pass.time").n == 4

    # dict round-trip (serialization across hosts)
    d = reg.to_dict()
    fresh = Registry()
    fresh.load_dict(d)
    assert fresh.counter("bucket.count").get() == 12
    assert fresh.variable("pass.time").sum == reg.variable("pass.time").sum


def test_statistics_type_conflict():
    reg = Registry()
    reg.counter("x")
    with pytest.raises(TypeError):
        reg.variable("x")


def test_timeplot_nesting(tmp_path):
    path = tmp_path / "tp.txt"
    timeplot.init(str(path))
    w = timeplot.Worker("main")
    with timeplot.Action("outer", w):
        with timeplot.Action("inner", w):
            pass
    timeplot.init(None)
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 3  # outer pause, inner, outer resume-finish
    assert all(line.startswith("EVENT main ") for line in lines)
    # intervals must not overlap within one worker
    spans = [(float(l.split()[3]), float(l.split()[4])) for l in lines]
    spans.sort()
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 <= s1 + 1e-9


def test_progress():
    pc = ProgressCounter(10)
    pc += 4
    pc.add(6)
    assert pc.current == 10
    buf = io.StringIO()
    pd = ProgressDisplay(4, stream=buf, min_interval=0.0)
    for _ in range(4):
        pd += 1
    assert pd.current == 4
    assert "100.0%" in buf.getvalue()


def test_config_validation_and_capacity():
    cfg = ReconstructConfig()
    cfg.validate()
    assert cfg.block_corners == 256
    assert cfg.block_cells == 255
    assert cfg.micro_cells == 63
    assert parse_capacity("512M") == 512 * 1024 ** 2
    assert parse_capacity("2G") == 2 * 1024 ** 3
    assert parse_capacity(42) == 42
    with pytest.raises(InvalidOption):
        parse_capacity("xyz")
    bad = ReconstructConfig(fit_grid=-1)
    with pytest.raises(InvalidOption):
        bad.validate()
    bad2 = ReconstructConfig(subsampling=2)
    with pytest.raises(InvalidOption):
        bad2.validate()
    # Block sizes up to the reference's 2^13 bound (Marching::
    # MAX_DIMENSION_LOG2, src/marching.h:117-141) are accepted; volumes
    # beyond device_block_shift stream as aligned sub-volume dispatches
    # (the z-swathe streaming analogue, src/marching.cpp:783-823).
    ReconstructConfig(levels=8, subsampling=3).validate()   # 2^10: one dispatch
    big = ReconstructConfig(levels=11, subsampling=3)       # 2^13: streamed
    big.validate()
    assert big.device_shift == 10 and big.device_block_cells == 1023
    assert big.device_levels == 8
    with pytest.raises(InvalidOption, match="levels \\+ subsampling"):
        ReconstructConfig(levels=10, subsampling=5).validate()  # 2^14: too big
    with pytest.raises(InvalidOption, match="device_block_shift"):
        ReconstructConfig(device_block_shift=11).validate()
    with pytest.raises(InvalidOption, match="device_block_shift"):
        ReconstructConfig(subsampling=7, levels=3,
                          device_block_shift=6).validate()
    with pytest.raises(InvalidOption):
        ReconstructConfig(scatter="pull").validate()
