"""Streaming block executor: overlaps disk loading, host prep, device
compute, and mesher consumption.

This is the TPU-native replacement for the reference's thread pipeline
(BucketLoader -> CopyGroup -> DeviceWorkerGroup, src/workers.*,
src/worker_group.h): a loader thread reads each bucket's blob ranges and
builds padded device inputs behind a bounded queue (backpressure ==
CircularBuffer); the main thread dispatches the jitted block step — JAX's
async dispatch plays the role of the in-flight command queues (P2) — and
keeps a small window of blocks in flight before forcing results. Multiple
local devices are fed round-robin (the reference's P3 multi-GPU
load-balancing, src/workers.cpp:315-351).

Cap overflows are detected at consumption time and the block is re-run with
doubled caps (rare; one extra compile thanks to the persistent cache).
"""

from __future__ import annotations

import copy
import queue
import threading
import time
from collections import deque
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mlsgpu_tpu.io.splat_set import SplatSource, merge_ranges
from mlsgpu_tpu.ops.block import BlockResult, block_step
from mlsgpu_tpu.utils import logging as log
from mlsgpu_tpu.utils import timeplot
from mlsgpu_tpu.utils import misc
from mlsgpu_tpu.utils.misc import next_pow2, eighth_pow2_ceil
from mlsgpu_tpu.utils.statistics import get_registry

_SENTINEL = object()

# Return glibc-freed heap spans to the OS every N forced blocks: the
# per-block host churn (h2d staging + decode + mesher scratch) otherwise
# accretes as retained-free brk heap — measured ~28 MB/block at 1B scale
# (utils.misc.malloc_trim).
_TRIM_EVERY = 8

# Rolling window (blocks) over which the speculative-readback size tracks
# the max live transfer; bounds how long one outlier block inflates
# dispatch-time transfers (VERDICT r4 weak #3).
_SPEC_RECENT = 48


def _pick_devices(num: int) -> List:
    devs = jax.local_devices()
    if num > 0:
        devs = devs[:num]
    return devs


def _dispatch(padded, valid, bucket, cfg, caps, device,
              device_filter=None, points=None) -> BlockResult:
    from mlsgpu_tpu.ops.block import (block_step_staged, resolve_mls_backend,
                                      resolve_readback)
    stats = get_registry()
    with stats.timer("dispatch.h2d"):
        args = dict(
            splats=jax.device_put(padded, device),
            valid=jax.device_put(valid, device),
            region_cells=jax.device_put(
                np.asarray(bucket.cell_hi - bucket.cell_lo, np.int32), device),
            cell_origin=jax.device_put(
                np.asarray(bucket.cell_lo, np.int32), device),
            points=(None if points is None
                    else jax.device_put(points, device)),
        )
    step = (block_step_staged if getattr(cfg, "statistics_device", False)
            else block_step)
    t_call = time.monotonic()
    result = step(
        **args,
        boundary_factor=float(cfg.boundary_factor),
        levels=cfg.device_levels, subsampling=cfg.subsampling,
        max_candidates=caps.max_candidates,
        cell_cap=caps.cell_cap, vertex_cap=caps.vertex_cap,
        index_cap=caps.index_cap, fit_shape=cfg.fit_shape,
        mls_backend=resolve_mls_backend(getattr(cfg, "mls_backend", "auto")),
        pack_output=True,
        occ_tile_cap=caps.occ_tile_cap,
        march_tile_cap=caps.march_tile_cap,
        device_filter=device_filter,
        readback=resolve_readback(getattr(cfg, "readback", "auto"),
                                  cfg.device_levels, cfg.subsampling))
    t_call = time.monotonic() - t_call
    stats.variable("dispatch.call").add(t_call)
    if t_call > 3.0:
        # Async dispatch of a cached program is milliseconds; seconds mean
        # a trace+compile happened (a new pad shape or grown caps).
        stats.counter("dispatch.compiles").add(1)
    # NOTE: do NOT copy_to_host_async the full packed buffer here — on this
    # platform d2h transfers do not overlap device compute, so an eager
    # full-cap transfer serializes the pipeline (measured 1.9x slower than
    # slicing the live prefix at force time).
    return result


def _check_overflow(result: BlockResult, built, caps, counts=None,
                    check_index: bool = True, attempt: int = 0,
                    grown: Optional[list] = None,
                    headroom: float = 1.0) -> bool:
    """Detect overflow against `built` — the caps the result's program was
    BUILT with — and grow the run's shared `caps` for the retry; returns
    True when a retry is needed (forces the diagnostic scalars — the sync
    point). `built` and `caps` differ when another block's retry grew the
    shared caps while this result was in flight: checking against the live
    caps would then accept a stale overflowed result whose garbage counts
    happen to fit the grown caps (a real corrupt-mesh bug, not a
    theoretical one). Caps grow to eighth-pow2 steps after ~6% headroom:
    the cap-sized gather/sort stages of marching and weld are the device
    hot spots, so cap slop is wall time. `attempt` > 0 means this block
    already retried once: counts
    measured by an overflowed program can understate the true demand (an
    overfull upstream stage truncates what downstream stages see), so a
    REPEAT overflow doubles instead of near-fitting — every extra retry
    costs a full block_step recompile (~80 s measured), while cap slop
    costs milliseconds per block. `grown`, when given, collects
    "name old->new (measured)" strings for the retry log. Growth is
    value-safe: shared-face corners are bitwise K-independent (canonical
    face pass), and interior corners are single-block-owned (a ~1 ulp
    K-sensitivity there cannot crack the mesh; see PLAN.md)."""
    def grow(cur, n):
        # `headroom` > 1 scales the measured demand before rounding: the
        # sizing probe passes 1.5 because its max-splat bucket only
        # predicts OTHER blocks' vertex/cell demand to ~±40% (measured on
        # the 2M bench), and a mid-run miss costs an ~80 s recompile while
        # cap slop costs ms/block.
        n = int(int(n) * headroom) + int(n) // 16 + 1
        target = eighth_pow2_ceil(n)
        if attempt > 0:
            target = max(target, 2 * cur)
        return max(cur, target)

    def note(name, old, new, n):
        if grown is not None and new != old:
            grown.append(f"{name} {old}->{new} (measured {n})")

    from mlsgpu_tpu.ops.block import fetch_counts
    if counts is None:
        counts = fetch_counts(result)  # ONE d2h for all diagnostics
    (_, _, ni, mt, nc, nuw, n_occ, nmt) = (int(v) for v in counts)

    retry = False
    if mt > built.max_candidates:
        old = caps.max_candidates
        caps.max_candidates = grow(caps.max_candidates, mt)
        note("K", old, caps.max_candidates, mt)
        retry = True
    if nc > built.cell_cap:
        old = caps.cell_cap
        caps.cell_cap = grow(caps.cell_cap, nc)
        note("cells", old, caps.cell_cap, nc)
        retry = True
    if nuw > built.vertex_cap:
        old = caps.vertex_cap
        caps.vertex_cap = grow(caps.vertex_cap, nuw)
        note("verts", old, caps.vertex_cap, nuw)
        retry = True
    # codes-mode readbacks have no device index arrays: the host sizes its
    # triangle rebuild from the true count, so index_cap never gates there.
    if check_index and ni > built.index_cap:
        old = caps.index_cap
        caps.index_cap = 3 * grow(caps.index_cap // 3, ni // 3 + 1)
        note("inds", old, caps.index_cap, ni)
        retry = True
    if built.occ_tile_cap and getattr(result, "num_occ_tiles", None) is not None:
        if n_occ > built.occ_tile_cap:
            from mlsgpu_tpu.pipeline.reconstruct import MAX_OCC_TILE_CAP
            from mlsgpu_tpu.utils.errors import MlsError
            if n_occ > MAX_OCC_TILE_CAP:
                # The compacted tile list is SMEM-resident scalar prefetch;
                # growing past the hardware bound would fail at compile
                # time with an opaque Mosaic error — fail with the remedy.
                raise MlsError(
                    f"block needs {n_occ} occupied MLS tiles, above the "
                    f"SMEM scalar-prefetch bound ({MAX_OCC_TILE_CAP}); "
                    "re-run with a smaller --device-block-shift so device "
                    "dispatches cover fewer tiles")
            old = caps.occ_tile_cap
            caps.occ_tile_cap = min(grow(caps.occ_tile_cap, n_occ),
                                    MAX_OCC_TILE_CAP)
            note("occTiles", old, caps.occ_tile_cap, n_occ)
            retry = True
    if (getattr(built, "march_tile_cap", 0)
            and getattr(result, "num_march_tiles", None) is not None):
        if nmt > built.march_tile_cap:
            old = caps.march_tile_cap
            caps.march_tile_cap = grow(caps.march_tile_cap, nmt)
            note("marchTiles", old, caps.march_tile_cap, nmt)
            retry = True
    return retry


def _prefix_size(n: int, cap: int) -> int:
    """Transfer-slice size for a live count n: next power of two, refined by
    eighth-steps (<= 12.5% slop vs up to 100% for plain pow2). Each distinct
    size compiles one trivial device slice program, so sizes must come from
    a small set — this yields at most 8 per octave (the d2h link is the
    pipeline bottleneck, so slop is wall time)."""
    p = next_pow2(max(n, 1))
    step = max(p // 8, 1)
    return min(((n + step - 1) // step) * step, cap)


class PrefetchedResult:
    """A forced BlockResult whose live data is already on its way to the
    host (copy_to_host_async issued) — the analogue of the reference's
    3-event async enqueueReadMesh (src/mesh.h:141-179). When the result
    carries a packed readback image (ops/block._pack_readback) only its live
    prefix travels: one quantized transfer, no key region. The count scalars
    are pre-read.

    `spec`, when given, is a speculative prefix slice whose d2h copy was
    issued at DISPATCH time (spec_words wide): if the live data fits inside
    it, the transfer is already done/in flight and no fresh slice program or
    host round trip is needed — on this tunnel every transfer the host has
    to initiate after a counts sync costs ~35 ms fixed + a 23 ms scalar
    round trip (measured, tools/bench_d2h)."""

    def __init__(self, result: BlockResult, pack_fmt=None, counts=None,
                 spec=None, spec_words: int = 0):
        from mlsgpu_tpu.ops.block import fetch_counts
        if counts is None:
            counts = fetch_counts(result)
        self.num_vertices = int(counts[0])
        self.first_external = int(counts[1])
        self.num_indices = int(counts[2])
        self.num_cells = int(counts[4])
        self.num_unwelded = int(counts[5])
        self.pack_fmt = pack_fmt

        def prefix(arr, n):
            if n <= 0:
                return arr[:0]
            s = arr[:min(_prefix_size(n, arr.shape[0]), arr.shape[0])]
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            return s

        nv = self.num_vertices
        self.packed = None
        if getattr(result, "packed", None) is not None and pack_fmt is not None:
            total = pack_fmt.live_words(counts)
            stats = get_registry()
            if spec is not None and total <= spec_words:
                # the bytes are already travelling; rebuild reads only the
                # live regions, the speculative tail is ignored
                self.packed = spec
                stats.counter("readback.specHits").add(1)
            else:
                self.packed = prefix(result.packed, total)
                if spec is not None:
                    stats.counter("readback.specMisses").add(1)
            self.live_words = total
            return
        self.vertices = prefix(result.vertices, nv)
        self.triangles = prefix(result.triangles, self.num_indices // 3)
        self.key_hi = prefix(result.key_hi, nv)
        self.key_lo = prefix(result.key_lo, nv)


def consume_threaded(pairs: Iterator, fn, depth: int = 2) -> None:
    """Run `fn(bucket, result)` on a dedicated consumer thread while the
    producer iterator (the dispatch/force loop) keeps the device fed — the
    reference's single-threaded MesherGroup (src/workers.h:74-131,
    src/workers.cpp:60-108). Even on one host core this overlaps real time:
    the producer's scalar-sync and d2h waits release the GIL, so the
    consumer's decode/union-find CPU work runs inside them (and vice
    versa). `depth` bounds queued results (each holds one block's mesh
    readback window). Exceptions on either side cancel the other and
    re-raise."""
    out_q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: List[BaseException] = []

    def consumer():
        while True:
            item = out_q.get()
            if item is _SENTINEL:
                return
            try:
                fn(*item)
            except BaseException as e:
                err.append(e)
                return

    t = threading.Thread(target=consumer, name="mesher", daemon=True)
    t.start()
    try:
        for pair in pairs:
            while not err:
                try:
                    out_q.put(pair, timeout=0.2)
                    break
                except queue.Full:
                    continue
            if err:
                break
    finally:
        close = getattr(pairs, "close", None)
        if close is not None:
            close()  # run the producer's cleanup (loader join) promptly
        while not err:
            try:
                out_q.put(_SENTINEL, timeout=0.2)
                break
            except queue.Full:
                continue
        t.join()
    if err:
        raise err[0]


def stream_blocks(source: SplatSource, info, buckets: Sequence, cfg, caps,
                  devices: Optional[List] = None,
                  window: Optional[int] = None,
                  device_filter=None,
                  bucket_iter=None
                  ) -> Iterator[Tuple[object, BlockResult]]:
    """Yield (bucket, forced+prefetched result) for every bucket, pipelined.

    `buckets` sizes the run-wide pads/budgets (every bucket that COULD be
    streamed); `bucket_iter`, when given, is the possibly-lazy iterable of
    buckets actually streamed — the distributed dynamic work queue claims
    chunks through it at the loader's pace, so claim-ahead is bounded by the
    prefetch window (the pull-model scatter, mlsgpu-mpi.cpp:202-246)."""
    stats = get_registry()
    # Every pipeline entry point (single-host reconstruct, distributed
    # ranks, tools) streams through here, so bound glibc's mmap threshold
    # once centrally (ADVICE r4: reconstruct_distributed bypassed the
    # reconstruct()-level call and kept the ~31 GB dead-heap pathology).
    misc.bound_mmap_threshold()
    devices = devices if devices is not None else _pick_devices(cfg.num_devices)
    if window is None:
        # --device-threads N = N in-flight blocks per device (the reference's
        # per-device command queues, src/workers.h:183-206), min 2 for
        # load/compute overlap on one device.
        window = max(2, getattr(cfg, "device_threads", 1) * len(devices))
    window = max(window, len(devices))

    # Byte budgets (the reference's CircularBuffer backpressure,
    # src/circular_buffer.h:47-248 + src/mlsgpu_core.cpp:130-137). Blocks
    # are uniformly padded (below), so bounding counts IS byte accounting:
    # --mem-load-splats bounds the loader queue, --mem-host-splats the queue
    # plus the retained in-flight inputs, --mem-mesh the in-flight mesh
    # readback images.
    maxn = max((b.num_splats for b in buckets), default=1)
    pad_to = eighth_pow2_ceil(maxn)
    # Skeleton points share one run-wide pad too (a distinct pad is a
    # distinct block_step compile).
    max_pts = max((0 if b.skeleton is None else len(b.skeleton)
                   for b in buckets), default=0)
    pts_pad = eighth_pow2_ceil(max_pts) if max_pts else 0

    def padded_points(b):
        if pts_pad == 0:
            return None
        pts = np.full((pts_pad, 3), -1, np.int32)
        if b.skeleton is not None and len(b.skeleton):
            pts[:len(b.skeleton)] = b.skeleton.astype(np.int32)
        return pts
    block_bytes = pad_to * (8 * 4 + 1)  # padded f32 splats + valid bool
    q_budget = max(1, int(getattr(cfg, "mem_load_splats", 1 << 62))
                   // block_bytes)
    host_budget = max(2, int(getattr(cfg, "mem_host_splats", 1 << 62))
                      // block_bytes - q_budget)
    from mlsgpu_tpu.ops.block import (codes_format, pack_format,
                                      resolve_readback)
    # A device filter transforms vertices off the cell-edge lattice, so
    # neither quantized layout applies — raw arrays travel (as before).
    rb_mode = ("raw" if device_filter is not None
               else resolve_readback(getattr(cfg, "readback", "auto"),
                                     cfg.device_levels, cfg.subsampling))
    if rb_mode == "codes":
        cfmt = codes_format(cfg.device_levels, cfg.subsampling)
        mesh_bytes = 4 * cfmt.total_words(caps.cell_cap, caps.vertex_cap)
    else:
        fmt = pack_format(cfg.device_levels, cfg.subsampling, caps.vertex_cap)
        mesh_bytes = 4 * (fmt.total_words(caps.index_cap, caps.vertex_cap)
                          if fmt is not None
                          else caps.index_cap + 5 * caps.vertex_cap)
    mesh_budget = max(1, int(getattr(cfg, "mem_mesh", 1 << 62)) // mesh_bytes)
    eff_window = min(window, host_budget, mesh_budget)
    if eff_window < window:
        log.info(f"in-flight window {window} -> {eff_window} "
                 f"(mem_host_splats/mem_mesh budgets)")
        window = max(eff_window, 1)
    load_q: "queue.Queue" = queue.Queue(maxsize=min(window + 1, q_budget))
    # Per-container peaks (reference allocator.h:58-250): bytes queued by
    # the loader, retained in-flight block inputs, and the in-flight mesh
    # readback window — the three containers the mem_* budgets bound.
    pk_load = stats.peak("mem.loadQueue")
    pk_host = stats.peak("mem.hostSplats")
    pk_mesh = stats.peak("mem.meshWindow")
    blob_start = info.blobs.start
    blob_count = info.blobs.count
    grid = info.grid

    # Sizing probe (the fix for a measured ~250 s of mid-run recompiles at
    # 10M splats): run the densest bucket ONCE up front, growing caps on
    # overflow, and discard the result. Per-block demands correlate with
    # bucket size, so the run proper is then single-program in the common
    # case — without this, every mid-run cap growth recompiles block_step
    # (~80 s) and re-runs the block. The probe also means caps stop growing
    # mid-run in the common case, so every block runs the SAME program (the
    # determinism caveat in PLAN.md). Skipped for small runs, where the
    # duplicate block outweighs a possible recompile.
    if len(buckets) >= 16 and getattr(cfg, "sizing_probe", True):
        from mlsgpu_tpu.pipeline.reconstruct import prepare_block_inputs
        probe = max(buckets, key=lambda b: b.num_splats)
        with stats.timer("streamer.probe"):
            ranges = merge_ranges(
                (int(blob_start[i]), int(blob_start[i] + blob_count[i]))
                for i in probe.blob_ids)
            p_pad, p_valid = prepare_block_inputs(
                source.read_ranges(ranges), probe, grid, pad_to=pad_to)
            p_pts = padded_points(probe)
            attempt = 0
            while True:
                built = copy.copy(caps)
                result = _dispatch(p_pad, p_valid, probe, cfg, caps,
                                   devices[0], device_filter, points=p_pts)
                p_grown: list = []
                if not _check_overflow(result, built, caps,
                                       check_index=(rb_mode != "codes"),
                                       attempt=attempt, grown=p_grown,
                                       headroom=1.5):
                    break
                stats.counter("streamer.probeRetries").add(1)
                log.info(f"sizing probe: cap overflow, retry "
                         f"{attempt + 1}: {'; '.join(p_grown)}")
                attempt += 1
            del result, p_pad, p_valid, p_pts

    error: List[BaseException] = []
    cancel = threading.Event()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer has gone away, so the
        loader can always be joined (the reference asserts ordered shutdown,
        src/worker_group.h:287-291)."""
        while not cancel.is_set():
            try:
                load_q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    # One padded shape for the whole run (computed above): every distinct
    # shape costs a block_step trace+compile (tens of seconds on this host),
    # so uniform padding to the largest bucket is a large net win (the
    # reference sizes its splat buffers to --mem-bucket-splats once for the
    # same reason, src/workers.h:183-206). Eighth-pow2 granularity keeps h2d
    # slop <= 12.5% (plain pow2 wastes up to 2x of the ~40 MB/s link).

    def loader():
        worker = timeplot.Worker("loader")
        try:
            from mlsgpu_tpu.pipeline.reconstruct import prepare_block_inputs
            for b in (bucket_iter if bucket_iter is not None else buckets):
                if cancel.is_set():
                    return
                with timeplot.Action("load", worker,
                                     stats.variable("loader.time")):
                    ranges = merge_ranges(
                        (int(blob_start[i]), int(blob_start[i] + blob_count[i]))
                        for i in b.blob_ids)
                    splats = source.read_ranges(ranges)
                    padded, valid = prepare_block_inputs(splats, b, grid,
                                                         pad_to=pad_to)
                if not _put((b, padded, valid, padded_points(b))):
                    return
                pk_load.add(block_bytes)
        except BaseException as e:  # propagate to consumer
            error.append(e)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=loader, name="loader", daemon=True)
    thread.start()

    inflight: deque = deque()
    forced = 0
    # Spare-capacity scheduling (the reference's CopyGroup picks the device
    # with the most free queue slots, src/workers.cpp:315-351): dispatch to
    # the device with the fewest dispatched-but-unforced blocks, ties by
    # least-recently-dispatched. Under FIFO forcing a ties-by-index rule
    # parks the warm-up tie on device 0 forever; LRU ties degrade to exact
    # round-robin on uniform blocks and still win when block costs vary.
    in_use = [0] * len(devices)
    last_used = [0] * len(devices)
    dispatch_seq = 0
    compute_worker = timeplot.Worker("device")

    # Speculative readback window (u32 words): the d2h copy of this much of
    # the packed buffer is issued at DISPATCH time, before the counts are
    # known — when the live data fits, the force path needs no host-
    # initiated transfer at all (~35 ms fixed + 23 ms counts round trip per
    # block on this tunnel, tools/bench_d2h). Adapts to 1.25x the largest
    # live size of the last _SPEC_RECENT blocks, eighth-pow2 quantized (few
    # distinct slice programs); starts at 0 so the first blocks calibrate
    # it. The rolling max (rather than a run max) lets one outlier block
    # stop inflating every later dispatch-time transfer once it leaves the
    # window — on a ~42 MB/s link speculative slop is wall time; wasted
    # bytes are reported as readback.specBytesWasted.
    spec_state = {"words": 0, "recent": deque(maxlen=_SPEC_RECENT)}

    def _speculate(result):
        if spec_state["words"] <= 0 or getattr(result, "packed", None) is None:
            return None, 0
        try:
            result.counts.copy_to_host_async()
            w = min(spec_state["words"], result.packed.shape[0])
            spec = result.packed[:w]
            spec.copy_to_host_async()
            return spec, w
        except Exception:
            return None, 0

    def force(entry):
        from mlsgpu_tpu.ops.block import fetch_counts, pack_format
        b, padded, valid, pts, result, device, di, built, spec, specw = entry
        in_use[di] -= 1
        with timeplot.Action("compute", compute_worker,
                             stats.variable("device.time")):
            counts = fetch_counts(result)  # one d2h for all diagnostics
            attempt = 0
            grown: list = []
            while _check_overflow(result, built, caps, counts=counts,
                                  check_index=(rb_mode != "codes"),
                                  attempt=attempt, grown=grown):
                stats.counter("device.capRetries").add(1)
                log.info(f"bucket {getattr(b, 'seq', '?')} (chunk "
                         f"{b.chunk_id.coords}): cap overflow, retry "
                         f"{attempt + 1}: {'; '.join(grown)}")
                attempt += 1
                grown.clear()
                built = copy.copy(caps)
                result = _dispatch(padded, valid, b, cfg, caps, device,
                                   device_filter, points=pts)
                counts = fetch_counts(result)
                spec, specw = None, 0  # the retried program replaced it
        # The pack layout is the one the ACCEPTED result's program used —
        # built.vertex_cap, not the live caps (which may have grown past an
        # index-width threshold while this block was in flight).
        fmt = (cfmt if rb_mode == "codes"
               else None if rb_mode == "raw"
               else pack_format(cfg.device_levels, cfg.subsampling,
                                built.vertex_cap))
        out = PrefetchedResult(result, pack_fmt=fmt, counts=counts,
                               spec=spec, spec_words=specw)
        live = getattr(out, "live_words", 0)
        if live:
            if specw:
                # Hit: the tail past the live prefix travelled for nothing.
                # Miss: the whole speculative slice was useless (the real
                # transfer re-sent the live prefix).
                wasted = (specw - live) if live <= specw else specw
                stats.counter("readback.specBytesWasted").add(4 * wasted)
            packed_cap = result.packed.shape[0]
            spec_state["recent"].append(live)
            spec_state["words"] = _prefix_size(
                min(int(max(spec_state["recent"]) * 1.25), packed_cap),
                packed_cap)
        return b, out

    try:
        while True:
            item = load_q.get()
            if item is _SENTINEL:
                # A loader failure is raised promptly, before draining the
                # in-flight window: an error mid-run must cancel the run,
                # not ride behind up to `window` forced blocks.
                if error:
                    raise error[0]
                break
            b, padded, valid, pts = item
            pk_load.add(-block_bytes)
            pk_host.add(block_bytes)
            di = min(range(len(devices)),
                     key=lambda i: (in_use[i], last_used[i]))
            device = devices[di]
            in_use[di] += 1
            dispatch_seq += 1
            last_used[di] = dispatch_seq
            with stats.timer("streamer.dispatch"):
                built = copy.copy(caps)
                result = _dispatch(padded, valid, b, cfg, caps, device,
                                   device_filter, points=pts)
                spec, specw = _speculate(result)
            inflight.append((b, padded, valid, pts, result, device, di, built,
                             spec, specw))
            pk_mesh.set(len(inflight) * mesh_bytes)
            if len(inflight) > window:
                out = force(inflight.popleft())
                pk_host.add(-block_bytes)
                yield out
                forced += 1
                if forced % _TRIM_EVERY == 0:
                    misc.malloc_trim()
        while inflight:
            out = force(inflight.popleft())
            pk_host.add(-block_bytes)
            yield out
        misc.malloc_trim()
    finally:
        cancel.set()
        thread.join()
