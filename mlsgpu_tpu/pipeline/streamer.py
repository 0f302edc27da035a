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

import queue
import threading
from collections import deque
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mlsgpu_tpu.io.splat_set import SplatSource, merge_ranges
from mlsgpu_tpu.ops.block import BlockResult, block_step
from mlsgpu_tpu.utils import logging as log
from mlsgpu_tpu.utils import timeplot
from mlsgpu_tpu.utils.misc import next_pow2
from mlsgpu_tpu.utils.statistics import get_registry

_SENTINEL = object()


def _pick_devices(num: int) -> List:
    devs = jax.local_devices()
    if num > 0:
        devs = devs[:num]
    return devs


def _dispatch(padded, valid, bucket, cfg, caps, device) -> BlockResult:
    from mlsgpu_tpu.ops.block import resolve_mls_backend
    args = dict(
        splats=jax.device_put(padded, device),
        valid=jax.device_put(valid, device),
        region_cells=jax.device_put(
            np.asarray(bucket.cell_hi - bucket.cell_lo, np.int32), device),
        cell_origin=jax.device_put(
            np.asarray(bucket.cell_lo, np.int32), device),
    )
    result = block_step(
        **args,
        boundary_factor=float(cfg.boundary_factor),
        levels=cfg.levels, subsampling=cfg.subsampling,
        max_candidates=caps.max_candidates,
        cell_cap=caps.cell_cap, vertex_cap=caps.vertex_cap,
        index_cap=caps.index_cap, fit_shape=cfg.fit_shape,
        mls_backend=resolve_mls_backend(getattr(cfg, "mls_backend", "auto")),
        pack_output=True,
        occ_tile_cap=caps.occ_tile_cap)
    # NOTE: do NOT copy_to_host_async the full packed buffer here — on this
    # platform d2h transfers do not overlap device compute, so an eager
    # full-cap transfer serializes the pipeline (measured 1.9x slower than
    # slicing the live prefix at force time).
    return result


def _check_overflow(result: BlockResult, caps) -> bool:
    """Grow caps if the block overflowed; returns True when a retry is
    needed (forces the diagnostic scalars — the sync point)."""
    retry = False
    mt = int(result.max_tile_candidates)
    if mt > caps.max_candidates:
        caps.max_candidates = next_pow2(mt)
        retry = True
    nc = int(result.num_cells)
    if nc > caps.cell_cap:
        caps.cell_cap = next_pow2(nc)
        retry = True
    nuw = int(result.num_unwelded)
    if nuw > caps.vertex_cap:
        caps.vertex_cap = next_pow2(nuw)
        retry = True
    ni = int(result.num_indices)
    if ni > caps.index_cap:
        caps.index_cap = 3 * next_pow2(ni // 3 + 1)
        retry = True
    if caps.occ_tile_cap and getattr(result, "num_occ_tiles", None) is not None:
        nt = int(result.num_occ_tiles)
        if nt > caps.occ_tile_cap:
            caps.occ_tile_cap = next_pow2(nt)
            retry = True
    return retry


class PrefetchedResult:
    """A forced BlockResult whose live data is already on its way to the
    host (copy_to_host_async issued) — the analogue of the reference's
    3-event async enqueueReadMesh (src/mesh.h:141-179). When the result
    carries a packed readback image (ops/block._pack_readback) only its live
    prefix travels: one transfer, externals-only keys. The count scalars are
    pre-read."""

    def __init__(self, result: BlockResult):
        self.num_vertices = int(result.num_vertices)
        self.num_indices = int(result.num_indices)
        self.first_external = int(result.first_external)

        def prefix(arr, n):
            if n <= 0:
                return arr[:0]
            m = min(next_pow2(n), arr.shape[0])
            s = arr[:m]
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            return s

        nv = self.num_vertices
        self.packed = None
        if getattr(result, "packed", None) is not None:
            ne = nv - self.first_external
            total = 3 * nv + 2 * ne + self.num_indices
            self.packed = prefix(result.packed, total)
            return
        self.vertices = prefix(result.vertices, nv)
        self.triangles = prefix(result.triangles, self.num_indices // 3)
        self.key_hi = prefix(result.key_hi, nv)
        self.key_lo = prefix(result.key_lo, nv)


def stream_blocks(source: SplatSource, info, buckets: Sequence, cfg, caps,
                  devices: Optional[List] = None, window: Optional[int] = None
                  ) -> Iterator[Tuple[object, BlockResult]]:
    """Yield (bucket, forced+prefetched result) for every bucket, pipelined."""
    stats = get_registry()
    devices = devices if devices is not None else _pick_devices(cfg.num_devices)
    if window is None:
        # --device-threads N = N in-flight blocks per device (the reference's
        # per-device command queues, src/workers.h:183-206), min 2 for
        # load/compute overlap on one device.
        window = max(2, getattr(cfg, "device_threads", 1) * len(devices))
    window = max(window, len(devices))
    load_q: "queue.Queue" = queue.Queue(maxsize=window + 1)
    blob_start = info.blobs.start
    blob_count = info.blobs.count
    grid = info.grid
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

    # One padded shape for the whole run: h2d transfer is cheap (a few
    # ms/MB) but every distinct shape costs a block_step trace+compile
    # (tens of seconds on this host), so uniform padding to the largest
    # bucket is a large net win (the reference sizes its splat buffers to
    # --mem-bucket-splats once for the same reason, src/workers.h:183-206).
    pad_to = next_pow2(max((b.num_splats for b in buckets), default=1))

    def loader():
        worker = timeplot.Worker("loader")
        try:
            from mlsgpu_tpu.pipeline.reconstruct import prepare_block_inputs
            for b in buckets:
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
                if not _put((b, padded, valid)):
                    return
        except BaseException as e:  # propagate to consumer
            error.append(e)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=loader, name="loader", daemon=True)
    thread.start()

    inflight: deque = deque()
    dev_idx = 0
    compute_worker = timeplot.Worker("device")

    def force(entry):
        b, padded, valid, result, device = entry
        with timeplot.Action("compute", compute_worker,
                             stats.variable("device.time")):
            while _check_overflow(result, caps):
                stats.counter("device.capRetries").add(1)
                log.info(f"block {b.chunk_id.gen}: cap overflow, retrying "
                         f"(K={caps.max_candidates}, cells={caps.cell_cap}, "
                         f"verts={caps.vertex_cap}, inds={caps.index_cap})")
                result = _dispatch(padded, valid, b, cfg, caps, device)
        return b, PrefetchedResult(result)

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
            b, padded, valid = item
            device = devices[dev_idx % len(devices)]
            dev_idx += 1
            with stats.timer("streamer.dispatch"):
                result = _dispatch(padded, valid, b, cfg, caps, device)
            inflight.append((b, padded, valid, result, device))
            if len(inflight) > window:
                yield force(inflight.popleft())
        while inflight:
            yield force(inflight.popleft())
    finally:
        cancel.set()
        thread.join()
