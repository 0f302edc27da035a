"""Stress tier for the concurrency primitives (the reference's perNightly
registry: circular-buffer stress test/test_circular_buffer.cpp:188,
work-queue stress test/test_work_queue.cpp:71, async-writer stress
test/test_async.cpp:60). Marked slow: runs in the perCommit/perNightly
tier, deselect with `-m "not slow"`."""

import os
import random
import threading
import time

import numpy as np
import pytest

from mlsgpu_tpu.io.async_io import AsyncWriter
from mlsgpu_tpu.io.spill import SpillStore

pytestmark = pytest.mark.slow


class TestSpillStoreStress:
    def test_concurrent_appends_across_flush_boundary(self, tmp_path):
        """4 producer threads × 300 random-size appends against a tiny
        budget, so the async flusher and the 2x-budget backpressure engage
        constantly; after freeze every record reads back exactly, whether
        it landed on disk or stayed in the memory window."""
        os.environ.setdefault("TMPDIR", str(tmp_path))
        store = SpillStore("stress", mem_budget=64 * 1024)
        rng = random.Random(42)
        records = [[] for _ in range(4)]
        errors = []

        def producer(t):
            r = random.Random(100 + t)
            nr = np.random.default_rng(100 + t)
            try:
                for i in range(300):
                    n = r.randint(1, 16 * 1024)
                    data = nr.integers(0, 255, size=n, dtype=np.uint8).tobytes()
                    off = store.append(data)
                    records[t].append((off, data))
                    if r.random() < 0.05:
                        time.sleep(0.001)
            except BaseException as e:  # pragma: no cover - failure path
                errors.append(e)

        threads = [threading.Thread(target=producer, args=(t,))
                   for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        store.freeze()
        # memory window never exceeded the documented 2x-budget bound by
        # more than one max-size append (backpressure contract)
        all_records = [rec for part in records for rec in part]
        assert store.size() == sum(len(d) for _, d in all_records)
        rng.shuffle(all_records)
        for off, data in all_records:
            assert store.read(off, len(data)) == data
        # spanning reads across append and flush boundaries
        all_records.sort()
        for i in range(0, len(all_records) - 3, 7):
            off = all_records[i][0]
            end = all_records[i + 3][0] + len(all_records[i + 3][1])
            joined = b"".join(d for _, d in all_records[i:i + 4])
            assert store.read(off, end - off) == joined
        store.cleanup()

    def test_flush_all_roundtrip_under_load(self, tmp_path):
        """flush_all (checkpoint path) after heavy appends: from_file sees
        identical bytes."""
        os.environ.setdefault("TMPDIR", str(tmp_path))
        store = SpillStore("stress2", mem_budget=32 * 1024)
        rng = np.random.default_rng(7)
        recs = []
        for _ in range(500):
            arr = rng.integers(0, 255, size=rng.integers(16, 4096),
                               dtype=np.uint8)
            recs.append((store.append(arr), arr.tobytes()))
        path = store.flush_all()
        reopened = SpillStore.from_file(path)
        for off, data in recs:
            assert reopened.read(off, len(data)) == data
        store.cleanup()


class _SlowWriter:
    """Thread-safe pwrite-style sink with random latency."""

    def __init__(self, fail_at=None):
        self.data = bytearray()
        self.lock = threading.Lock()
        self.fail_at = fail_at
        self.rng = random.Random(3)

    def write(self, offset, payload):
        if self.fail_at is not None and offset >= self.fail_at:
            raise IOError("injected disk failure")
        time.sleep(self.rng.random() * 0.002)
        with self.lock:
            if len(self.data) < offset + len(payload):
                self.data.extend(b"\0" * (offset + len(payload) - len(self.data)))
            self.data[offset:offset + len(payload)] = payload


class TestAsyncWriterStress:
    def test_many_jobs_small_pool(self):
        """2000 jobs through a 2-buffer pool (reference perNightly
        test_async.cpp:60): the pool bounds memory (get blocks), every byte
        lands at its offset."""
        w = AsyncWriter(n_buffers=2, buffer_size=8 * 1024)
        w.start()
        sink = _SlowWriter()
        expect = bytearray()
        off = 0
        rng = random.Random(11)
        for i in range(2000):
            n = rng.randint(1, 4096)
            payload = bytes([(i + k) % 256 for k in range(n)])
            buf = w.get(n)
            buf[:n] = payload
            w.push(sink, off, buf, n)
            expect.extend(payload)
            off += n
        w.stop()
        assert bytes(sink.data) == bytes(expect)

    def test_error_propagates_on_stop(self):
        w = AsyncWriter(n_buffers=2, buffer_size=1024)
        w.start()
        sink = _SlowWriter(fail_at=2048)
        off = 0
        for i in range(10):
            buf = w.get(512)
            buf[:512] = bytes(512)
            w.push(sink, off, buf, 512)
            off += 512
        with pytest.raises(IOError, match="injected"):
            w.stop()
