"""Distributed failure-detection tests: PeerWatchdog (the analogue of the
reference's MPI error handler that aborts the whole job on any rank error,
mlsgpu-mpi.cpp:541-628) and the fetch-and-add work-queue counters behind
the dynamic pull-model scatter (mlsgpu-mpi.cpp:202-246)."""

import threading
import time

import pytest

from mlsgpu_tpu.parallel.multihost import LocalTransport, PeerWatchdog


class FakeKV:
    """Per-rank heartbeat counters with injectable failure."""

    def __init__(self, size):
        self.counts = [0] * size
        self.dead = set()        # ranks whose counter stops advancing
        self.unreadable = set()  # ranks whose reads raise (coordinator gone)
        self.lock = threading.Lock()

    def beat(self, rank):
        with self.lock:
            if rank not in self.dead:
                self.counts[rank] += 1

    def read(self, rank):
        with self.lock:
            if rank in self.unreadable:
                raise RuntimeError("coordinator unavailable")
            return self.counts[rank]


def make_watchdog(kv, rank, size, timeout, aborts, interval=0.05):
    def abort(peer, stale):
        aborts.append((peer, stale))

    return PeerWatchdog(rank, size,
                        beat=lambda: kv.beat(rank),
                        read_peer=kv.read,
                        interval=interval, timeout=timeout, abort=abort)


def test_watch_returns_result_with_live_peers():
    kv = FakeKV(2)
    aborts = []
    wd0 = make_watchdog(kv, 0, 2, timeout=5.0, aborts=aborts)
    wd1 = make_watchdog(kv, 1, 2, timeout=5.0, aborts=aborts)
    try:
        done = threading.Event()

        def collective():
            done.wait(1.0)
            return "ok"

        t = threading.Thread(target=lambda: (time.sleep(0.3), done.set()))
        t.start()
        assert wd0.watch(collective) == "ok"
        t.join()
        assert aborts == []
    finally:
        wd0.stop()
        wd1.stop()


def test_watch_reraises_collective_exception():
    kv = FakeKV(2)
    wd = make_watchdog(kv, 0, 2, timeout=5.0, aborts=[])
    make_watchdog(kv, 1, 2, timeout=5.0, aborts=[])

    def boom():
        raise ValueError("collective failed")

    with pytest.raises(ValueError, match="collective failed"):
        wd.watch(boom)


def test_dead_peer_aborts_within_bounded_time():
    kv = FakeKV(2)
    aborts = []
    wd0 = make_watchdog(kv, 0, 2, timeout=0.3, aborts=aborts)
    wd1 = make_watchdog(kv, 1, 2, timeout=0.3, aborts=aborts)
    try:
        kv.dead.add(1)  # rank 1 stops beating
        hang = threading.Event()
        t0 = time.monotonic()

        def blocked():
            # simulate a collective that never completes because peer died;
            # released once the abort fires so the test can join
            hang.wait(10.0)

        def abort_and_release(peer, stale):
            aborts.append((peer, stale))
            hang.set()

        wd0._abort = abort_and_release
        wd0.watch(blocked)
        elapsed = time.monotonic() - t0
        assert aborts and aborts[0][0] == 1
        assert elapsed < 5.0, "abort did not fire within bounded time"
    finally:
        wd0.stop()
        wd1.stop()


def test_unreadable_peer_counts_as_dead():
    """Coordinator death makes reads raise; that must run the staleness
    clock, not mask it."""
    kv = FakeKV(2)
    aborts = []
    wd0 = make_watchdog(kv, 0, 2, timeout=0.3, aborts=aborts)
    try:
        kv.unreadable.add(1)
        hang = threading.Event()

        def abort_and_release(peer, stale):
            aborts.append((peer, stale))
            hang.set()

        wd0._abort = abort_and_release
        wd0.watch(lambda: hang.wait(10.0))
        assert aborts and aborts[0][0] == 1
    finally:
        wd0.stop()


def test_busy_peer_does_not_false_positive():
    """A peer that is slow to reach the collective but still beating must
    never be declared dead (heartbeats run from a daemon thread regardless
    of what the rank is doing)."""
    kv = FakeKV(2)
    aborts = []
    wd0 = make_watchdog(kv, 0, 2, timeout=0.4, aborts=aborts, interval=0.05)
    wd1 = make_watchdog(kv, 1, 2, timeout=0.4, aborts=aborts, interval=0.05)
    try:
        # rank 1 "computes" for 3x the timeout before arriving; its
        # heartbeat thread keeps beating the whole time
        done = threading.Event()
        threading.Thread(target=lambda: (time.sleep(1.2), done.set())).start()
        assert wd0.watch(lambda: (done.wait(10.0), "late")[1]) == "late"
        assert aborts == []
    finally:
        wd0.stop()
        wd1.stop()


def test_local_claim_counter_unique_and_dense():
    transports = LocalTransport.make(3)
    claimed = [[] for _ in range(3)]

    def claim_all(r):
        c = transports[r].claim_counter("chunks")
        while True:
            i = c.claim()
            if i >= 50:
                return
            claimed[r].append(i)
            time.sleep(0.001 * (r + 1))  # skewed claim rates

    threads = [threading.Thread(target=claim_all, args=(r,)) for r in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    got = sorted(i for part in claimed for i in part)
    assert got == list(range(50)), "claims must partition 0..N-1 exactly"
    # skewed rates => faster rank claims more (dynamic balancing)
    assert len(claimed[0]) > len(claimed[2])
