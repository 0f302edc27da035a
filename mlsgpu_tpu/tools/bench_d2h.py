"""Tunnel d2h microbenchmark: per-transfer fixed latency vs bandwidth.

Measures `np.asarray(device_buffer)` wall time across sizes, plus the cost
of a tiny scalar sync, to decompose the platform's device->host path into
fixed per-roundtrip latency and per-byte bandwidth (the readback.wait
budget of the streaming pipeline; reference async 3-event enqueueReadMesh,
src/mesh.h:141-179). Also measures whether k back-to-back async copies of
the same total bytes beat one big copy (does batching transfers amortize a
fixed cost, or is the link purely bandwidth-bound?).

Prints one JSON line per measurement.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(json.dumps({"backend": dev.platform}))

    @jax.jit
    def make(x):
        return x * 2 + 1

    # Warm the device + first-transfer quirk with a small roundtrip.
    warm = jax.device_put(np.ones(1024, np.uint32), dev)
    np.asarray(make(warm))

    sizes_mb = [0.25, 0.5, 1, 2, 4, 8, 16, 32]
    reps = 5
    for mb in sizes_mb:
        n = int(mb * 1024 * 1024 // 4)
        base = jax.device_put(np.arange(n, dtype=np.uint32), dev)
        base.block_until_ready()
        ts = []
        for _ in range(reps):
            # a FRESH device array each rep: jax caches the host copy on the
            # array after the first np.asarray, which would time as 0s
            buf = make(base)
            buf.block_until_ready()
            t0 = time.monotonic()
            np.asarray(buf)
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(json.dumps({
            "transfer_mb": mb, "median_s": round(med, 4),
            "min_s": round(min(ts), 4),
            "mb_per_s": round(mb / med, 1)}), flush=True)

    # Scalar sync cost (the fetch_counts analogue): tiny array roundtrip.
    sbase = jax.device_put(np.arange(8, dtype=np.uint32), dev)
    ts = []
    for _ in range(20):
        small = make(sbase)
        small.block_until_ready()
        t0 = time.monotonic()
        np.asarray(small)
        ts.append(time.monotonic() - t0)
    print(json.dumps({"scalar_sync_median_s":
                      round(sorted(ts)[len(ts) // 2], 5)}), flush=True)

    # k async copies of total 8 MB vs one 8 MB copy: if per-transfer fixed
    # cost dominates, k transfers cost ~k * fixed more; if they pipeline,
    # batching transfers would not help the streamer.
    total = 8 * 1024 * 1024 // 4
    for k in [1, 2, 4, 8]:
        bases = [jax.device_put(np.arange(total // k, dtype=np.uint32), dev)
                 for _ in range(k)]
        ts = []
        for _ in range(reps):
            parts = [make(b) for b in bases]  # fresh arrays (no host cache)
            for p in parts:
                p.block_until_ready()
            t0 = time.monotonic()
            for p in parts:
                p.copy_to_host_async()
            outs = [np.asarray(p) for p in parts]
            ts.append(time.monotonic() - t0)
            del outs, parts
        med = sorted(ts)[len(ts) // 2]
        print(json.dumps({"k_transfers": k, "total_mb": 8,
                          "median_s": round(med, 4)}), flush=True)


if __name__ == "__main__":
    main()
