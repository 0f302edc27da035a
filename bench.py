"""Benchmark: end-to-end points->mesh throughput on one TPU chip.

Measures BASELINE.md config-2 (single-pass in-HBM reconstruction of a
synthetic sphere scan) with the full pipeline: blob pass, bucketing,
device block steps, host welding/mesher, PLY write to tmpfs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 10.0 Msplats/s — BASELINE.json's north star is
>=10x the reference's throughput on a contemporary GPU; the reference
publishes no numbers (BASELINE.md), and ~10 Msplats/s is our estimate for
mlsgpu on a modern GPU (the 2013 paper's Radeon HD 5970-era results scaled
by memory bandwidth), so vs_baseline > 1.0 means the north star is met.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

N_SPLATS = int(os.environ.get("BENCH_SPLATS", 2_000_000))
BASELINE_MSPLATS = 10.0


def make_cloud(n, seed=123):
    """Synthetic scan: sphere cloud with outward normals, sized so the
    volume spans multiple 256^3 blocks at the chosen grid spacing."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    radius = 3.0
    splats = np.zeros((n, 8), dtype=np.float32)
    splats[:, 0:3] = radius * v
    # splat radius ~3x mean neighbor spacing for solid coverage
    spacing = np.sqrt(4 * np.pi * radius ** 2 / n)
    sr = 3.0 * spacing
    splats[:, 3] = sr
    splats[:, 4:7] = v
    splats[:, 7] = 1.0 / sr ** 2
    return splats, sr


def main():
    from mlsgpu_tpu.cli import _enable_compile_cache
    try:
        _enable_compile_cache()  # first backend touch
    except RuntimeError as e:
        # Transient tunnel/driver outage ("Unable to initialize backend").
        # The failed backend is cached process-wide, so retry by re-exec
        # (bounded; the freshest attempt state rides an env counter).
        attempt = int(os.environ.get("BENCH_INIT_ATTEMPT", "0"))
        print(f"# backend init failed (attempt {attempt}): {e}",
              file=sys.stderr, flush=True)
        if attempt >= 2:
            raise
        os.environ["BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        time.sleep(60)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    from mlsgpu_tpu.config import ReconstructConfig
    from mlsgpu_tpu.io.splat_set import SequenceSource
    from mlsgpu_tpu.pipeline.reconstruct import reconstruct
    from mlsgpu_tpu.utils.statistics import get_registry

    splats, sr = make_cloud(N_SPLATS)
    # grid spacing ~= splat spacing/1.5 => splat radius ~4.5 cells
    spacing = sr / 3.0
    cfg = ReconstructConfig(
        fit_grid=float(spacing), fit_smooth=1.0, fit_prune=0.02,
        levels=6, subsampling=3,
        max_device_splats=4 << 20,
        tile_candidates=384,
        progress=False,
    )

    out = os.path.join(tempfile.mkdtemp(), "bench.ply")
    src = SequenceSource(splats)

    # Warm-up: run the SAME workload once so the measured run reuses the
    # identical compiled program (uniform run-wide pad shape) and the grown
    # caps — the measured pass is pure steady-state throughput.
    from mlsgpu_tpu.pipeline.reconstruct import (
        BlockCaps, default_occ_tile_cap)
    caps = BlockCaps(cfg.tile_candidates, cfg.cell_cap, cfg.vertex_cap,
                     cfg.index_cap, occ_tile_cap=default_occ_tile_cap(cfg))
    t0 = time.monotonic()
    reconstruct(src, cfg, out, show_progress=False, caps=caps)
    warm_elapsed = time.monotonic() - t0
    # Preliminary note (stderr: stdout must carry exactly ONE JSON line for
    # the harness) in case it times out before the clean measured run.
    warm_msplats = N_SPLATS / warm_elapsed / 1e6
    print(f"# warm run (incl. compile): {warm_elapsed:.2f}s = "
          f"{warm_msplats:.3f} Msplats/s", file=sys.stderr, flush=True)

    # Reset stats so the dump below covers only the measured run.
    get_registry().clear()
    t0 = time.monotonic()
    files = reconstruct(src, cfg, out, show_progress=False, caps=caps)
    elapsed = time.monotonic() - t0

    msplats = N_SPLATS / elapsed / 1e6
    result = {
        "metric": "end-to-end points->manifold-mesh throughput (single chip)",
        "value": round(msplats, 3),
        "unit": "Msplats/s",
        "vs_baseline": round(msplats / BASELINE_MSPLATS, 3),
    }
    print(json.dumps(result))
    # secondary metric from BASELINE.md's protocol: grid-cell throughput
    from mlsgpu_tpu.pipeline.blobs import compute_blobs
    info = compute_blobs(SequenceSource(splats), float(spacing),
                         cfg.micro_cells)
    ncells = int(np.prod(info.grid.shape_cells))
    print(f"# elapsed {elapsed:.2f}s for {N_SPLATS} splats -> {files}; "
          f"{ncells / elapsed / 1e6:.1f} Mcells/s over {info.grid.shape_cells}",
          file=sys.stderr)
    get_registry().dump(sys.stderr)


if __name__ == "__main__":
    main()
