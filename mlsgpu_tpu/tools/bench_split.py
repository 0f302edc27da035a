"""Compute-vs-transfer split for the streaming pipeline.

Runs the bench cloud's buckets through the streamer twice on the same
compiled program: pass A forces results but skips the mesh readback (counts
sync only — wall time ~= dispatch + device compute), pass B is the full
path (readback + native decode, no mesher/write). The difference isolates
what the d2h mesh transfer actually costs end-to-end, answering whether the
tunnel floor or device compute rules the bench (VERDICT r3 'prove where
readback.wait goes'; reference separates these via CL event profiling,
src/statistics_cl.h:43-93).

Usage: python -m mlsgpu_tpu.tools.bench_split [n_splats]
"""

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from mlsgpu_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    from bench import make_cloud  # repo-root bench module
    from mlsgpu_tpu.config import ReconstructConfig
    from mlsgpu_tpu.io.splat_set import SequenceSource
    from mlsgpu_tpu.pipeline import blobs as blobs_mod
    from mlsgpu_tpu.pipeline import bucket as bucket_mod
    from mlsgpu_tpu.pipeline.reconstruct import (
        BlockCaps, block_result_to_input, default_march_tile_cap,
        default_occ_tile_cap, load_cached_caps)
    from mlsgpu_tpu.pipeline.streamer import stream_blocks
    from mlsgpu_tpu.utils.statistics import get_registry

    splats, sr = make_cloud(n)
    spacing = sr / 3.0
    cfg = ReconstructConfig(
        fit_grid=float(spacing), fit_smooth=1.0, fit_prune=0.02,
        levels=6, subsampling=3, max_device_splats=4 << 20,
        tile_candidates=384, progress=False)
    src = SequenceSource(splats)
    info = blobs_mod.compute_blobs(src, cfg.fit_grid, cfg.micro_cells)
    buckets = bucket_mod.make_buckets(info, cfg.device_block_cells, cfg.micro_cells,
                                      max_splats=cfg.max_device_splats)
    caps = load_cached_caps(cfg)

    def run(consume: bool, label: str):
        get_registry().clear()
        t0 = time.monotonic()
        nv = 0
        for b, res in stream_blocks(src, info, buckets, cfg, caps):
            if consume:
                block = block_result_to_input(res, b)
                nv += len(block.vertices)
            else:
                nv += res.num_vertices  # counts were already synced at force
        dt = time.monotonic() - t0
        reg = get_registry()
        out = {"pass": label, "elapsed_s": round(dt, 2),
               "blocks": len(buckets), "welded_or_unwelded_verts": int(nv)}
        for s in ("device.time", "readback.wait", "readback.decode",
                  "streamer.dispatch", "dispatch.h2d"):
            try:
                out[s] = round(reg.variable(s).get_total(), 2)
            except Exception:
                pass
        try:
            out["readback.bytes"] = reg.counter("readback.bytes").get()
        except Exception:
            pass
        print(json.dumps(out), flush=True)
        return dt

    run(False, "warm (compile)")
    a = run(False, "A: counts-only (compute+dispatch)")
    b = run(True, "B: full readback+decode")
    print(json.dumps({"transfer+decode_s": round(b - a, 2),
                      "per_block_ms": round((b - a) / len(buckets) * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
