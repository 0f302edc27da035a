import time, os, tempfile, numpy as np
from bench import make_cloud, N_SPLATS
from mlsgpu_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from mlsgpu_tpu.config import ReconstructConfig
from mlsgpu_tpu.io.splat_set import SequenceSource
from mlsgpu_tpu.pipeline.reconstruct import reconstruct, BlockCaps, default_occ_tile_cap

splats, sr = make_cloud(2_000_000)
spacing = sr / 3.0
cfg = ReconstructConfig(
    fit_grid=float(spacing), fit_smooth=1.0, fit_prune=0.02,
    levels=7, subsampling=3,
    max_device_splats=4 << 20, tile_candidates=1 << 10, progress=False)
out = os.path.join(tempfile.mkdtemp(), "bench7.ply")
src = SequenceSource(splats)
caps = BlockCaps(cfg.tile_candidates, cfg.cell_cap, cfg.vertex_cap,
                 cfg.index_cap, occ_tile_cap=default_occ_tile_cap(cfg))
t0 = time.monotonic()
reconstruct(src, cfg, out, show_progress=False, caps=caps)
print(f"warm run: {time.monotonic()-t0:.1f}s", flush=True)
t0 = time.monotonic()
files = reconstruct(src, cfg, out, show_progress=False, caps=caps)
el = time.monotonic() - t0
print(f"levels=7 measured: {el:.2f}s -> {2.0/el:.3f} Msplats/s")
