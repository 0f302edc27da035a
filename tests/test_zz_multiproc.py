"""True multi-process distributed run: two OS processes over the
jax.distributed coordination service on CPU, through the CLI's
--coordinator/--num-processes/--process-id surface (the analogue of the
reference's `mpirun -n 4 testmpi`, wscript:543-551 — real transport, local
ranks). Named zz_ so it runs last (it forks fresh processes)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from mlsgpu_tpu.io import ply

from tests import oracle


# perCommit-tier suite (reference TestSet::perCommit, test/testutil.cpp:43-47):
# compile-heavy; deselect with `-m "not slow"` for the fast perBuild tier.
pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_ranks(n, args, env_extra=None, tmp_cwd=None):
    """Spawn n CLI ranks over a fresh coordinator; return the Popen list."""
    port = _free_port()
    env = dict(os.environ)
    env["MLSGPU_TPU_FORCE_CPU"] = "1"
    env.pop("XLA_FLAGS", None)  # single CPU device per process
    env.update(env_extra or {})
    procs = []
    for rank in range(n):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mlsgpu_tpu",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(n), "--process-id", str(rank)] + args,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    return procs


def _communicate(procs, timeout=1200):
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=timeout)
        outs.append((p.returncode, so.decode(), se.decode()))
    return outs


def _mesh_summary(files):
    total_v = total_t = 0
    for f in files:
        verts, tris = ply.read_mesh(f)
        total_v += len(verts)
        total_t += len(tris)
    return total_v, total_t


@pytest.mark.slow
def test_four_process_checkpoint_then_two_process_resume(tmp_path):
    """4 real ranks (the reference's `mpirun -n 4` tier, wscript:543-551)
    checkpoint; 2 real ranks resume and write — the rank count CHANGES
    across the boundary (reference runResume allows a different cluster,
    mlsgpu-mpi.cpp:349-372). Output must match a direct single-process
    run."""
    rng = np.random.default_rng(13)
    splats = oracle.sphere_cloud([0.0, 0.0, 0.0], 3.0, 12000, 0.3, rng)
    inp = str(tmp_path / "cloud.ply")
    ply.write_splats_ply(inp, splats)

    base = ["--fit-grid", "0.12", "--fit-smooth", "1.0",
            "--levels", "3", "--leaf-cells", "8",
            "--split-size", "64K", "--no-progress", "--quiet", inp]
    ckpt = str(tmp_path / "state.ckpt")
    out = str(tmp_path / "mesh.ply")

    outs = _communicate(_launch_ranks(
        4, ["--checkpoint", ckpt, "-o", out] + base))
    for rc, so, se in outs:
        assert rc == 0, f"checkpoint rank failed: {se[-2000:]}"
    shards = sorted(tmp_path.glob("state.ckpt.rank*"))
    assert len(shards) == 4

    outs = _communicate(_launch_ranks(2, ["--resume", ckpt, "-o", out] + base))
    for rc, so, se in outs:
        assert rc == 0, f"resume rank failed: {se[-2000:]}"

    chunk_files = sorted(str(f) for f in tmp_path.glob("mesh_*.ply"))
    assert chunk_files, "no chunk outputs written"

    # oracle: direct single-process run over the same input
    from mlsgpu_tpu.config import ReconstructConfig
    from mlsgpu_tpu.io.splat_set import SequenceSource
    from mlsgpu_tpu.pipeline.reconstruct import reconstruct
    cfg = ReconstructConfig(fit_grid=0.12, fit_smooth=1.0, levels=3,
                            subsampling=3, leaf_cells=8,
                            output_split_size=64 * 1024, progress=False)
    direct = reconstruct(SequenceSource(splats), cfg,
                         str(tmp_path / "direct.ply"))
    assert _mesh_summary(chunk_files) == _mesh_summary(direct)


@pytest.mark.slow
def test_rank_failure_aborts_job_bounded(tmp_path):
    """A rank that dies mid-run must terminate the whole job within a
    bounded time — peers abort out of the blocked collective via the
    heartbeat watchdog (the reference installs an MPI error handler that
    aborts the job, mlsgpu-mpi.cpp:541-628) instead of hanging forever."""
    import time as _time

    rng = np.random.default_rng(14)
    splats = oracle.sphere_cloud([0.0, 0.0, 0.0], 3.0, 8000, 0.3, rng)
    inp = str(tmp_path / "cloud.ply")
    ply.write_splats_ply(inp, splats)
    out = str(tmp_path / "mesh.ply")

    procs = _launch_ranks(
        3, ["--fit-grid", "0.15", "--fit-smooth", "1.0",
            "--levels", "3", "--leaf-cells", "8",
            "--no-progress", "--quiet", "-o", out, inp],
        env_extra={"MLSGPU_TEST_DIE_RANK": "1",
                   "MLSGPU_HB_TIMEOUT": "15"})
    t0 = _time.monotonic()
    outs = _communicate(procs, timeout=900)
    elapsed = _time.monotonic() - t0
    rcs = [rc for rc, _, _ in outs]
    assert rcs[1] == 7, f"injected rank should exit 7, got {rcs[1]}"
    # peers must FAIL (not hang, not succeed): either the watchdog's abort
    # code or a collective error surfaced by the runtime
    for r in (0, 2):
        assert rcs[r] != 0, (
            f"rank {r} exited 0 despite a dead peer: {outs[r][2][-2000:]}")
    # bounded: well under the communicate timeout (the watchdog fires at
    # ~15s staleness; allow generous slack for single-core compiles)
    assert elapsed < 600


@pytest.mark.slow
def test_two_process_cli_reconstruct(tmp_path):
    rng = np.random.default_rng(11)
    splats = oracle.sphere_cloud([0.0, 0.0, 0.0], 3.0, 12000, 0.3, rng)
    inp = str(tmp_path / "cloud.ply")
    ply.write_splats_ply(inp, splats)
    out = str(tmp_path / "mesh.ply")

    port = _free_port()
    env = dict(os.environ)
    env["MLSGPU_TPU_FORCE_CPU"] = "1"
    env.pop("XLA_FLAGS", None)  # single CPU device per process
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mlsgpu_tpu",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--fit-grid", "0.12", "--fit-smooth", "1.0",
             "--levels", "3", "--leaf-cells", "8",
             "--split-size", "64K", "--no-progress", "--quiet",
             "-o", out, inp],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=900)
        outs.append((p.returncode, so.decode(), se.decode()))
    for rc, so, se in outs:
        assert rc == 0, f"rank failed: {se[-2000:]}"

    chunk_files = sorted(str(f) for f in tmp_path.glob("mesh_*.ply"))
    assert chunk_files, "no chunk outputs written"
    total_v = total_t = 0
    for f in chunk_files:
        verts, tris = ply.read_mesh(f)
        total_v += len(verts)
        total_t += len(tris)
        if len(verts):
            r = np.linalg.norm(verts, axis=1)
            assert abs(np.median(r) - 3.0) < 0.15
    assert total_t > 1000
