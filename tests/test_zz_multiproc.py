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
