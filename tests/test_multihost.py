"""Multi-host (multi-process) inter-site path: 2-process CPU dryrun vs a
serial solve of the same 3-site problem (ed_solve_lattice_mpi protocol,
ED_MAIN.f90:603-672 + the fit merge ED_FIT_CHI2.f90:215-240)."""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_lattice_matches_serial():
    port = _free_port()
    tmp = tempfile.mkdtemp()
    outs = [os.path.join(tmp, f"p{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "dmft_lanc_ed_tpu.parallel.multihost_dryrun",
         "--coord", f"localhost:{port}", "--nproc", "2", "--pid", str(i),
         "--out", outs[i]],
        env=env, cwd="/root/repo") for i in range(2)]
    for p in procs:
        assert p.wait(timeout=600) == 0
    d0 = np.load(outs[0])
    d1 = np.load(outs[1])

    # merged arrays identical on both processes
    np.testing.assert_allclose(d1["dens"], d0["dens"], atol=1e-13)
    np.testing.assert_allclose(d1["egs"], d0["egs"], atol=1e-13)
    np.testing.assert_allclose(d1["fitted"], d0["fitted"], atol=1e-13)

    # and equal to a serial (single-process) solve of the same problem
    from dmft_lanc_ed_tpu.parallel.multihost_dryrun import solve_merged
    arrays, fitted = solve_merged()
    np.testing.assert_allclose(d0["dens"], arrays.dens, atol=1e-10)
    np.testing.assert_allclose(d0["egs"], arrays.egs, atol=1e-10)
    np.testing.assert_allclose(d0["g_mats"], arrays.g_mats, atol=1e-9)
    np.testing.assert_allclose(d0["sigma_mats"], arrays.sigma_mats,
                               atol=1e-7)
    np.testing.assert_allclose(d0["fitted"], fitted, atol=1e-8)
