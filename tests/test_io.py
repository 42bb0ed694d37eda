"""I/O round-trips: GF files, used-input echo."""
import os
import tempfile

import numpy as np

from dmft_lanc_ed_tpu.config import EDConfig, read_input, save_used_input
from dmft_lanc_ed_tpu.solver import EDSolver
from dmft_lanc_ed_tpu import io as edio


def test_gf_file_roundtrip():
    cfg = EDConfig(norb=1, nbath=2, uloc=(1.2,), lmats=32, lreal=16)
    solver = EDSolver(cfg, np.zeros((1, 1, 1, 1)))
    res = solver.solve(solver.init_bath())
    d = tempfile.mkdtemp()
    edio.print_impsigma(cfg, res, outdir=d)
    back = edio.read_gf_files(cfg, "impSigma", outdir=d, axis="iw")
    np.testing.assert_allclose(back[0, 0, 0, 0], res.sigma_mats[0, 0, 0, 0],
                               atol=1e-8)


def test_input_file_roundtrip():
    d = tempfile.mkdtemp()
    path = os.path.join(d, "inputED.conf")
    with open(path, "w") as fh:
        fh.write("NORB=2\nNBATH=3\nULOC=1.5,2.5\nBETA=77\nED_TWIN=T\n"
                 "CG_SCHEME=delta\n")
    cfg = read_input(path)
    assert cfg.norb == 2 and cfg.nbath == 3 and cfg.ed_twin
    assert cfg.uloc[:2] == (1.5, 2.5) and cfg.beta == 77.0
    assert cfg.cg_scheme == "delta"
    save_used_input(cfg, path)
    assert os.path.exists(os.path.join(d, "used.inputED.conf"))
    # re-read the echoed file: must reproduce the same config
    cfg2 = read_input(os.path.join(d, "used.inputED.conf"))
    assert cfg2 == cfg
