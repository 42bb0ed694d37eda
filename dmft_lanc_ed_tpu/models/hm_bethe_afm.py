"""AFM-ordered Hubbard on the bipartite Bethe lattice (nspin=2).

Driver for the reference's antiferromagnetic Bethe workloads
(drivers square_afm2 / AFO variants): two sublattices A/B related by spin
flip; the self-consistency couples sublattices,
    Delta_A,s(z) = (D/2)^2 G_B,s(z) = (D/2)^2 G_A,-s(z),
seeded by a symmetry-breaking field (sb_field / break_symmetry_bath).
"""
from __future__ import annotations

import ast

import logging
import sys
from typing import Optional

import numpy as np

from ..bath import break_symmetry_bath
from ..config import EDConfig, read_input
from ..dmft import ConvergenceCheck, LinearMixer
from ..fit import chi2_fitgf
from ..models.hm_bethe import DMFTResult
from ..solver import EDSolver, matsubara_grid

log = logging.getLogger("dmft_lanc_ed_tpu")


def run_dmft(cfg: EDConfig, wband: float = 1.0, wmixing: float = 0.5,
             bath0: Optional[np.ndarray] = None,
             verbose: bool = True) -> DMFTResult:
    assert cfg.nspin == 2 and cfg.norb == 1, "AFM driver: nspin=2, norb=1"
    hloc = np.zeros((2, 2, 1, 1))
    solver = EDSolver(cfg, hloc)
    bath = solver.init_bath() if bath0 is None else np.asarray(bath0).copy()
    bath = break_symmetry_bath(cfg, bath, cfg.sb_field)
    wm = matsubara_grid(cfg)
    z = 1j * wm
    mixer = LinearMixer(wmixing)
    conv = ConvergenceCheck(cfg.dmft_error, cfg.nsuccess, cfg.nloop)
    history = []
    res = weiss = None
    converged = False
    d2 = (wband / 2.0) ** 2

    for iloop in range(1, cfg.nloop + 1):
        res = solver.solve(bath)
        g = res.g_mats                     # [2,2,1,1,L]
        # AFM Bethe self-consistency: Delta_s = (D/2)^2 G_{-s}
        weiss = np.zeros_like(g)
        for s in range(2):
            delta = d2 * g[1 - s, 1 - s, 0, 0]
            if cfg.cg_scheme == "delta":
                weiss[s, s, 0, 0] = delta
            else:
                weiss[s, s, 0, 0] = 1.0 / (z + cfg.xmu - delta)
        bath = mixer(chi2_fitgf(cfg, weiss, bath, hloc))
        gtest = weiss[0, 0, 0, 0]
        converged = conv(gtest)
        mag = float(res.observables.mag[0])
        history.append(dict(iloop=iloop, error=conv.error, mag=mag,
                            dens=res.observables.dens.copy()))
        if verbose:
            log.info("AFM loop %02d: err=%.3e mag=%.6f dens=%.6f",
                     iloop, conv.error, mag, res.observables.dens[0])
        if converged and conv.error < cfg.dmft_error:
            break

    return DMFTResult(
        converged=converged, iterations=len(history), error=conv.error,
        dens=res.observables.dens, docc=res.observables.docc, xmu=cfg.xmu,
        sigma_mats=res.sigma_mats, sigma_real=res.sigma_real,
        g_mats=res.g_mats, weiss=weiss, bath=bath,
        observables=res.observables, history=history)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        datefmt="%H:%M:%S")
    argv = argv if argv is not None else sys.argv[1:]
    path = None
    overrides = dict(nspin=2)
    extra = {}
    for arg in argv:
        if "=" in arg:
            k, v = arg.split("=", 1)
            k = k.lower()
            if k in ("wband", "wmixing"):
                extra[k] = float(v)
            else:
                try:
                    overrides[k] = ast.literal_eval(v)
                except Exception:
                    overrides[k] = v
        else:
            path = arg
    cfg = read_input(path, **overrides)
    result = run_dmft(cfg, **extra)
    print(f"converged={result.converged} mag={result.observables.mag[0]:.6f} "
          f"dens={result.dens}")
    return result


if __name__ == "__main__":
    main()
