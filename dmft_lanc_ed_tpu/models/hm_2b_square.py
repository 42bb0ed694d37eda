"""Two-band Hubbard (+Hund) on the square lattice.

Driver for the edn_hm_2b_square.f90 workload: two orbitals with Kanamori
interaction (Uloc, Ust, Jh, optional Jx/Jp) on an orbital-diagonal square
dispersion, DMFT with Hk-based local GF and chi2 bath fitting.
"""
from __future__ import annotations

import ast

import logging
import sys
from typing import Optional

import numpy as np

from ..config import EDConfig, read_input
from ..dmft import ConvergenceCheck, LinearMixer, self_consistency
from ..dmft.gloc import gloc_hk
from ..dmft.hk import hk_square, hloc_from_hk
from ..fit import chi2_fitgf
from ..models.hm_bethe import DMFTResult
from ..solver import EDSolver, matsubara_grid

log = logging.getLogger("dmft_lanc_ed_tpu")


def run_dmft(cfg: EDConfig, t=(0.25, 0.25), nk: int = 24,
             wmixing: float = 0.5, bath0: Optional[np.ndarray] = None,
             verbose: bool = True) -> DMFTResult:
    assert cfg.norb == 2, "two-band driver"
    hk_orb = hk_square(nk, cfg.norb, t=t)           # [Nk, 2, 2]
    nso = cfg.nspin * cfg.norb
    if cfg.nspin == 1:
        hk = hk_orb
    else:   # embed spin-diagonally
        nk_tot = hk_orb.shape[0]
        hk = np.zeros((nk_tot, nso, nso), dtype=np.complex128)
        hk[:, :2, :2] = hk_orb
        hk[:, 2:, 2:] = hk_orb
    hloc = hloc_from_hk(hk, cfg.nspin, cfg.norb)

    solver = EDSolver(cfg, hloc)
    bath = solver.init_bath() if bath0 is None else np.asarray(bath0).copy()
    wm = matsubara_grid(cfg)
    z = 1j * wm
    mixer = LinearMixer(wmixing)
    conv = ConvergenceCheck(cfg.dmft_error, cfg.nsuccess, cfg.nloop)
    history = []
    res = weiss = None
    converged = False

    for iloop in range(1, cfg.nloop + 1):
        res = solver.solve(bath)
        gloc = gloc_hk(hk, res.sigma_mats, z, xmu=cfg.xmu)
        weiss = self_consistency(gloc, res.sigma_mats, hloc, z,
                                 sctype=cfg.cg_scheme, xmu=cfg.xmu)
        bath = mixer(chi2_fitgf(cfg, weiss, bath, hloc))
        gtest = np.mean([weiss[0, 0, a, a] for a in range(cfg.norb)], axis=0)
        converged = conv(gtest)
        history.append(dict(iloop=iloop, error=conv.error,
                            dens=res.observables.dens.copy(),
                            docc=res.observables.docc.copy()))
        if verbose:
            log.info("2b-square loop %02d: err=%.3e dens=%s docc=%s",
                     iloop, conv.error, np.round(res.observables.dens, 5),
                     np.round(res.observables.docc, 5))
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
    overrides = dict(norb=2)
    extra = {}
    for arg in argv:
        if "=" in arg:
            k, v = arg.split("=", 1)
            k = k.lower()
            if k in ("nk",):
                extra[k] = int(v)
            elif k in ("wmixing",):
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
    print(f"converged={result.converged} iterations={result.iterations} "
          f"error={result.error:.3e}")
    print(f"dens={result.dens} docc={result.docc}")
    return result


if __name__ == "__main__":
    main()
