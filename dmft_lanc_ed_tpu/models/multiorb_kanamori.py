"""Multi-orbital Kanamori materials-class workload (VO2/PCO analogue).

Driver for the reference's materials-like models (edn_VO2model.f90,
edn_PCO.f90, edn_DFT.f90): Norb in {2,3} orbitals with full Kanamori
interaction (Uloc, Ust, Jh, Jx, Jp), user-supplied crystal-field split local
Hamiltonian and per-orbital semicircular or user DOS, solved with DOS-based
local GF. Wannier/DFT input reduces to (Hloc, per-orbital bands), which this
driver accepts directly.
"""
from __future__ import annotations

import ast

import logging
import sys
from typing import Optional

import numpy as np

from ..config import EDConfig, read_input
from ..dmft import (ConvergenceCheck, LinearMixer, bethe_bands, gloc_dos,
                    kinetic_energy_dos, self_consistency)
from ..fit import chi2_fitgf
from ..models.hm_bethe import DMFTResult
from ..solver import EDSolver, matsubara_grid

log = logging.getLogger("dmft_lanc_ed_tpu")


def run_dmft(cfg: EDConfig, wband=1.0, crystal_field=None,
             ebands: Optional[np.ndarray] = None,
             dbands: Optional[np.ndarray] = None,
             wmixing: float = 0.5, bath0: Optional[np.ndarray] = None,
             n_energies: int = 400, verbose: bool = True) -> DMFTResult:
    norb = cfg.norb
    cf = np.zeros(norb) if crystal_field is None else np.asarray(crystal_field)
    if ebands is None:
        ebands, dbands, _ = bethe_bands(norb, wband, cf, n_energies)
    h0 = cf
    hloc = np.zeros((cfg.nspin, cfg.nspin, norb, norb))
    for s in range(cfg.nspin):
        hloc[s, s] = np.diag(cf)

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
        gloc = gloc_dos(ebands, dbands, h0, res.sigma_mats, z, xmu=cfg.xmu)
        weiss = self_consistency(gloc, res.sigma_mats, hloc, z,
                                 sctype=cfg.cg_scheme, xmu=cfg.xmu)
        bath = mixer(chi2_fitgf(cfg, weiss, bath, hloc))
        gtest = np.mean([weiss[0, 0, a, a] for a in range(norb)], axis=0)
        converged = conv(gtest)
        history.append(dict(iloop=iloop, error=conv.error,
                            dens=res.observables.dens.copy(),
                            docc=res.observables.docc.copy()))
        if verbose:
            log.info("multiorb loop %02d: err=%.3e dens=%s docc=%s",
                     iloop, conv.error, np.round(res.observables.dens, 5),
                     np.round(res.observables.docc, 5))
        if converged and conv.error < cfg.dmft_error:
            break

    ekin = kinetic_energy_dos(ebands, dbands, h0, res.sigma_mats, wm,
                              cfg.beta, xmu=cfg.xmu)
    return DMFTResult(
        converged=converged, iterations=len(history), error=conv.error,
        dens=res.observables.dens, docc=res.observables.docc, xmu=cfg.xmu,
        sigma_mats=res.sigma_mats, sigma_real=res.sigma_real,
        g_mats=res.g_mats, weiss=weiss, bath=bath, ekin=ekin,
        observables=res.observables, history=history)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        datefmt="%H:%M:%S")
    argv = argv if argv is not None else sys.argv[1:]
    path = None
    overrides = dict(norb=3, uloc=(2.5, 2.5, 2.5), ust=1.5, jh=0.5)
    extra = {}
    for arg in argv:
        if "=" in arg:
            k, v = arg.split("=", 1)
            k = k.lower()
            if k in ("wband", "wmixing"):
                extra[k] = float(v)
            elif k == "crystal_field":
                extra[k] = ast.literal_eval(v)
            else:
                try:
                    overrides[k] = ast.literal_eval(v)
                except Exception:
                    overrides[k] = v
        else:
            path = arg
    cfg = read_input(path, **overrides)
    result = run_dmft(cfg, **extra)
    print(f"converged={result.converged} iterations={result.iterations}")
    print(f"dens={result.dens} docc={result.docc} ekin={result.ekin:.6f}")
    return result


if __name__ == "__main__":
    main()
