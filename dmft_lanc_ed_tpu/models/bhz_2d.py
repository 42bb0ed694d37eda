"""BHZ 2D topological insulator with interaction — replica-bath DMFT.

Driver for the edn_bhz_2d.f90 / edn_bhz_2d_replica.f90 workloads: the
Bernevig-Hughes-Zhang 4-band model (2 orbitals x 2 spins) with local
Kanamori interaction, solved with nspin=2, norb=2 and a replica bath whose
symmetry basis is extracted from the local Hamiltonian
(ED_HLOC_DECOMPOSITION set_Hloc path).
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
from ..dmft.hk import hk_bhz_2d, hloc_from_hk
from ..fit import chi2_fitgf
from ..hloc import decompose_hloc
from ..models.hm_bethe import DMFTResult
from ..solver import EDSolver, matsubara_grid

log = logging.getLogger("dmft_lanc_ed_tpu")


def run_dmft(cfg: EDConfig, m0: float = 1.0, lam: float = 0.3,
             t: float = 0.5, nk: int = 20, wmixing: float = 0.5,
             bath0: Optional[np.ndarray] = None,
             verbose: bool = True) -> DMFTResult:
    assert cfg.norb == 2 and cfg.nspin == 2, "BHZ needs norb=2, nspin=2"
    hk = hk_bhz_2d(nk, m0=m0, lam=lam, t=t)        # [Nk, 4, 4]
    hloc = hloc_from_hk(hk, cfg.nspin, cfg.norb)

    h_basis = lambda_imp = None
    if cfg.bath_type == "replica":
        h_basis, lambda_imp = decompose_hloc(cfg, hloc)
    solver = EDSolver(cfg, hloc, h_basis=h_basis, lambda_imp=lambda_imp)
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
        bath = mixer(chi2_fitgf(cfg, weiss, bath, hloc, h_basis=h_basis))
        gtest = np.stack([weiss[s, s, a, a]
                          for s in range(2) for a in range(2)]).mean(0)
        converged = conv(gtest)
        history.append(dict(iloop=iloop, error=conv.error,
                            dens=res.observables.dens.copy()))
        if verbose:
            log.info("BHZ loop %02d: err=%.3e dens=%s",
                     iloop, conv.error, np.round(res.observables.dens, 5))
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
    overrides = dict(norb=2, nspin=2, bath_type="replica")
    extra = {}
    for arg in argv:
        if "=" in arg:
            k, v = arg.split("=", 1)
            k = k.lower()
            if k in ("nk",):
                extra[k] = int(v)
            elif k in ("m0", "lam", "t", "wmixing"):
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
    print(f"dens={result.dens}")
    return result


if __name__ == "__main__":
    main()
