"""Inequivalent-sites (real-space / lattice) solver API.

Re-design of the reference's lattice driver layer (`ed_solve_lattice[_mpi]`,
ED_MAIN.f90:373-674): N inequivalent impurity problems with per-site baths,
per-site local Hamiltonians and optional per-site interaction overrides. The
reference round-robins sites over MPI ranks and AllReduces [Nlat, ...]
arrays; here each site solve is a device-accelerated EDSolver and the site
loop runs on host (site-level device parallelism — the reference's
inter-site embarrassing parallelism — maps onto multiple TPU chips via one
process per chip or, later, vmapped batched sectors).

Also carries the per-site chi2 fit loop (ed_chi2_fitgf lattice overload,
ED_FIT_CHI2.f90:151-240) and per-site adaptive diag state persistence
(neigen_sectorii, ED_MAIN.f90:614-621).
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .config import EDConfig
from .fit import chi2_fitgf
from .solver import EDSolver, SolveResult

log = logging.getLogger("dmft_lanc_ed_tpu")


@dataclass
class LatticeResult:
    results: List[SolveResult]

    def _stack(self, attr):
        return np.stack([getattr(r, attr) for r in self.results])

    @property
    def sigma_mats(self):      # [nlat, nspin, nspin, norb, norb, L]
        return self._stack("sigma_mats")

    @property
    def sigma_real(self):
        return self._stack("sigma_real")

    @property
    def g_mats(self):
        return self._stack("g_mats")

    @property
    def dens(self):
        return np.stack([r.observables.dens for r in self.results])

    @property
    def docc(self):
        return np.stack([r.observables.docc for r in self.results])

    @property
    def mag(self):
        return np.stack([r.observables.mag for r in self.results])


class LatticeSolver:
    """N-site impurity solver bank (`ed_init_solver` lattice overload)."""

    def __init__(self, cfg: EDConfig, nlat: int,
                 hloc: Optional[np.ndarray] = None,
                 uloc_ii: Optional[np.ndarray] = None,
                 ust_ii: Optional[np.ndarray] = None,
                 jh_ii: Optional[np.ndarray] = None,
                 h_basis=None, lambda_imp=None):
        """hloc: [nlat, nspin, nspin, norb, norb]; per-site interaction
        overrides (Uloc_ii [nlat, norb], Ust_ii [nlat], Jh_ii [nlat] —
        ED_MAIN.f90:377-379,458-460)."""
        self.cfg = cfg
        self.nlat = nlat
        self.solvers: List[EDSolver] = []
        for i in range(nlat):
            over = {}
            if uloc_ii is not None:
                over["uloc"] = tuple(uloc_ii[i])
            if ust_ii is not None:
                over["ust"] = float(ust_ii[i])
            if jh_ii is not None:
                over["jh"] = float(jh_ii[i])
            cfg_i = cfg.replace(**over) if over else cfg
            hloc_i = None if hloc is None else hloc[i]
            self.solvers.append(
                EDSolver(cfg_i, hloc_i, h_basis=h_basis,
                         lambda_imp=lambda_imp))

    def init_baths(self) -> np.ndarray:
        """[nlat, nb] initial packed baths."""
        return np.stack([s.init_bath() for s in self.solvers])

    def solve(self, baths: np.ndarray,
              devices: Optional[list] = None) -> LatticeResult:
        """Solve all sites; `devices` round-robins sites over chips.

        The reference distributes inequivalent sites over MPI ranks
        (do ilat=1+MPI_ID,Nsites,MPI_SIZE, ED_MAIN.f90:603); here site i's
        compute is placed on devices[i % ndev] via jax.default_device, the
        single-controller analogue — async dispatch overlaps device work
        across sites until each site's host-side reduction.
        """
        import jax
        results = []
        for i, solver in enumerate(self.solvers):
            log.info("lattice site %d/%d", i + 1, self.nlat)
            if devices:
                with jax.default_device(devices[i % len(devices)]):
                    results.append(solver.solve(baths[i]))
            else:
                results.append(solver.solve(baths[i]))
        return LatticeResult(results)

    def fit_baths(self, weiss: np.ndarray, baths: np.ndarray,
                  ispin: Optional[int] = None,
                  outdir: Optional[str] = None) -> np.ndarray:
        """Per-site chi2 fit; weiss: [nlat, nspin, nspin, norb, norb, L].

        With ``outdir``, fit diagnostics carry the reference's per-site
        suffix ``_ineq<NNNN>`` (ineq_site_suffix + site_indx_padding,
        ED_MAIN.f90:455)."""
        out = np.empty_like(baths)
        for i, solver in enumerate(self.solvers):
            out[i] = chi2_fitgf(solver.cfg, weiss[i], baths[i], solver.hloc,
                                ispin=ispin, h_basis=solver.h_basis,
                                outdir=outdir, suffix=f"_ineq{i + 1:04d}")
        return out
