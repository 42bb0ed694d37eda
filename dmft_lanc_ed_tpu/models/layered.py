"""Generic real-space (inequivalent-sites) DMFT loop over an Nlat-block H(k).

Shared machinery for the layered/multi-sublattice reference workloads
(edn_bhz_2d_edge.f90, edn_wsm_slab.f90, edn_hm_square_afm2.f90): every
site/layer is an impurity problem; the block lattice GF
(:func:`~dmft_lanc_ed_tpu.dmft.gloc.gloc_blocks`) embeds all self-energies
at once; per-site Weiss fields are fitted independently.
"""
from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

from ..bath import break_symmetry_bath, spin_symmetrize_bath
from ..config import EDConfig
from ..dmft import ConvergenceCheck, LinearMixer
from ..dmft.gloc import gloc_blocks
from ..dmft.selfcons import self_consistency
from ..hloc import decompose_hloc
from ..lattice import LatticeSolver
from ..solver import matsubara_grid

log = logging.getLogger("dmft_lanc_ed_tpu")


def hloc_blocks_from_hk(hk: np.ndarray, nlat: int, nspin: int,
                        norb: int) -> np.ndarray:
    """Per-site local Hamiltonians = BZ average of the diagonal blocks."""
    nso = nspin * norb
    hmean = hk.mean(axis=0)
    out = np.zeros((nlat, nspin, nspin, norb, norb))
    for il in range(nlat):
        o = il * nso
        blk = hmean[o:o + nso, o:o + nso]
        if not np.allclose(blk.imag, 0.0, atol=1e-10):
            raise ValueError("site Hloc has imaginary parts (real ED)")
        out[il] = blk.real.reshape(nspin, norb, nspin, norb
                                   ).transpose(0, 2, 1, 3)
    return out


def run_layered(cfg: EDConfig, hk: np.ndarray, nlat: int,
                wmixing: float = 0.5, afm_seed: bool = False,
                spinsym: bool = False,
                bath0: Optional[np.ndarray] = None, name: str = "layered",
                verbose: bool = True):
    """Nlat-site real-space DMFT. Returns (LatticeResult, history, converged).

    afm_seed: stagger the initial bath with +-sb_field (AFM workloads;
    skipped when spinsym=True, matching the reference drivers which zero
    sb_field for paramagnetic runs). spinsym: fit spin-up only and copy.
    """
    hloc_l = hloc_blocks_from_hk(hk, nlat, cfg.nspin, cfg.norb)
    h_basis = lam_imp = None
    if cfg.bath_type == "replica":
        h_basis, lam_imp = decompose_hloc(cfg, hloc_l[0])
    bank = LatticeSolver(cfg, nlat, hloc=hloc_l, h_basis=h_basis,
                         lambda_imp=lam_imp)
    if bath0 is not None:
        baths = np.asarray(bath0).copy()
    else:
        baths = bank.init_baths()
        if afm_seed and not spinsym:
            for i in range(nlat):
                baths[i] = break_symmetry_bath(cfg, baths[i], cfg.sb_field,
                                               sign=(-1.0) ** i)
    wm = matsubara_grid(cfg)
    z = 1j * wm
    mixer = LinearMixer(wmixing)
    conv = ConvergenceCheck(cfg.dmft_error, cfg.nsuccess, cfg.nloop)
    history: List[dict] = []
    res = None
    converged = False

    for iloop in range(1, cfg.nloop + 1):
        res = bank.solve(baths)
        sig_ii = res.sigma_mats                       # [Nlat, ...]
        gloc_ii = gloc_blocks(hk, sig_ii, z, xmu=cfg.xmu)
        weiss_ii = np.stack([
            self_consistency(gloc_ii[il], sig_ii[il], hloc_l[il], z,
                             sctype=cfg.cg_scheme, xmu=cfg.xmu)
            for il in range(nlat)])
        if spinsym:
            fitted = bank.fit_baths(weiss_ii, baths, ispin=0)
            baths = mixer(np.stack(
                [spin_symmetrize_bath(cfg, b) for b in fitted]))
        else:
            baths = mixer(bank.fit_baths(weiss_ii, baths))
        gtest = weiss_ii[:, 0, 0, 0, 0].mean(axis=0)
        converged = conv(gtest)
        history.append(dict(iloop=iloop, error=conv.error,
                            dens=res.dens.copy(), mag=res.mag.copy()))
        if verbose:
            log.info("%s loop %02d: err=%.3e dens=%s", name, iloop,
                     conv.error, np.round(res.dens.ravel(), 4))
        if converged and conv.error < cfg.dmft_error:
            break
    return res, history, converged
