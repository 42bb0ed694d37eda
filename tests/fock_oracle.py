"""Independent brute-force many-body oracle for small systems.

Builds the full Anderson-impurity Hamiltonian as a dense matrix over the whole
2^(2 Ns) Fock space using explicit Jordan-Wigner operator matrices — written
directly from the physics (second-quantized Hamiltonian), independent of the
package's tensor-product assembly. Level ordering: spin-up levels 0..Ns-1,
spin-down levels Ns..2Ns-1 (the reference's impIndex convention,
ED_AUX_FUNX / ED_SETUP).

Used to validate sector maps, fermionic signs, and every Hamiltonian term.
"""
from __future__ import annotations

import numpy as np


def jw_ops(nlevels: int):
    """Annihilation operators c_p as dense [2^n, 2^n] matrices (JW strings)."""
    dim = 1 << nlevels
    states = np.arange(dim)
    ops = []
    for p in range(nlevels):
        occ = ((states >> p) & 1) == 1
        src = states[occ]
        dst = src ^ (1 << p)
        below = src & ((1 << p) - 1)
        sign = 1 - 2 * (np.array([bin(int(b)).count("1") for b in below]) % 2)
        c = np.zeros((dim, dim))
        c[dst, src] = sign
        ops.append(c)
    return ops


def anderson_hamiltonian(cfg, hloc, e_bath, v_bath, hbath=None,
                         bath_sites=None):
    """Dense H over the full Fock space.

    - hloc[nspin, nspin, norb, norb]
    - e_bath[nspin, norb_e, nbath], v_bath[nspin, norb, nbath]
    - hbath[nspin, nspin, norb, norb, nbath] (replica hopping, optional)
    - bath_sites: callable (iorb, k) -> level index (defaults to package's
      bath_stride convention)
    """
    from dmft_lanc_ed_tpu.sectors import bath_stride

    ns = cfg.ns
    norb, nb, nspin = cfg.norb, cfg.nbath, cfg.nspin
    ntot = 2 * ns
    cs = jw_ops(ntot)

    def c(p, s):       # annihilate level p (0..ns-1), spin s (0 up, 1 dw)
        return cs[p + s * ns]

    def n(p, s):
        op = c(p, s)
        return op.T @ op

    stride = bath_sites or (lambda a, k: bath_stride(cfg, a, k))
    dim = 1 << ntot
    h = np.zeros((dim, dim))
    sidx = lambda s: s if nspin == 2 else 0

    # impurity local hamiltonian + chemical potential
    for s in range(2):
        si = sidx(s)
        for a in range(norb):
            for b in range(norb):
                h += hloc[si, si, a, b] * (c(a, s).T @ c(b, s))
            h -= cfg.xmu * n(a, s)
    # bath levels
    norb_e = e_bath.shape[1]
    for s in range(2):
        si = sidx(s)
        for a in range(norb_e):
            for k in range(nb):
                h += e_bath[si, a, k] * n(stride(a, k), s)
    # replica intra-bath hopping
    if hbath is not None:
        for s in range(2):
            si = sidx(s)
            for k in range(nb):
                for a in range(norb):
                    for b in range(norb):
                        if a != b:
                            h += hbath[si, si, a, b, k] * (
                                c(stride(a, k), s).T @ c(stride(b, k), s))
    # hybridization
    for s in range(2):
        si = sidx(s)
        for a in range(norb):
            for k in range(nb):
                v = v_bath[si, a, k]
                h += v * (c(stride(a, k), s).T @ c(a, s))
                h += v * (c(a, s).T @ c(stride(a, k), s))
    # interaction (Kanamori density-density)
    uloc = np.array(cfg.uloc[:norb])
    for a in range(norb):
        h += uloc[a] * (n(a, 0) @ n(a, 1))
    if norb > 1:
        for a in range(norb):
            for b in range(a + 1, norb):
                h += cfg.ust * (n(a, 0) @ n(b, 1) + n(b, 0) @ n(a, 1))
                h += (cfg.ust - cfg.jh) * (n(a, 0) @ n(b, 0) + n(a, 1) @ n(b, 1))
    # Hartree shift
    if cfg.hfmode:
        eye = np.eye(dim)
        for a in range(norb):
            h += -0.5 * uloc[a] * (n(a, 0) + n(a, 1)) + 0.25 * uloc[a] * eye
        if norb > 1:
            for a in range(norb):
                for b in range(a + 1, norb):
                    nsum = n(a, 0) + n(a, 1) + n(b, 0) + n(b, 1)
                    h += -0.5 * cfg.ust * nsum + 0.25 * cfg.ust * eye
                    h += -0.5 * (cfg.ust - cfg.jh) * nsum \
                        + 0.25 * (cfg.ust - cfg.jh) * eye
    # spin exchange + pair hopping
    if norb > 1:
        for a in range(norb):
            for b in range(norb):
                if a == b:
                    continue
                if cfg.jx != 0.0:
                    h += cfg.jx * (c(a, 0).T @ c(b, 1).T @ c(a, 1) @ c(b, 0))
                if cfg.jp != 0.0:
                    h += cfg.jp * (c(a, 0).T @ c(a, 1).T @ c(b, 1) @ c(b, 0))
    return h


def sector_states(ns: int, nup: int, ndw: int):
    """Full-Fock indices of sector basis states in (iup + idw*DimUp) order."""
    from dmft_lanc_ed_tpu.sectors import enumerate_states

    up = enumerate_states(ns, nup)
    dw = enumerate_states(ns, ndw)
    full = (up[None, :] | (dw[:, None] << ns)).reshape(-1)   # [DimDw*DimUp]
    return full


def sector_hamiltonian_oracle(cfg, hloc, e_bath, v_bath, nup, ndw,
                              hbath=None) -> np.ndarray:
    h = anderson_hamiltonian(cfg, hloc, e_bath, v_bath, hbath)
    idx = sector_states(cfg.ns, nup, ndw)
    return h[np.ix_(idx, idx)]
