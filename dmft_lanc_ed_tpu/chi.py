"""Susceptibilities and phonon Green's function.

TPU-native re-design of ED_GF_CHISPIN.f90 / ED_GF_CHIDENS.f90 /
ED_GF_PHONON.f90: hermitian-operator Krylov response functions. The operator
is applied diagonally (S_z, n) or block-tridiagonally (x = b + b^+) within the
*same* sector, tridiagonalized with the jitted Lanczos scan, and the resulting
excitation data (dE, peso) pairs are stored; evaluation on the bosonic
Matsubara grid, imaginary time, and the real axis reproduces the reference's
accumulation formulas (add_to_lanczos_spinChi, ED_GF_CHISPIN.f90:436-489;
add_to_lanczos_phonon, ED_GF_PHONON.f90:132-179) as single broadcasts:

  chi(iv_0)  = sum 2 peso (1-e^{-beta dE})/dE          [beta dE > 1e-3]
  chi(iv_n)  = sum peso (1-e^{-beta dE}) 2 dE/(v_n^2 + dE^2)
  chi(tau)   = sum peso e^{-tau dE}
  chi(w+i0+) = -sum peso (1-e^{-beta dE}) [1/(w+ie-dE) - 1/(w+ie+dE)]
  (phonon D: overall opposite sign on iv/real axes.)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .config import EDConfig
from .eigenspace import StateList
from .gf import HCache
from .ops.lanczos import lanczos_tridiag, tridiag_eigh
from .sectors import SectorTable, occupations


@dataclass
class ChiPoles:
    """Excitation data of one hermitian-operator response channel."""
    peso: np.ndarray = field(default_factory=lambda: np.zeros(0))
    de: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def add(self, peso: np.ndarray, de: np.ndarray) -> None:
        self.peso = np.concatenate([self.peso, peso])
        self.de = np.concatenate([self.de, de])

    def matsubara(self, beta: float, vm: np.ndarray) -> np.ndarray:
        """chi(iv_n) on the bosonic grid (vm[0] == 0 handled specially)."""
        out = np.zeros(len(vm))
        w, de = self.peso, self.de
        if len(w) == 0:
            return out
        fac = w * (1.0 - np.exp(-beta * de))
        mask0 = beta * de > 1e-3
        out[0] = (2.0 * fac[mask0] / de[mask0]).sum()
        if len(vm) > 1:
            out[1:] = (fac[None, :] * 2.0 * de[None, :]
                       / (vm[1:, None] ** 2 + de[None, :] ** 2)).sum(-1)
        return out

    def imtime(self, tau: np.ndarray) -> np.ndarray:
        if len(self.peso) == 0:
            return np.zeros(len(tau))
        return (self.peso[None, :]
                * np.exp(-tau[:, None] * self.de[None, :])).sum(-1)

    def realaxis(self, beta: float, wr: np.ndarray, eps: float) -> np.ndarray:
        if len(self.peso) == 0:
            return np.zeros(len(wr), dtype=np.complex128)
        z = wr + 1j * eps
        fac = self.peso * (1.0 - np.exp(-beta * self.de))
        return -(fac[None, :] * (1.0 / (z[:, None] - self.de[None, :])
                                 - 1.0 / (z[:, None] + self.de[None, :]))
                 ).sum(-1)


ChiSet = Dict[Tuple[int, int], ChiPoles]    # (iorb, jorb); (-1,-1) = total


def _diag_op_excite(cfg, sec, vec, diag_op):
    """vvinit = O|psi> for a diagonal operator O[dw, up] (same sector)."""
    v = vec.reshape(sec.dim_ph, sec.dim_dw, sec.dim_up)
    return (v * diag_op[None]).reshape(-1)


def _accumulate(cfg, hcache, sqn, vv, state_e, peso_f, chi: ChiPoles) -> None:
    norm2 = float(jnp.vdot(vv, vv).real)
    if norm2 < 1e-28:
        return
    vv = vv / jnp.sqrt(norm2)
    op, op_apply = hcache(sqn)
    m = min(vv.shape[0], cfg.lanc_ngfiter)
    alphas, betas = lanczos_tridiag(op, vv, m, op_apply)
    theta, s = tridiag_eigh(alphas, betas)
    peso = norm2 * peso_f * (s[0, :] ** 2)
    de = theta - state_e
    keep = np.abs(peso) > 1e-30
    chi.add(peso[keep], de[keep])


def _build_chi_diagop(cfg: EDConfig, table: SectorTable, hcache: HCache,
                      state_list: StateList, op_orb) -> ChiSet:
    """Generic driver for diagonal hermitian operators per orbital.

    op_orb(sec, iorb) -> diag array [dim_dw, dim_up]; also builds mixed
    (a,b) channels and the total (-1,-1) channel, with the reference's
    algebraic recombination chi_ab = 1/2 (chi_mix - chi_aa - chi_bb).
    """
    chis: ChiSet = {}
    weights, zeta = state_list.boltzmann_weights(cfg.beta, cfg.finite_t)
    for w_s, st in zip(weights, state_list.states):
        peso_bz = (w_s if cfg.finite_t else 1.0) / zeta
        sec = table.sector(st.qn)
        ops = [op_orb(sec, a) for a in range(cfg.norb)]
        for a in range(cfg.norb):
            vv = _diag_op_excite(cfg, sec, st.vec, ops[a])
            _accumulate(cfg, hcache, st.qn, vv, st.e, peso_bz,
                        chis.setdefault((a, a), ChiPoles()))
        for a in range(cfg.norb):
            for b in range(a + 1, cfg.norb):
                vv = _diag_op_excite(cfg, sec, st.vec, ops[a] + ops[b])
                _accumulate(cfg, hcache, st.qn, vv, st.e, peso_bz,
                            chis.setdefault((a, b), ChiPoles()))
        if cfg.norb > 1:
            tot = sum(ops[1:], ops[0])
            vv = _diag_op_excite(cfg, sec, st.vec, tot)
            _accumulate(cfg, hcache, st.qn, vv, st.e, peso_bz,
                        chis.setdefault((-1, -1), ChiPoles()))
    # recombine mixed channels
    for a in range(cfg.norb):
        for b in range(a + 1, cfg.norb):
            mix = chis.get((a, b))
            if mix is None:
                continue
            new = ChiPoles()
            new.add(0.5 * mix.peso, mix.de)
            new.add(-0.5 * chis[(a, a)].peso, chis[(a, a)].de)
            new.add(-0.5 * chis[(b, b)].peso, chis[(b, b)].de)
            chis[(a, b)] = new
            chis[(b, a)] = new
    if cfg.norb == 1:
        chis[(-1, -1)] = chis[(0, 0)]
    return chis


def build_chi_spin(cfg: EDConfig, table: SectorTable, hcache: HCache,
                   state_list: StateList) -> ChiSet:
    """S_z(a) = (n_up,a - n_dw,a)/2 response (build_chi_spin)."""
    def op(sec, a):
        ou = jnp.asarray(occupations(sec.states_up[0], cfg.ns)[:, a],
                         jnp.float64)
        od = jnp.asarray(occupations(sec.states_dw[0], cfg.ns)[:, a],
                         jnp.float64)
        return 0.5 * (ou[None, :] - od[:, None])
    return _build_chi_diagop(cfg, table, hcache, state_list, op)


def build_chi_dens(cfg: EDConfig, table: SectorTable, hcache: HCache,
                   state_list: StateList) -> ChiSet:
    """Total density n(a) response (build_chi_dens)."""
    def op(sec, a):
        ou = jnp.asarray(occupations(sec.states_up[0], cfg.ns)[:, a],
                         jnp.float64)
        od = jnp.asarray(occupations(sec.states_dw[0], cfg.ns)[:, a],
                         jnp.float64)
        return ou[None, :] + od[:, None]
    return _build_chi_diagop(cfg, table, hcache, state_list, op)


def build_gf_phonon(cfg: EDConfig, table: SectorTable, hcache: HCache,
                    state_list: StateList) -> ChiPoles:
    """Displacement GF D(z) from x = b + b^+ (build_gf_phonon).

    Stored as ChiPoles; evaluate with the *negative* of the chi formulas on
    iv/real axes (the reference flips signs for D, ED_GF_PHONON.f90:168-177).
    """
    chi = ChiPoles()
    weights, zeta = state_list.boltzmann_weights(cfg.beta, cfg.finite_t)
    x = np.zeros((cfg.dim_ph, cfg.dim_ph))
    for p in range(cfg.dim_ph - 1):
        x[p, p + 1] = np.sqrt(p + 1.0)
        x[p + 1, p] = np.sqrt(p + 1.0)
    xj = jnp.asarray(x)
    for w_s, st in zip(weights, state_list.states):
        peso_bz = (w_s if cfg.finite_t else 1.0) / zeta
        sec = table.sector(st.qn)
        v = st.vec.reshape(sec.dim_ph, sec.dim_dw, sec.dim_up)
        vv = jnp.einsum("pq,qdu->pdu", xj, v).reshape(-1)
        _accumulate(cfg, hcache, st.qn, vv, st.e, peso_bz, chi)
    return chi
