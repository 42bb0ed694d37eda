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
from .ops.lanczos import (lanczos_tridiag, lanczos_tridiag_batched,
                          tridiag_eigh)
from .sectors import SectorTable, occupations


@dataclass
class ChiPoles:
    """Excitation data of one hermitian-operator response channel.

    One-sided ordered-pair storage: for a thermal state |i> (Boltzmann
    weight w_i) and a Ritz excitation theta with matrix-element strength P,

        peso = P w_i / Z,  pth = P w_theta / Z,  de = theta - E_i,
        rev  = 1 if theta is NOT covered by the state list else 0.

    Evaluation sums each ordered Lehmann pair exactly once: the ordering
    with |i> in the thermal slot is always accumulated; the reverse
    ordering is added explicitly (rev=1) only when the partner state is
    absent from the state list — because when it *is* present, its own
    Krylov run provides that ordering. This is exact at T=0 (where it
    reproduces the reference's (1-e^{-beta dE}) factors,
    add_to_lanczos_spinChi, ED_GF_CHISPIN.f90:436-489) and, unlike the
    reference's lanc path, remains exact at finite T (matching the full-ED
    double sum, :501-592, which the reference factors double-count for
    pairs of thermally occupied states)."""
    peso: np.ndarray = field(default_factory=lambda: np.zeros(0))
    pth: np.ndarray = field(default_factory=lambda: np.zeros(0))
    de: np.ndarray = field(default_factory=lambda: np.zeros(0))
    rev: np.ndarray = field(default_factory=lambda: np.zeros(0))
    beta: float = 1.0

    def add(self, peso, pth, de, rev) -> None:
        self.peso = np.concatenate([self.peso, peso])
        self.pth = np.concatenate([self.pth, pth])
        self.de = np.concatenate([self.de, de])
        self.rev = np.concatenate([self.rev, rev])

    def matsubara(self, beta: float, vm: np.ndarray) -> np.ndarray:
        """chi(iv_n) on the bosonic grid (vm[0] == 0 handled specially).

        The pole weights are baked at the solve's beta; evaluating at a
        different temperature is inconsistent and rejected."""
        if len(self.peso) and abs(beta - self.beta) > 1e-12 * self.beta:
            raise ValueError(
                f"ChiPoles evaluated at beta={beta} but weights were "
                f"accumulated at beta={self.beta}")
        out = np.zeros(len(vm))
        p, pt, de, rev = self.peso, self.pth, self.de, self.rev
        if len(p) == 0:
            return out
        # iv=0: the reference skips |beta dE| <= 1e-3 pairs (Curie term)
        up = beta * de > 1e-3
        dn = (beta * de < -1e-3) & (rev > 0)
        out[0] = (2.0 * (p[up] - pt[up]) / de[up]).sum() \
            + (2.0 * (p[dn] - pt[dn]) / de[dn]).sum()
        if len(vm) > 1:
            fac = p - rev * pt
            out[1:] = (fac[None, :] * 2.0 * de[None, :]
                       / (vm[1:, None] ** 2 + de[None, :] ** 2)).sum(-1)
        return out

    def imtime(self, tau: np.ndarray) -> np.ndarray:
        if len(self.peso) == 0:
            return np.zeros(len(tau))
        p, de, rev = self.peso, self.de, self.rev
        fwd = p[None, :] * np.exp(-tau[:, None] * de[None, :])
        bwd = (rev * p)[None, :] * np.exp(
            -(self.beta - tau)[:, None] * de[None, :])
        return (fwd + bwd).sum(-1)

    def realaxis(self, beta: float, wr: np.ndarray, eps: float) -> np.ndarray:
        if len(self.peso) == 0:
            return np.zeros(len(wr), dtype=np.complex128)
        if abs(beta - self.beta) > 1e-12 * self.beta:
            raise ValueError(
                f"ChiPoles evaluated at beta={beta} but weights were "
                f"accumulated at beta={self.beta}")
        z = wr + 1j * eps
        fac = self.peso - self.pth
        return (fac[None, :] * (1.0 / (z[:, None] + self.de[None, :])
                                - self.rev[None, :]
                                / (z[:, None] - self.de[None, :]))
                ).sum(-1)


ChiSet = Dict[Tuple[int, int], ChiPoles]    # (iorb, jorb); (-1,-1) = total


def _diag_op_excite(cfg, sec, vec, diag_op):
    """vvinit = O|psi> for a diagonal operator O[dw, up] (same sector).

    Host numpy: the per-sector-shape multiply would otherwise compile one
    device executable per sector through the remote compiler (cold tail)."""
    v = np.asarray(vec).reshape(sec.dim_ph, sec.dim_dw, sec.dim_up)
    return (v * np.asarray(diag_op)[None]).reshape(-1)


def _store_poles(cfg, alphas, betas, norm2, state_e, therm,
                 chi: ChiPoles) -> None:
    """Ritz-decompose one tridiagonal and store one-sided pole data.

    ``therm`` = (e0, emax, zeta, wi): global ground-state energy, top of the
    state list, partition function, and this state's Boltzmann weight."""
    e0, emax, zeta, wi = therm
    theta, s = tridiag_eigh(alphas, betas)
    strength = norm2 * (s[0, :] ** 2)                 # P per Ritz pole
    de = theta - state_e
    eth = np.maximum(theta - e0, 0.0)                 # shifted pole energy
    peso = strength * wi / zeta
    pth = strength * np.exp(-cfg.beta * eth) / zeta
    # reverse ordering included only when the partner state cannot be in
    # the state list (energy above the list's coverage)
    tol = 1e-8 * max(1.0, abs(emax - e0))
    rev = (theta > emax + tol).astype(np.float64)
    keep = np.maximum(np.abs(peso), np.abs(pth)) > 1e-30
    chi.beta = cfg.beta
    chi.add(peso[keep], pth[keep], de[keep], rev[keep])


def _accumulate(cfg, hcache, sqn, vv, state_e, therm, chi: ChiPoles) -> None:
    """Krylov-tridiagonalize O|psi> and store one-sided pole data."""
    vv = np.asarray(vv)
    norm2 = float(np.vdot(vv, vv).real)
    if norm2 < 1e-28:
        return
    vv = jnp.asarray(vv / np.sqrt(norm2))
    op, op_apply = hcache(sqn)
    from .gf import unwrap_op
    op, pad_flat, _ = unwrap_op(op)
    if pad_flat is not None:
        vv = pad_flat(vv)
    m = min(vv.shape[0], cfg.lanc_ngfiter)
    alphas, betas = lanczos_tridiag(op, vv, m, op_apply)
    _store_poles(cfg, alphas, betas, norm2, state_e, therm, chi)


class _ChiBatcher:
    """Collects same-sector excitation vectors and tridiagonalizes them in
    one vmapped Lanczos scan per sector (the chi analogue of the GF
    _ExcBatcher): at finite T every retained state spawns norb(norb+3)/2
    channels per sector, all sharing the same operator."""

    def __init__(self, cfg: EDConfig, hcache: HCache, max_bytes=1 << 27):
        self.cfg = cfg
        self.hcache = hcache
        self.groups: Dict = {}
        self.max_bytes = max_bytes

    def add(self, sqn, vv, state_e, therm, chi: ChiPoles) -> None:
        vv = np.asarray(vv)
        norm2 = float(np.vdot(vv, vv).real)
        if norm2 < 1e-28:
            return
        self.groups.setdefault(sqn, []).append(
            (vv / np.sqrt(norm2), norm2, state_e, therm, chi))

    def run(self) -> None:
        import logging
        log = logging.getLogger("dmft_lanc_ed_tpu")
        from .utils.observability import kernel_stats
        from .ops.blocksparse import BlockSparseSectorOp
        from .ops.bs_chain import gf_chain_applicable, gf_tridiag_batch
        from .gf import unwrap_op
        n_chain = n_scan = 0
        for sqn, tasks in self.groups.items():
            op, op_apply = self.hcache(sqn)
            op, _, pad_batch = unwrap_op(op)
            dim = tasks[0][0].shape[0]
            m_dim = dim if pad_batch is None else op.dim
            m = min(m_dim, self.cfg.lanc_ngfiter)
            if (isinstance(op, BlockSparseSectorOp)
                    and dim >= self.cfg.ed_gf_chain_min_dim
                    and gf_chain_applicable(op, m)):
                # fused f32 chain kernel (same contract as the GF batcher)
                v0 = jnp.asarray(np.stack([np.asarray(t[0])
                                           for t in tasks]))
                kernel_stats.record(m * len(tasks), op.nnz)
                n_chain += len(tasks)
                a_b, b_b = gf_tridiag_batch(op, v0, m)
                for t, a, b in zip(tasks, a_b, b_b):
                    _, norm2, state_e, therm, chi = t
                    _store_poles(self.cfg, a, b, norm2, state_e, therm, chi)
                continue
            # largest power of two within the byte budget, so the pow2
            # batch padding below never exceeds it (ADVICE r2)
            cap = max(1, self.max_bytes // max(dim * 8, 1))
            bmax = 1 << (cap.bit_length() - 1)
            for i0 in range(0, len(tasks), bmax):
                chunk = tasks[i0:i0 + bmax]
                # pad to a FIXED floor of 8 (zero-filled dead chains are
                # cheap) so executables key on a stable batch size: the
                # state-list size fluctuates across DMFT iterations (GS
                # degeneracy changes) and every fresh (bucket, pow2-B)
                # pair was a new remote compile mid-loop
                bpad = 8
                while bpad < len(chunk):
                    bpad *= 2
                bpad = min(bpad, bmax)
                v0 = np.stack([np.asarray(t[0]) for t in chunk])
                if bpad > len(chunk):
                    v0 = np.concatenate(
                        [v0, np.zeros((bpad - len(chunk), dim), v0.dtype)])
                v0 = (pad_batch(v0) if pad_batch is not None
                      else jnp.asarray(v0))
                kernel_stats.record(m * len(chunk), getattr(op, "nnz", 0))
                n_scan += len(chunk)
                a_b, b_b = lanczos_tridiag_batched(op, v0, m, op_apply)
                a_np = np.asarray(a_b)[:len(chunk)]
                b_np = np.asarray(b_b)[:len(chunk)]
                for t, a, b in zip(chunk, a_np, b_np):
                    _, norm2, state_e, therm, chi = t
                    _store_poles(self.cfg, a, b, norm2, state_e, therm, chi)
        if n_chain or n_scan:
            log.info("chi batch routing: %d excitations via fused chain "
                     "kernel, %d via batched XLA scan", n_chain, n_scan)
        self.groups.clear()


def _build_chi_diagop(cfg: EDConfig, table: SectorTable, hcache: HCache,
                      state_list: StateList, op_orb) -> ChiSet:
    """Generic driver for diagonal hermitian operators per orbital.

    op_orb(sec, iorb) -> diag array [dim_dw, dim_up]; also builds mixed
    (a,b) channels and the total (-1,-1) channel, with the reference's
    algebraic recombination chi_ab = 1/2 (chi_mix - chi_aa - chi_bb).
    """
    chis: ChiSet = {}
    weights, zeta = state_list.boltzmann_weights(cfg.beta, cfg.finite_t)
    e0, emax = state_list.emin, state_list.emax
    if cfg.finite_t and not getattr(state_list, "clean_cut", True):
        import logging
        logging.getLogger("dmft_lanc_ed_tpu").warning(
            "chi: state list is not a clean energy cut at emax (some "
            "sectors may hide uncomputed levels below the cut) — the "
            "one-sided reverse weighting can over-weight pairs whose "
            "partner is missing; re-solve after neigen_sector adaptation "
            "for converged susceptibilities")
    batcher = _ChiBatcher(cfg, hcache)
    for w_s, st in zip(weights, state_list.states):
        wi = w_s if cfg.finite_t else 1.0
        therm = (e0, emax, zeta, wi)
        sec = table.sector(st.qn)
        ops = [op_orb(sec, a) for a in range(cfg.norb)]
        for a in range(cfg.norb):
            vv = _diag_op_excite(cfg, sec, st.vec, ops[a])
            batcher.add(st.qn, vv, st.e, therm,
                        chis.setdefault((a, a), ChiPoles()))
        for a in range(cfg.norb):
            for b in range(a + 1, cfg.norb):
                vv = _diag_op_excite(cfg, sec, st.vec, ops[a] + ops[b])
                batcher.add(st.qn, vv, st.e, therm,
                            chis.setdefault((a, b), ChiPoles()))
        if cfg.norb > 1:
            tot = sum(ops[1:], ops[0])
            vv = _diag_op_excite(cfg, sec, st.vec, tot)
            batcher.add(st.qn, vv, st.e, therm,
                        chis.setdefault((-1, -1), ChiPoles()))
    batcher.run()
    # recombine mixed channels: chi_ab = (chi_mix - chi_aa - chi_bb)/2
    for a in range(cfg.norb):
        for b in range(a + 1, cfg.norb):
            mix = chis.get((a, b))
            if mix is None:
                continue
            new = ChiPoles(beta=cfg.beta)
            for sign, src in ((0.5, mix), (-0.5, chis[(a, a)]),
                              (-0.5, chis[(b, b)])):
                new.add(sign * src.peso, sign * src.pth, src.de, src.rev)
            chis[(a, b)] = new
            chis[(b, a)] = new
    if cfg.norb == 1:
        chis[(-1, -1)] = chis[(0, 0)]
    return chis


def build_chi_spin(cfg: EDConfig, table: SectorTable, hcache: HCache,
                   state_list: StateList) -> ChiSet:
    """S_z(a) = (n_up,a - n_dw,a)/2 response (build_chi_spin)."""
    def op(sec, a):
        ou = occupations(sec.states_up[0], cfg.ns)[:, a].astype(np.float64)
        od = occupations(sec.states_dw[0], cfg.ns)[:, a].astype(np.float64)
        return 0.5 * (ou[None, :] - od[:, None])
    return _build_chi_diagop(cfg, table, hcache, state_list, op)


def build_chi_dens(cfg: EDConfig, table: SectorTable, hcache: HCache,
                   state_list: StateList) -> ChiSet:
    """Total density n(a) response (build_chi_dens)."""
    def op(sec, a):
        ou = occupations(sec.states_up[0], cfg.ns)[:, a].astype(np.float64)
        od = occupations(sec.states_dw[0], cfg.ns)[:, a].astype(np.float64)
        return ou[None, :] + od[:, None]
    return _build_chi_diagop(cfg, table, hcache, state_list, op)


# ---------------------------------------------------------------------------
# full-ED (Lehmann double-sum) variants — the reference's full_ed_build_*
# twins (ED_GF_CHISPIN.f90:501-592, ED_GF_CHIDENS.f90:502-593,
# ED_GF_PHONON.f90:188-248). Matrix elements <i|O|j> are computed per sector
# as one dense matmul M = V^T (diag(O) V) over the full eigenbasis.
# ---------------------------------------------------------------------------

@dataclass
class PairChiPoles:
    """Full-ED excitation data: pairs (peso, ei, ej) with energies relative
    to the global ground state, plus the (shifted) partition function.
    Evaluation formulas follow the reference literally (both (i,j) orderings
    are stored, so no (1-e^{-beta dE}) recombination is applied here)."""
    peso: np.ndarray
    ei: np.ndarray
    ej: np.ndarray
    zeta: float
    beta: float = 1.0

    def matsubara(self, beta: float, vm: np.ndarray) -> np.ndarray:
        out = np.zeros(len(vm))
        if len(self.peso) == 0:
            return out
        de = self.ei - self.ej
        wj = np.exp(-beta * self.ej)
        p = self.peso / self.zeta
        m0 = beta * de > 1e-3
        out[0] = (p[m0] * 2.0 * wj[m0] * (1.0 - np.exp(-beta * de[m0]))
                  / de[m0]).sum()
        if len(vm) > 1:
            out[1:] = (p[None, :] * wj[None, :] * 2.0 * de[None, :]
                       / (vm[1:, None] ** 2 + de[None, :] ** 2)).sum(-1)
        return out

    def imtime(self, tau: np.ndarray) -> np.ndarray:
        if len(self.peso) == 0:
            return np.zeros(len(tau))
        beta = self.beta
        p = self.peso / self.zeta
        return (p[None, :] * np.exp(-tau[:, None] * self.ei[None, :])
                * np.exp(-(beta - tau)[:, None] * self.ej[None, :])).sum(-1)

    def realaxis(self, beta: float, wr: np.ndarray,
                 eps: float) -> np.ndarray:
        if len(self.peso) == 0:
            return np.zeros(len(wr), dtype=np.complex128)
        de = self.ei - self.ej
        p = self.peso / self.zeta
        fac = p * (np.exp(-beta * self.ei) - np.exp(-beta * self.ej))
        z = wr + 1j * eps
        return -(fac[None, :] / (z[:, None] + de[None, :])).sum(-1)


def _sector_eigsets(state_list: StateList):
    """Group a full-ED StateList into per-sector (E, V[dim, nst]) pairs."""
    groups: Dict = {}
    for st in state_list.states:
        groups.setdefault(st.qn, []).append(st)
    for qn, sts in groups.items():
        e = np.array([s.e for s in sts])
        v = np.stack([np.asarray(s.vec) for s in sts], axis=1)
        yield qn, e, v


def _full_chi_diagop(cfg: EDConfig, table: SectorTable,
                     state_list: StateList, op_orb) -> ChiSet:
    """Full-ED chi for diagonal per-orbital operators: all (a, b) channels
    (computed directly, no recombination) plus the total channel."""
    e0 = state_list.emin
    beta = cfg.beta
    zeta = float(sum(np.exp(-beta * (s.e - e0)) for s in state_list.states))
    acc: Dict[Tuple[int, int], list] = {}

    def push(key, peso, ei, ej):
        acc.setdefault(key, []).append((peso, ei, ej))

    for qn, e_abs, v in _sector_eigsets(state_list):
        sec = table.sector(qn)
        e = e_abs - e0
        w = np.exp(-beta * e)
        keep = (w[:, None] + w[None, :]) >= cfg.cutoff     # [nst, nst]
        if not keep.any():
            continue
        ii, jj = np.nonzero(keep)
        ops = [np.tile(np.asarray(op_orb(sec, a)).reshape(-1), sec.dim_ph)
               for a in range(cfg.norb)]
        ms = [v.T @ (d[:, None] * v) for d in ops]          # [nst, nst]
        chans = [((a, b), ms[a] * ms[b])
                 for a in range(cfg.norb) for b in range(a, cfg.norb)]
        if cfg.norb > 1:
            mt = sum(ms[1:], ms[0])
            chans.append(((-1, -1), mt * mt))
        for key, pes in chans:
            push(key, pes[ii, jj], e[ii], e[jj])

    chis: ChiSet = {}
    for key, parts in acc.items():
        peso = np.concatenate([p for p, _, _ in parts])
        ei = np.concatenate([a for _, a, _ in parts])
        ej = np.concatenate([b for _, _, b in parts])
        pole = PairChiPoles(peso, ei, ej, zeta)
        pole.beta = beta
        chis[key] = pole
        if key[0] >= 0 and key[0] != key[1]:
            chis[(key[1], key[0])] = pole
    if cfg.norb == 1 and (0, 0) in chis:
        chis[(-1, -1)] = chis[(0, 0)]
    return chis


def full_build_chi_spin(cfg: EDConfig, table: SectorTable,
                        state_list: StateList) -> ChiSet:
    """Full-ED spin susceptibility (full_ed_build_spinChi_main)."""
    def op(sec, a):
        ou = occupations(sec.states_up[0], cfg.ns)[:, a]
        od = occupations(sec.states_dw[0], cfg.ns)[:, a]
        return 0.5 * (ou[None, :] - od[:, None])
    return _full_chi_diagop(cfg, table, state_list, op)


def full_build_chi_dens(cfg: EDConfig, table: SectorTable,
                        state_list: StateList) -> ChiSet:
    """Full-ED charge susceptibility (full_ed_build_densChi_main)."""
    def op(sec, a):
        ou = occupations(sec.states_up[0], cfg.ns)[:, a]
        od = occupations(sec.states_dw[0], cfg.ns)[:, a]
        return ou[None, :] + od[:, None]
    return _full_chi_diagop(cfg, table, state_list, op)


def full_build_gf_phonon(cfg: EDConfig, table: SectorTable,
                         state_list: StateList) -> PairChiPoles:
    """Full-ED displacement GF (full_ed_build_phononGF, ED_GF_PHONON.f90:
    188-248): <i|x|j> matrix elements with x = b + b^+ across phonon blocks;
    same sign conventions as the Lanczos ChiPoles result."""
    e0 = state_list.emin
    beta = cfg.beta
    zeta = float(sum(np.exp(-beta * (s.e - e0)) for s in state_list.states))
    x = np.zeros((cfg.dim_ph, cfg.dim_ph))
    for p in range(cfg.dim_ph - 1):
        x[p, p + 1] = np.sqrt(p + 1.0)
        x[p + 1, p] = np.sqrt(p + 1.0)
    pesos, eis, ejs = [], [], []
    for qn, e_abs, v in _sector_eigsets(state_list):
        sec = table.sector(qn)
        e = e_abs - e0
        w = np.exp(-beta * e)
        keep = (w[:, None] + w[None, :]) >= cfg.cutoff
        if not keep.any():
            continue
        ii, jj = np.nonzero(keep)
        dim_el = sec.dim_dw * sec.dim_up
        v3 = v.reshape(sec.dim_ph, dim_el, v.shape[1])
        xv = np.einsum("pq,qen->pen", x, v3).reshape(-1, v.shape[1])
        m = v.reshape(-1, v.shape[1]).T @ xv
        pesos.append((m * m)[ii, jj])
        eis.append(e[ii])
        ejs.append(e[jj])
    if pesos:
        pole = PairChiPoles(np.concatenate(pesos), np.concatenate(eis),
                            np.concatenate(ejs), zeta)
    else:
        pole = PairChiPoles(np.zeros(0), np.zeros(0), np.zeros(0), zeta)
    pole.beta = beta
    return pole


def build_gf_phonon(cfg: EDConfig, table: SectorTable, hcache: HCache,
                    state_list: StateList) -> ChiPoles:
    """Displacement GF D(z) from x = b + b^+ (build_gf_phonon).

    Stored as ChiPoles; evaluate with the *negative* of the chi formulas on
    iv/real axes (the reference flips signs for D, ED_GF_PHONON.f90:168-177).
    """
    chi = ChiPoles(beta=cfg.beta)
    weights, zeta = state_list.boltzmann_weights(cfg.beta, cfg.finite_t)
    e0, emax = state_list.emin, state_list.emax
    x = np.zeros((cfg.dim_ph, cfg.dim_ph))
    for p in range(cfg.dim_ph - 1):
        x[p, p + 1] = np.sqrt(p + 1.0)
        x[p + 1, p] = np.sqrt(p + 1.0)
    batcher = _ChiBatcher(cfg, hcache)
    for w_s, st in zip(weights, state_list.states):
        wi = w_s if cfg.finite_t else 1.0
        sec = table.sector(st.qn)
        v = np.asarray(st.vec).reshape(sec.dim_ph, sec.dim_dw, sec.dim_up)
        vv = np.einsum("pq,qdu->pdu", x, v).reshape(-1)
        batcher.add(st.qn, vv, st.e, (e0, emax, zeta, wi), chi)
    batcher.run()
    return chi
