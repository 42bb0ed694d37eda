"""Spin/charge susceptibility correctness: independent Lehmann oracle over
the full Fock space vs the Lanczos path, and lanc-vs-full-ED cross-checks.

The oracle builds H with tests/fock_oracle.py (independent JW construction),
diagonalizes the whole 2^(2Ns) space, and evaluates the chi double sum with
the reference's conventions written directly from ED_GF_CHISPIN.f90:545-589
(note: the reference skips beta*dE <= 1e-3 pairs at iv=0 — the Curie term —
and we match that behavior).
"""
import numpy as np
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.solver import EDSolver

from fock_oracle import anderson_hamiltonian


def lehmann_chi_oracle(h, opdiag, beta, vm, tau, wr, eps):
    """Reference-convention chi from a dense H and a diagonal operator."""
    w_, v_ = np.linalg.eigh(h)
    e = w_ - w_.min()
    boltz = np.exp(-beta * e)
    zeta = boltz.sum()
    m = v_.T @ (opdiag[:, None] * v_)              # <i|O|j>
    peso = m * m / zeta                            # [i, j]
    de = e[:, None] - e[None, :]                   # Ei - Ej
    wj = boltz[None, :] * np.ones_like(de)
    wi = boltz[:, None] * np.ones_like(de)

    out_iv = np.zeros(len(vm))
    m0 = beta * de > 1e-3
    out_iv[0] = (peso[m0] * 2.0 * wj[m0]
                 * (1.0 - np.exp(-beta * de[m0])) / de[m0]).sum()
    for k in range(1, len(vm)):
        out_iv[k] = (peso * wj * 2.0 * de / (vm[k] ** 2 + de ** 2)).sum()

    out_tau = np.array([
        (peso * np.exp(-t * e[:, None]) * np.exp(-(beta - t) * e[None, :])
         ).sum() for t in tau])

    z = wr + 1j * eps
    out_w = np.array([-(peso * (wi - wj) / (zz + de)).sum() for zz in z])
    return out_iv, out_tau, out_w


def _grids(cfg):
    vm = 2.0 * np.arange(cfg.lmats) * np.pi / cfg.beta
    tau = np.linspace(0.0, cfg.beta, cfg.ltau + 1)
    wr = np.linspace(cfg.wini, cfg.wfin, cfg.lreal)
    return vm, tau, wr


def _solve(cfg):
    solver = EDSolver(cfg, np.zeros((cfg.nspin, cfg.nspin,
                                     cfg.norb, cfg.norb)))
    return solver, solver.solve(solver.init_bath())


def _oracle_h_and_ops(cfg, solver):
    from dmft_lanc_ed_tpu.bath import unpack_bath
    bath = unpack_bath(cfg, solver.init_bath())
    h = anderson_hamiltonian(cfg, np.zeros((cfg.nspin, cfg.nspin,
                                            cfg.norb, cfg.norb)),
                             np.asarray(bath.e), np.asarray(bath.v))
    # diagonal occupation operators per (orb, spin) over the full Fock basis
    states = np.arange(1 << (2 * cfg.ns))
    nops = {}
    for a in range(cfg.norb):
        n_up = ((states >> a) & 1).astype(float)
        n_dw = ((states >> (a + cfg.ns)) & 1).astype(float)
        nops[a] = (n_up, n_dw)
    return h, nops


@pytest.mark.parametrize("channel", ["spin", "dens"])
def test_chi_oracle_single_orbital(channel):
    """norb=1, nbath=2, finite T: lanc chi (0,0) vs full-Fock Lehmann."""
    beta = 10.0
    cfg = EDConfig(norb=1, nbath=2, uloc=(1.7,), beta=beta, lmats=16,
                   lreal=11, ltau=20, wini=-3.0, wfin=3.0,
                   ed_finite_temp=True, lanc_nstates_total=4096,
                   lanc_nstates_sector=4096, lanc_dim_threshold=4096,
                   chispin_flag=(channel == "spin"),
                   chidens_flag=(channel == "dens"), xmu=0.3)
    solver, res = _solve(cfg)
    h, nops = _oracle_h_and_ops(cfg, solver)
    n_up, n_dw = nops[0]
    op = 0.5 * (n_up - n_dw) if channel == "spin" else n_up + n_dw
    vm, tau, wr = _grids(cfg)
    ref_iv, ref_tau, ref_w = lehmann_chi_oracle(h, op, beta, vm, tau, wr,
                                                cfg.eps)
    chi = (res.chi_spin if channel == "spin" else res.chi_dens)[(0, 0)]
    np.testing.assert_allclose(chi.matsubara(beta, vm), ref_iv, atol=1e-8)
    np.testing.assert_allclose(chi.imtime(tau), ref_tau, atol=1e-8)
    np.testing.assert_allclose(chi.realaxis(beta, wr, cfg.eps), ref_w,
                               atol=1e-8)


def test_chi_oracle_two_orbital_mixed():
    """norb=2, nbath=1, Kanamori: mixed (a,b) and total channels vs oracle.

    Exercises the lanc path's algebraic recombination
    chi_ab = (chi_mix - chi_aa - chi_bb)/2 (ED_GF_CHISPIN.f90:217-430).
    """
    beta = 8.0
    cfg = EDConfig(norb=2, nbath=1, uloc=(1.5, 1.5), ust=0.7, jh=0.2,
                   jx=0.2, jp=0.2, beta=beta, lmats=12, lreal=9, ltau=16,
                   wini=-3.0, wfin=3.0, ed_finite_temp=True,
                   lanc_nstates_total=4096, lanc_nstates_sector=4096,
                   lanc_dim_threshold=4096, chispin_flag=True,
                   chidens_flag=True)
    solver, res = _solve(cfg)
    h, nops = _oracle_h_and_ops(cfg, solver)
    vm, tau, wr = _grids(cfg)

    sz = {a: 0.5 * (nops[a][0] - nops[a][1]) for a in range(2)}
    nn = {a: nops[a][0] + nops[a][1] for a in range(2)}
    for chis, ops in ((res.chi_spin, sz), (res.chi_dens, nn)):
        for key, op in [((0, 0), ops[0]), ((1, 1), ops[1]),
                        ((-1, -1), ops[0] + ops[1])]:
            ref_iv, ref_tau, ref_w = lehmann_chi_oracle(
                h, op, beta, vm, tau, wr, cfg.eps)
            chi = chis[key]
            np.testing.assert_allclose(chi.matsubara(beta, vm), ref_iv,
                                       atol=1e-8, err_msg=str(key))
            np.testing.assert_allclose(chi.imtime(tau), ref_tau, atol=1e-8,
                                       err_msg=str(key))
        # mixed channel: oracle via chi[(ab)] = (chi_tot - chi_aa - chi_bb)/2
        iv_t, tau_t, w_t = lehmann_chi_oracle(h, ops[0] + ops[1], beta, vm,
                                              tau, wr, cfg.eps)
        iv_a, tau_a, w_a = lehmann_chi_oracle(h, ops[0], beta, vm, tau, wr,
                                              cfg.eps)
        iv_b, tau_b, w_b = lehmann_chi_oracle(h, ops[1], beta, vm, tau, wr,
                                              cfg.eps)
        chi_ab = chis[(0, 1)]
        np.testing.assert_allclose(chi_ab.matsubara(beta, vm),
                                   0.5 * (iv_t - iv_a - iv_b), atol=1e-8)
        np.testing.assert_allclose(chi_ab.imtime(tau),
                                   0.5 * (tau_t - tau_a - tau_b), atol=1e-8)


def test_chi_full_ed_vs_lanc():
    """Full-ED chi twins agree with the Lanczos path on every grid."""
    beta = 6.0
    base = dict(norb=2, nbath=1, uloc=(1.2, 1.2), ust=0.5, jh=0.15,
                beta=beta, lmats=12, lreal=9, ltau=16, wini=-3.0, wfin=3.0,
                ed_finite_temp=True, lanc_nstates_total=4096,
                lanc_nstates_sector=4096, chispin_flag=True,
                chidens_flag=True)
    cfg_l = EDConfig(lanc_dim_threshold=4096, **base)
    cfg_f = EDConfig(ed_diag_type="full", **base)
    _, res_l = _solve(cfg_l)
    _, res_f = _solve(cfg_f)
    vm, tau, wr = _grids(cfg_l)
    for attr in ("chi_spin", "chi_dens"):
        chis_l, chis_f = getattr(res_l, attr), getattr(res_f, attr)
        assert set(chis_l.keys()) == set(chis_f.keys())
        for key in chis_l:
            np.testing.assert_allclose(
                chis_l[key].matsubara(beta, vm),
                chis_f[key].matsubara(beta, vm), atol=1e-8,
                err_msg=f"{attr}{key} iv")
            np.testing.assert_allclose(
                chis_l[key].imtime(tau), chis_f[key].imtime(tau),
                atol=1e-8, err_msg=f"{attr}{key} tau")
            np.testing.assert_allclose(
                chis_l[key].realaxis(beta, wr, cfg_l.eps),
                chis_f[key].realaxis(beta, wr, cfg_l.eps),
                atol=1e-8, err_msg=f"{attr}{key} realw")


def test_phonon_gf_full_ed_vs_lanc():
    """Full-ED displacement GF twin vs the Lanczos path."""
    beta = 20.0
    base = dict(norb=1, nbath=1, uloc=(1.0,), nph=3, g_ph=(0.4,),
                w0_ph=0.7, beta=beta, lmats=16, lreal=11, wini=0.0,
                wfin=3.0, ed_finite_temp=True, lanc_nstates_total=4096,
                lanc_nstates_sector=4096)
    cfg_l = EDConfig(lanc_dim_threshold=4096, **base)
    cfg_f = EDConfig(ed_diag_type="full", **base)
    _, res_l = _solve(cfg_l)
    _, res_f = _solve(cfg_f)
    vm, _, wr = _grids(cfg_l)
    np.testing.assert_allclose(res_l.gf_phonon.matsubara(beta, vm),
                               res_f.gf_phonon.matsubara(beta, vm),
                               atol=1e-8)
    np.testing.assert_allclose(res_l.gf_phonon.realaxis(beta, wr, cfg_l.eps),
                               res_f.gf_phonon.realaxis(beta, wr, cfg_l.eps),
                               atol=1e-8)
