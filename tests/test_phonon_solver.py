"""Solver-level phonon (Holstein) and hybrid-bath cross-checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.solver import EDSolver
from dmft_lanc_ed_tpu.bath import init_bath, pack_bath


def test_holstein_lanc_vs_full():
    """Electron-phonon impurity: Krylov path vs full-ED path."""
    cfg_l = EDConfig(norb=1, nbath=1, uloc=(1.0,), nph=3, g_ph=(0.4,),
                     w0_ph=0.7, beta=100.0, lmats=64, lreal=20,
                     lanc_dim_threshold=4096)
    hloc = np.zeros((1, 1, 1, 1))
    solver = EDSolver(cfg_l, hloc)
    bath = solver.init_bath()
    res_l = solver.solve(bath)
    cfg_f = cfg_l.replace(ed_diag_type="full", ed_finite_temp=True,
                          lanc_nstates_total=4096)
    res_f = EDSolver(cfg_f, hloc).solve(bath)
    assert abs(res_l.observables.egs - res_f.observables.egs) < 1e-9
    assert abs(res_l.observables.dens[0] - res_f.observables.dens[0]) < 1e-6
    np.testing.assert_allclose(res_l.g_mats[0, 0, 0, 0],
                               res_f.g_mats[0, 0, 0, 0], atol=1e-5)
    # phonon observables present and sane
    assert res_l.observables.ph_occ is not None
    assert abs(res_l.observables.ph_occ.sum() - 1.0) < 1e-8
    assert res_l.gf_phonon is not None
    # displacement PDF normalized on the grid
    dx = res_l.observables.x_grid[1] - res_l.observables.x_grid[0]
    norm = res_l.observables.x_prob.sum() * dx
    assert abs(norm - 1.0) < 0.05       # finite grid window


def test_phonon_softening_shifts_D():
    """The displacement propagator must peak near w0 for weak coupling."""
    cfg = EDConfig(norb=1, nbath=1, uloc=(0.5,), nph=6, g_ph=(0.15,),
                   w0_ph=1.0, beta=100.0, lmats=64, lreal=200,
                   wini=0.0, wfin=3.0, lanc_dim_threshold=4096)
    solver = EDSolver(cfg, np.zeros((1, 1, 1, 1)))
    res = solver.solve(solver.init_bath())
    wr = np.linspace(cfg.wini, cfg.wfin, cfg.lreal)
    d_imag = (-res.gf_phonon.realaxis(cfg.beta, wr, 0.05)).imag
    peak = wr[np.argmax(np.abs(d_imag))]
    assert abs(peak - cfg.w0_ph) < 0.25


def test_hybrid_offdiag_gf_vs_full():
    """Hybrid bath: off-diagonal GF channels, Krylov vs full-ED."""
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.0), ust=0.4,
                   bath_type="hybrid", beta=100.0, lmats=48, lreal=16,
                   lanc_dim_threshold=4096)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.1, 0.2], [0.2, -0.1]])
    solver = EDSolver(cfg, hloc)
    bath = solver.init_bath()
    res_l = solver.solve(bath)
    cfg_f = cfg.replace(ed_diag_type="full", ed_finite_temp=True,
                        lanc_nstates_total=100000)
    res_f = EDSolver(cfg_f, hloc).solve(bath)
    assert abs(res_l.observables.egs - res_f.observables.egs) < 1e-9
    for a in range(2):
        np.testing.assert_allclose(res_l.g_mats[0, 0, a, a],
                                   res_f.g_mats[0, 0, a, a], atol=1e-5)
    # off-diagonal channel: mixed-operator Krylov vs exact Lehmann
    np.testing.assert_allclose(res_l.g_mats[0, 0, 0, 1],
                               res_f.g_mats[0, 0, 0, 1], atol=1e-5)
