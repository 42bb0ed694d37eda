"""End-to-end solver tests vs independent full-Fock Lehmann computation."""
import numpy as np
import jax.numpy as jnp
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.solver import EDSolver, matsubara_grid
from dmft_lanc_ed_tpu.bath import init_bath, pack_bath
from fock_oracle import anderson_hamiltonian, jw_ops


def oracle_solution(cfg, hloc, bath, gs_threshold=1e-9):
    """Exact T=0 diag + Lehmann GF over the full Fock space."""
    e_b = np.asarray(bath.e)
    v_b = np.asarray(bath.v)
    h = anderson_hamiltonian(cfg, hloc, e_b, v_b)
    w, v = np.linalg.eigh(h)
    e0 = w[0]
    gs_idx = np.where(np.abs(w - e0) <= gs_threshold)[0]
    cs = jw_ops(2 * cfg.ns)
    return h, w, v, gs_idx, cs


def oracle_gf(cfg, w, v, gs_idx, cs, iorb, z):
    """G_aa(z) by explicit Lehmann sum over T=0 ground states (spin up)."""
    g = np.zeros(len(z), dtype=np.complex128)
    ngs = len(gs_idx)
    cdag = cs[iorb].T
    c = cs[iorb]
    for i0 in gs_idx:
        psi0 = v[:, i0]
        e0 = w[i0]
        # particle addition
        amp = v.T @ (cdag @ psi0)
        g += ((amp ** 2)[None, :] / (z[:, None] - (w[None, :] - e0))).sum(-1) / ngs
        # particle removal
        amp = v.T @ (c @ psi0)
        g += ((amp ** 2)[None, :] / (z[:, None] + (w[None, :] - e0))).sum(-1) / ngs
    return g


@pytest.fixture(scope="module")
def small_problem():
    cfg = EDConfig(norb=1, nbath=3, uloc=(2.0,), beta=50.0, lmats=64,
                   lreal=50, wini=-3, wfin=3, lanc_dim_threshold=1024,
                   lanc_nstates_sector=2)
    hloc = np.zeros((1, 1, 1, 1))
    bath = init_bath(cfg)
    return cfg, hloc, bath


def test_ground_state_energy(small_problem):
    cfg, hloc, bath = small_problem
    solver = EDSolver(cfg, hloc)
    res = solver.solve(pack_bath(cfg, bath))
    _, w, _, gs_idx, _ = oracle_solution(cfg, hloc, bath)
    assert abs(res.observables.egs - w[0]) < 1e-9
    # ground-state degeneracy matches
    assert res.state_list.size == len(gs_idx)


def test_greens_function_vs_lehmann(small_problem):
    cfg, hloc, bath = small_problem
    solver = EDSolver(cfg, hloc)
    res = solver.solve(pack_bath(cfg, bath))
    h, w, v, gs_idx, cs = oracle_solution(cfg, hloc, bath)
    wm = matsubara_grid(cfg)
    z = 1j * wm
    g_oracle = oracle_gf(cfg, w, v, gs_idx, cs, 0, z)
    g_solver = res.g_mats[0, 0, 0, 0]
    np.testing.assert_allclose(g_solver, g_oracle, atol=5e-8)


def test_observables_vs_oracle(small_problem):
    cfg, hloc, bath = small_problem
    solver = EDSolver(cfg, hloc)
    res = solver.solve(pack_bath(cfg, bath))
    h, w, v, gs_idx, cs = oracle_solution(cfg, hloc, bath)
    ns = cfg.ns
    n_up = cs[0].T @ cs[0]
    n_dw = cs[ns].T @ cs[ns]
    dens = docc = 0.0
    for i0 in gs_idx:
        psi = v[:, i0]
        dens += psi @ ((n_up + n_dw) @ psi) / len(gs_idx)
        docc += psi @ (n_up @ n_dw @ psi) / len(gs_idx)
    assert abs(res.observables.dens[0] - dens) < 1e-8
    assert abs(res.observables.docc[0] - docc) < 1e-8
    # half filling at xmu=0 with hfmode
    assert abs(res.observables.dens[0] - 1.0) < 1e-8


def test_sigma_dyson_consistency(small_problem):
    cfg, hloc, bath = small_problem
    solver = EDSolver(cfg, hloc)
    res = solver.solve(pack_bath(cfg, bath))
    # Sigma should vanish as U->0
    cfg0 = cfg.replace(uloc=(0.0,))
    solver0 = EDSolver(cfg0, hloc)
    res0 = solver0.solve(pack_bath(cfg0, bath))
    assert np.abs(res0.sigma_mats).max() < 1e-6
    # and the U=2 sigma must carry the Hubbard-III high-frequency tail
    # Sigma ~ U^2/4 / (iw) at large w for half filling (hfmode)
    wm = matsubara_grid(cfg)
    tail = res.sigma_mats[0, 0, 0, 0, -1] * 1j * wm[-1]
    assert abs(tail.real - cfg.uloc[0] ** 2 / 4) / (cfg.uloc[0] ** 2 / 4) < 0.1


def test_lanczos_path_matches_dense_path(small_problem):
    """Dense (lanc_dim_threshold large) vs Krylov (threshold=1) paths agree —
    the reference's built-in dense-vs-sparse oracle (SURVEY.md §4.4)."""
    cfg, hloc, bath = small_problem
    res_dense = EDSolver(cfg, hloc).solve(pack_bath(cfg, bath))
    cfg_l = cfg.replace(lanc_dim_threshold=1)
    res_lanc = EDSolver(cfg_l, hloc).solve(pack_bath(cfg, bath))
    assert abs(res_dense.observables.egs - res_lanc.observables.egs) < 1e-9
    np.testing.assert_allclose(res_dense.g_mats[0, 0, 0, 0],
                               res_lanc.g_mats[0, 0, 0, 0], atol=1e-6)


def test_full_ed_matches_lanc_t0():
    """ED_DIAG_TYPE=full vs lanc cross-check (SURVEY.md §4.3) on a tiny system."""
    cfg = EDConfig(norb=1, nbath=2, uloc=(1.5,), beta=200.0, lmats=32,
                   lreal=20, ed_diag_type="full", ed_finite_temp=True,
                   lanc_nstates_total=4096)
    hloc = np.zeros((1, 1, 1, 1))
    bath = init_bath(cfg)
    res_full = EDSolver(cfg, hloc).solve(pack_bath(cfg, bath))
    cfg_l = cfg.replace(ed_diag_type="lanc", ed_finite_temp=False,
                        lanc_nstates_total=1)
    res_lanc = EDSolver(cfg_l, hloc).solve(pack_bath(cfg_l, bath))
    # at beta=200 the thermal state is the ground state
    np.testing.assert_allclose(res_full.g_mats[0, 0, 0, 0],
                               res_lanc.g_mats[0, 0, 0, 0], atol=1e-5)
    assert abs(res_full.observables.dens[0]
               - res_lanc.observables.dens[0]) < 1e-6


def test_gf_bucketed_matches_unbucketed():
    """pow2-bucketed GF/chi target ops (cold-compile control, gf.BucketedOp)
    change NOTHING numerically: zero-padded chains have identical
    tridiagonals (invariant pad subspace)."""
    cfg_off = EDConfig(norb=1, nbath=5, uloc=(2.0,), lanc_dim_threshold=16,
                       lmats=48, lreal=8, chispin_flag=True,
                       ed_gf_bucket="off")
    cfg_on = cfg_off.replace(ed_gf_bucket="on")
    hloc = np.zeros((1, 1, 1, 1))
    r_off = EDSolver(cfg_off, hloc).solve(
        pack_bath(cfg_off, init_bath(cfg_off)))
    r_on = EDSolver(cfg_on, hloc).solve(pack_bath(cfg_on, init_bath(cfg_on)))
    np.testing.assert_allclose(r_on.g_mats, r_off.g_mats, atol=1e-12)
    np.testing.assert_allclose(r_on.sigma_mats, r_off.sigma_mats, atol=1e-9)
    from dmft_lanc_ed_tpu.solver import bosonic_grid
    vm = bosonic_grid(cfg_off)
    x_off = r_off.chi_spin[(0, 0)].matsubara(cfg_off.beta, vm)
    x_on = r_on.chi_spin[(0, 0)].matsubara(cfg_on.beta, vm)
    np.testing.assert_allclose(x_on, x_off, atol=1e-12)


def test_gf_bucketed_phonon_sector():
    """Bucketing composes with phonon blocks ([P, dd, du] pad layout)."""
    cfg_off = EDConfig(norb=1, nbath=4, uloc=(2.0,), nph=2, g_ph=(0.3,),
                       w0_ph=1.0, lanc_dim_threshold=16, lmats=32, lreal=8,
                       ed_gf_bucket="off")
    cfg_on = cfg_off.replace(ed_gf_bucket="on")
    hloc = np.zeros((1, 1, 1, 1))
    r_off = EDSolver(cfg_off, hloc).solve(
        pack_bath(cfg_off, init_bath(cfg_off)))
    r_on = EDSolver(cfg_on, hloc).solve(pack_bath(cfg_on, init_bath(cfg_on)))
    np.testing.assert_allclose(r_on.g_mats, r_off.g_mats, atol=1e-12)
