"""Hamiltonian assembly vs the brute-force Fock oracle + matvec equivalence."""
import numpy as np
import jax.numpy as jnp
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.sectors import SectorTable, qn
from dmft_lanc_ed_tpu.bath import Bath, init_bath
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian, dense_hamiltonian
from dmft_lanc_ed_tpu.ops.matvec import apply_h, matvec_flat
from fock_oracle import sector_hamiltonian_oracle

RNG = np.random.default_rng(42)


def random_bath(cfg, seed=0):
    rng = np.random.default_rng(seed)
    norb_e = cfg.norb if cfg.bath_type == "normal" else 1
    e = rng.normal(size=(cfg.nspin, norb_e, cfg.nbath))
    v = rng.normal(size=(cfg.nspin, cfg.norb, cfg.nbath)) * 0.5
    return Bath(e=jnp.asarray(e), v=jnp.asarray(v))


def check_sector(cfg, hloc, bath, nup, ndw, hbath=None, h_basis=None):
    tab = SectorTable(cfg)
    sec = tab.sector(qn(nup, ndw))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath, h_basis=h_basis)
    dense = dense_hamiltonian(h)
    e_bath = np.asarray(bath.e) if bath.e is not None else None
    v_bath = np.asarray(bath.v) if bath.v is not None else None
    if h_basis is not None:
        from dmft_lanc_ed_tpu.bath import bath_levels
        e_b, v_b, hb = bath_levels(cfg, bath, h_basis)
        oracle = sector_hamiltonian_oracle(cfg, hloc, e_b, v_b, nup, ndw, hbath=hb)
    else:
        oracle = sector_hamiltonian_oracle(cfg, hloc, e_bath, v_bath, nup, ndw)
    assert dense.shape == oracle.shape
    np.testing.assert_allclose(dense, oracle, atol=1e-12)
    # hermiticity
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    return h, dense


def test_single_orbital_sector_h():
    cfg = EDConfig(norb=1, nbath=2, uloc=(2.3,), xmu=0.17)
    hloc = np.zeros((1, 1, 1, 1))
    bath = random_bath(cfg)
    for nup, ndw in [(1, 1), (2, 1), (0, 2), (3, 3), (0, 0)]:
        check_sector(cfg, hloc, bath, nup, ndw)


def test_single_orbital_no_hfmode():
    cfg = EDConfig(norb=1, nbath=2, uloc=(1.1,), hfmode=False, xmu=0.3)
    hloc = np.full((1, 1, 1, 1), 0.21)
    bath = random_bath(cfg, seed=3)
    check_sector(cfg, hloc, bath, 1, 2)


def test_two_orbital_kanamori_normal():
    cfg = EDConfig(norb=2, nbath=1, uloc=(2.0, 1.5), ust=0.8, jh=0.2,
                   xmu=0.05, bath_type="normal")
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.1, 0.3], [0.3, -0.2]])
    bath = random_bath(cfg, seed=5)
    for nup, ndw in [(1, 1), (2, 2), (2, 1), (3, 2)]:
        check_sector(cfg, hloc, bath, nup, ndw)


def test_two_orbital_jx_jp():
    cfg = EDConfig(norb=2, nbath=1, uloc=(2.0, 2.0), ust=0.7, jh=0.25,
                   jx=0.25, jp=0.25, bath_type="normal")
    hloc = np.zeros((1, 1, 2, 2))
    bath = random_bath(cfg, seed=7)
    for nup, ndw in [(2, 2), (1, 2), (2, 1), (1, 1), (3, 1)]:
        check_sector(cfg, hloc, bath, nup, ndw)


def test_hybrid_bath():
    cfg = EDConfig(norb=2, nbath=3, uloc=(1.4, 1.4), ust=0.5, jh=0.1,
                   bath_type="hybrid")
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.0, 0.15], [0.15, 0.1]])
    bath = random_bath(cfg, seed=9)
    check_sector(cfg, hloc, bath, 2, 2)
    check_sector(cfg, hloc, bath, 3, 1)


def test_nspin2_magnetic():
    cfg = EDConfig(norb=1, nbath=2, nspin=2, uloc=(1.9,))
    hloc = np.zeros((2, 2, 1, 1))
    hloc[0, 0, 0, 0] = 0.3
    hloc[1, 1, 0, 0] = -0.3
    bath = random_bath(cfg, seed=11)
    check_sector(cfg, hloc, bath, 2, 1)


def test_replica_bath():
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.0), ust=0.4, jh=0.1,
                   bath_type="replica")
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.2, 0.1], [0.1, -0.2]])
    # symmetry basis: identity + offdiag sigma_x (orbital space)
    h_basis = np.zeros((2, 1, 1, 2, 2))
    h_basis[0, 0, 0] = np.eye(2)
    h_basis[1, 0, 0] = np.array([[0.0, 1.0], [1.0, 0.0]])
    lam = np.array([[0.5, 0.3], [-0.4, 0.2]])
    v_rep = np.array([[0.6], [0.7]])
    bath = Bath(lam=jnp.asarray(lam), v_rep=jnp.asarray(v_rep))
    check_sector(cfg, hloc, bath, 2, 2, h_basis=h_basis)


def test_phonons_dense_oracle_consistency():
    """Phonon blocks: validate against explicit kron construction."""
    cfg = EDConfig(norb=1, nbath=1, uloc=(1.5,), nph=3, w0_ph=0.8,
                   g_ph=(0.4,))
    hloc = np.zeros((1, 1, 1, 1))
    bath = random_bath(cfg, seed=13)
    tab = SectorTable(cfg)
    sec = tab.sector(qn(1, 1))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    dense = dense_hamiltonian(h)
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    assert dense.shape[0] == sec.dim == 2 * 2 * (cfg.nph + 1)
    # electron block of ph=0 equals the nph=0 hamiltonian
    cfg0 = cfg.replace(nph=0)
    sec0 = SectorTable(cfg0).sector(qn(1, 1))
    h0 = build_sector_hamiltonian(cfg0, sec0, hloc, bath)
    d0 = dense_hamiltonian(h0)
    ne = d0.shape[0]
    block0 = dense[:ne, :ne]
    # subtract e-ph diagonal coupling? X[0,0]=0 so block0 == d0 exactly
    np.testing.assert_allclose(block0, d0, atol=1e-12)
    # phonon diagonal shift on block p: + p*w0
    block1 = dense[ne:2 * ne, ne:2 * ne]
    np.testing.assert_allclose(block1, d0 + cfg.w0_ph * np.eye(ne), atol=1e-12)
    # off-diagonal block couples via sqrt(p+1) * eph_el
    eph = np.diag(np.asarray(h.eph_el).reshape(-1))
    np.testing.assert_allclose(dense[:ne, ne:2 * ne], eph * 1.0, atol=1e-12)


def test_matvec_matches_dense():
    cfg = EDConfig(norb=2, nbath=1, uloc=(2.0, 2.0), ust=0.6, jh=0.15,
                   jx=0.15, jp=0.15)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.0, 0.2], [0.2, 0.0]])
    bath = random_bath(cfg, seed=21)
    tab = SectorTable(cfg)
    sec = tab.sector(qn(2, 1))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    dense = dense_hamiltonian(h)
    v = RNG.normal(size=sec.dim)
    got = np.asarray(matvec_flat(h, jnp.asarray(v)))
    np.testing.assert_allclose(got, dense @ v, atol=1e-12)


def test_matvec_matches_dense_phonons():
    cfg = EDConfig(norb=1, nbath=2, uloc=(1.0,), nph=2, w0_ph=0.5, g_ph=(0.3,))
    hloc = np.zeros((1, 1, 1, 1))
    bath = random_bath(cfg, seed=23)
    tab = SectorTable(cfg)
    sec = tab.sector(qn(1, 2))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    dense = dense_hamiltonian(h)
    v = RNG.normal(size=sec.dim)
    got = np.asarray(matvec_flat(h, jnp.asarray(v)))
    np.testing.assert_allclose(got, dense @ v, atol=1e-12)


def test_eigenvalues_match_oracle():
    cfg = EDConfig(norb=1, nbath=3, uloc=(2.0,))
    hloc = np.zeros((1, 1, 1, 1))
    bath = init_bath(cfg)
    h, dense = check_sector(cfg, hloc, bath, 2, 2)
    w = np.linalg.eigvalsh(dense)
    assert w.shape[0] == 6 * 6
