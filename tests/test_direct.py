"""Stored vs matrix-free (direct) backend cross-check — the reference's
ED_SPARSE_H oracle (SURVEY.md §4.5) — plus Hloc decomposition tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.sectors import SectorTable, qn
from dmft_lanc_ed_tpu.bath import Bath
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.ops.direct import build_direct_op, apply_direct
from dmft_lanc_ed_tpu.hloc import decompose_hloc, h_from_sym, validate_basis

RNG = np.random.default_rng(11)


def _setup(cfg, sqn, seed=0, hloc=None):
    rng = np.random.default_rng(seed)
    norb_e = cfg.norb if cfg.bath_type == "normal" else 1
    bath = Bath(
        e=jnp.asarray(rng.normal(size=(cfg.nspin, norb_e, cfg.nbath))),
        v=jnp.asarray(rng.normal(size=(cfg.nspin, cfg.norb, cfg.nbath)) * .5))
    sec = SectorTable(cfg).sector(sqn)
    if hloc is None:
        hloc = rng.normal(size=(cfg.nspin, cfg.nspin, cfg.norb, cfg.norb)) * .2
        hloc = (hloc + hloc.transpose(0, 1, 3, 2)) / 2
    return sec, hloc, bath


@pytest.mark.parametrize("cfg,sqn", [
    (EDConfig(norb=1, nbath=4, uloc=(2.1,), xmu=0.1), ((2,), (3,))),
    (EDConfig(norb=2, nbath=2, uloc=(1.5, 1.0), ust=0.4, jh=0.1), ((3,), (2,))),
    (EDConfig(norb=2, nbath=3, uloc=(1.0, 1.0), bath_type="hybrid"),
     ((2,), (2,))),
])
def test_direct_matches_stored(cfg, sqn):
    sec, hloc, bath = _setup(cfg, sqn)
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    op = build_direct_op(cfg, sec, hloc, bath)
    v = RNG.normal(size=(sec.dim_dw, sec.dim_up))
    y_stored = np.asarray(apply_h(h, jnp.asarray(v)))
    y_direct = np.asarray(apply_direct(op, jnp.asarray(v)))
    np.testing.assert_allclose(y_direct, y_stored, atol=1e-12)


def test_direct_replica():
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.0), bath_type="replica")
    sec = SectorTable(cfg).sector(qn(2, 2))
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.2, 0.1], [0.1, -0.2]])
    h_basis, lam_imp = decompose_hloc(cfg, hloc)
    lam = np.stack([lam_imp * 0.7, lam_imp * 1.2])
    bath = Bath(lam=jnp.asarray(lam),
                v_rep=jnp.asarray(np.array([[0.5], [0.6]])))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath, h_basis=h_basis)
    op = build_direct_op(cfg, sec, hloc, bath, h_basis=h_basis)
    v = RNG.normal(size=(sec.dim_dw, sec.dim_up))
    np.testing.assert_allclose(np.asarray(apply_direct(op, jnp.asarray(v))),
                               np.asarray(apply_h(h, jnp.asarray(v))),
                               atol=1e-12)


def test_hloc_decomposition_roundtrip():
    cfg = EDConfig(norb=2, nbath=1, uloc=(1.0, 1.0), nspin=2)
    rng = np.random.default_rng(3)
    h = rng.normal(size=(2, 2, 2, 2)) * 0.5
    # make it symmetric in the spin-orbital matrix sense
    from dmft_lanc_ed_tpu.hloc import nn2so, so2nn
    hso = nn2so(h, 2, 2)
    hso = (hso + hso.T) / 2
    h = so2nn(hso, 2, 2)
    basis, lam = decompose_hloc(cfg, h)
    validate_basis(cfg, basis)
    np.testing.assert_allclose(h_from_sym(basis, lam), h, atol=1e-12)


def test_direct_matches_stored_nonlocal():
    """Jx/Jp tensor-product terms, direct vs stored (HxV_non_local oracle)."""
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.5, 1.0), ust=0.4, jh=0.15,
                   jx=0.15, jp=0.15)
    sec, hloc, bath = _setup(cfg, ((3,), (2,)), seed=5)
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    op = build_direct_op(cfg, sec, hloc, bath)
    v = RNG.normal(size=(sec.dim_dw, sec.dim_up))
    np.testing.assert_allclose(np.asarray(apply_direct(op, jnp.asarray(v))),
                               np.asarray(apply_h(h, jnp.asarray(v))),
                               atol=1e-12)


def test_direct_matches_stored_phonon():
    """Phonon blocks + e-ph coupling, direct vs stored (HxV_eph oracle)."""
    cfg = EDConfig(norb=1, nbath=3, uloc=(2.0,), nph=3, w0_ph=0.7,
                   g_ph=(0.3,), xmu=0.2)
    sec, hloc, bath = _setup(cfg, ((2,), (2,)), seed=7)
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    op = build_direct_op(cfg, sec, hloc, bath)
    v = RNG.normal(size=(cfg.dim_ph, sec.dim_dw, sec.dim_up))
    np.testing.assert_allclose(np.asarray(apply_direct(op, jnp.asarray(v))),
                               np.asarray(apply_h(h, jnp.asarray(v))),
                               atol=1e-12)


def test_direct_backend_orbital_resolved():
    """ed_total_ud=F direct backend == stored on a per-orbital sector and
    end-to-end (ED_HAMILTONIAN_DIRECT_HxV.f90:96-178 + direct/Orbs)."""
    import numpy as np
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.sectors import SectorTable
    from dmft_lanc_ed_tpu.bath import init_bath, pack_bath
    from dmft_lanc_ed_tpu.hamiltonian import (build_sector_hamiltonian,
                                              dense_hamiltonian)
    from dmft_lanc_ed_tpu.ops.direct import (build_direct_op,
                                             matvec_direct_flat)
    from dmft_lanc_ed_tpu.solver import EDSolver

    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.1, -0.1])
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.4, 1.4), ust=0.6, jh=0.15,
                   ed_total_ud=False, beta=50.0, lmats=32, lreal=8,
                   lanc_dim_threshold=8)
    table = SectorTable(cfg)
    bath = init_bath(cfg)
    rng = np.random.default_rng(0)
    for sqn in [((2, 1), (1, 2)), ((1, 1), (1, 1)), ((2, 0), (0, 2))]:
        sec = table.sector(sqn)
        dense = dense_hamiltonian(build_sector_hamiltonian(cfg, sec, hloc,
                                                           bath))
        op = build_direct_op(cfg, sec, hloc, bath)
        v = rng.standard_normal(sec.dim)
        y = np.asarray(matvec_direct_flat(op, jnp.asarray(v)))
        np.testing.assert_allclose(y, dense @ v, atol=1e-12, err_msg=str(sqn))

    # end-to-end: orbital-resolved direct solve == stored solve
    b = pack_bath(cfg, bath)
    res_dir = EDSolver(cfg.replace(ed_backend="direct"), hloc).solve(b)
    res_ell = EDSolver(cfg.replace(ed_backend="ell"), hloc).solve(b)
    assert abs(res_dir.observables.egs - res_ell.observables.egs) < 1e-9
    np.testing.assert_allclose(res_dir.observables.dens,
                               res_ell.observables.dens, atol=1e-8)
    for a in range(2):
        np.testing.assert_allclose(res_dir.g_mats[0, 0, a, a],
                                   res_ell.g_mats[0, 0, a, a], atol=1e-6)


def test_total_ud_false_rejects_jx_jp():
    import pytest
    from dmft_lanc_ed_tpu.config import EDConfig
    with pytest.raises(ValueError):
        EDConfig(norb=2, nbath=1, uloc=(1.0, 1.0), jx=0.1,
                 ed_total_ud=False)
