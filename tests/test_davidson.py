"""Davidson eigensolver (lanc_method=dvdson): cross-validated against
thick-restart Lanczos and host LAPACK, incl. degenerate ground states
(sp_dvdson_eigh, ED_DIAG.f90:189-204)."""
import jax.numpy as jnp
import numpy as np
import pytest

import dmft_lanc_ed_tpu as ed
from dmft_lanc_ed_tpu.ops.davidson import davidson_ground_state, op_diag_flat
from dmft_lanc_ed_tpu.ops.lanczos import lanczos_ground_state
from dmft_lanc_ed_tpu.ops.matvec import matvec_flat


def _sector_h(norb=1, nbath=6, nup=3, ndw=3, seed=0, **kw):
    rng = np.random.default_rng(seed)
    cfg = ed.read_input(None, norb=norb, nbath=nbath,
                        uloc=(2.0,) * norb, **kw)
    from dmft_lanc_ed_tpu.bath import Bath
    bath = Bath(
        e=jnp.asarray(rng.normal(size=(1, norb, nbath))),
        v=jnp.asarray(rng.normal(size=(1, norb, nbath)) * 0.5))
    sec = ed.SectorTable(cfg).sector(ed.qn(nup, ndw))
    hloc = np.zeros((1, 1, norb, norb))
    h = ed.build_sector_hamiltonian(cfg, sec, hloc, bath)
    return cfg, sec, h


def test_davidson_matches_lapack_and_lanczos():
    cfg, sec, h = _sector_h()
    w_ref = np.linalg.eigvalsh(ed.dense_hamiltonian(h))
    e_dav, v_dav = davidson_ground_state(h, matvec_flat, sec.dim, 3,
                                         op_diag_flat(h), ncv=24, tol=1e-12)
    np.testing.assert_allclose(e_dav, w_ref[:3], atol=1e-9)
    e_lan, _ = lanczos_ground_state(h, matvec_flat, sec.dim, 3, ncv=24,
                                    tol=1e-12)
    np.testing.assert_allclose(e_dav, e_lan, atol=1e-9)
    # eigenvector residual
    for k in range(3):
        r = np.asarray(matvec_flat(h, jnp.asarray(v_dav[k]))) \
            - e_dav[k] * v_dav[k]
        assert np.linalg.norm(r) < 1e-8


def test_davidson_degenerate_ground_state():
    """Half-filled (3,4)/(4,3)-like degeneracy inside one sector: use a
    sector with an exactly degenerate doublet (spin-flip symmetric bath,
    nup != ndw gives degenerate twins — here force degeneracy via a
    symmetric two-orbital setup) and check Davidson resolves both states."""
    cfg, sec, h = _sector_h(norb=2, nbath=2, nup=2, ndw=2, seed=3,
                            jh=0.0, ust=2.0)
    w_ref = np.linalg.eigvalsh(ed.dense_hamiltonian(h))
    k = 4
    e_dav, v_dav = davidson_ground_state(h, matvec_flat, sec.dim, k,
                                         op_diag_flat(h), ncv=28, tol=1e-11)
    np.testing.assert_allclose(e_dav, w_ref[:k], atol=1e-8)
    # orthonormality of the returned set (degenerate pairs included)
    g = v_dav @ v_dav.T
    np.testing.assert_allclose(g, np.eye(k), atol=1e-7)


def test_davidson_phonon_diagonal():
    cfg, sec, h = _sector_h(norb=1, nbath=3, nup=2, ndw=2, seed=1,
                            nph=2, g_ph=(0.3,), w0_ph=0.8)
    w_ref = np.linalg.eigvalsh(ed.dense_hamiltonian(h))
    e_dav, _ = davidson_ground_state(h, matvec_flat, sec.dim, 2,
                                     op_diag_flat(h), ncv=24, tol=1e-11)
    np.testing.assert_allclose(e_dav, w_ref[:2], atol=1e-8)


def test_full_solve_dvdson_equals_arpack():
    """End-to-end: lanc_method=dvdson solve matches the thick-restart one."""
    kw = dict(norb=1, nbath=5, uloc=(2.0,), lmats=32, lreal=8,
              lanc_dim_threshold=16)
    cfg_a = ed.read_input(None, **kw)
    cfg_d = cfg_a.replace(lanc_method="dvdson")
    sa = ed.EDSolver(cfg_a)
    sd = ed.EDSolver(cfg_d)
    ra = sa.solve(sa.init_bath())
    rd = sd.solve(sd.init_bath())
    assert abs(ra.state_list.emin - rd.state_list.emin) < 1e-10
    np.testing.assert_allclose(rd.g_mats, ra.g_mats, atol=1e-8)
    np.testing.assert_allclose(rd.observables.dens, ra.observables.dens,
                               atol=1e-10)


def test_build_basis_fast_proj_orthogonality_and_accuracy():
    """fast_proj (f32-shadow CGS2 projections, ops/lanczos._build_basis_rr)
    keeps the basis orthogonal to ~the f32 floor and the polished Ritz
    pairs exact — the contract that lets the TPU bucket solver run its
    projections on the MXU."""
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.bath import Bath
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian, \
        dense_hamiltonian
    from dmft_lanc_ed_tpu.ops.dense import densify, matvec_dense_mixed
    from dmft_lanc_ed_tpu.ops.lanczos import (_build_basis_rr, _ritz,
                                              refine_eigenpairs)
    from dmft_lanc_ed_tpu.ops.dense import matvec_dense
    from dmft_lanc_ed_tpu.sectors import SectorTable, qn

    rng = np.random.default_rng(3)
    cfg = EDConfig(norb=1, nbath=6, uloc=(2.0,))
    sec = SectorTable(cfg).sector(qn(3, 3))
    h = build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)),
                                 Bath(e=jnp.asarray(rng.normal(
                                     size=(1, 1, 6))),
                                      v=jnp.asarray(rng.normal(
                                          size=(1, 1, 6)) * 0.5)))
    op = densify(h)
    m = 24
    v0 = jnp.asarray(rng.standard_normal((sec.dim_dw, sec.dim_up)))
    v0 = v0 / jnp.linalg.norm(v0)
    prefix = jnp.zeros((0, sec.dim_dw, sec.dim_up))
    theta0 = jnp.zeros((0,))
    res = _build_basis_rr(op, prefix, theta0, v0, m, 0, matvec_dense_mixed,
                          fast_proj=True)
    basis = np.asarray(res.v_basis).reshape(m, -1)
    gram = basis @ basis.T
    # orthogonality at the f32-projection floor
    assert np.abs(gram - np.eye(m)).max() < 1e-5
    theta, s = _ritz(np.asarray(res.t_mat), m)
    # Ritz ground state accurate to the mixed/f32 floor pre-polish...
    w = np.linalg.eigvalsh(dense_hamiltonian(h))
    assert abs(theta[0] - w[0]) < 1e-4 * max(1.0, abs(w[0]))
    # ...and pinned by the iterated f64 polish: one unrestarted m=24
    # basis leaves eta ~ 1e-2 and the steps=2 polish fixed point from such
    # a rough start is ~1e-9 relative — production reaches its 1e-10 gates
    # because its restarts first converge eta to the 3e-6 tolerance floor
    # (eta^2 ~ 1e-11), identical with or without fast_proj
    vecs = jnp.tensordot(jnp.asarray(s[:, :1]).T, res.v_basis, axes=1)
    for _ in range(6):
        vals, vecs = refine_eigenpairs(op, matvec_dense, vecs)
    assert abs(vals[0] - w[0]) < 1e-7 * max(1.0, abs(w[0]))
