"""Serial-vs-sharded FULL-SOLVE equality on the virtual 8-device CPU mesh.

The TPU analogue of the reference's serial-vs-MPI driver cross-checks
(SURVEY.md §4.2), now through the *production* path: cfg.mesh_shape drives
dw-sharded dense-backend solves inside diagonalize_impurity and the GF
batcher (ED_DIAG.f90:151-171 + ED_GF_NORMAL.f90:224-238 analogue).
"""
import jax
import numpy as np
import pytest

import dmft_lanc_ed_tpu as ed


def _solve(cfg, hloc=None):
    solver = ed.EDSolver(cfg, hloc=hloc)
    return solver.solve(solver.init_bath())


def test_full_solve_serial_vs_sharded():
    kw = dict(norb=1, nbath=6, uloc=(2.2,), lanc_dim_threshold=16,
              lmats=32, lreal=8)
    cfg_s = ed.read_input(None, **kw)
    cfg_p = cfg_s.replace(mesh_shape=(8,), ed_shard_min_dimdw=8)
    assert len(jax.devices()) >= 8
    rs = _solve(cfg_s)
    rp = _solve(cfg_p)
    assert abs(rs.state_list.emin - rp.state_list.emin) < 1e-12
    np.testing.assert_allclose(rp.g_mats, rs.g_mats, atol=1e-9)
    np.testing.assert_allclose(rp.sigma_mats, rs.sigma_mats, atol=1e-7)
    np.testing.assert_allclose(rp.observables.dens, rs.observables.dens,
                               atol=1e-12)
    np.testing.assert_allclose(rp.observables.docc, rs.observables.docc,
                               atol=1e-12)
    assert abs(rp.observables.epot - rs.observables.epot) < 1e-10


def test_full_solve_sharded_phonons():
    """Phonon sectors run the sharded path too (round 1 raised
    NotImplementedError here)."""
    kw = dict(norb=1, nbath=4, uloc=(2.0,), nph=2, g_ph=(0.35,), w0_ph=1.0,
              lanc_dim_threshold=16, lmats=32, lreal=8)
    cfg_s = ed.read_input(None, **kw)
    cfg_p = cfg_s.replace(mesh_shape=(4,), ed_shard_min_dimdw=4)
    rs = _solve(cfg_s)
    rp = _solve(cfg_p)
    assert abs(rs.state_list.emin - rp.state_list.emin) < 1e-12
    np.testing.assert_allclose(rp.g_mats, rs.g_mats, atol=1e-9)
    assert rp.gf_phonon is not None and rs.gf_phonon is not None


def test_sharded_mixed_precision():
    """Sharding composes with the mixed-precision MXU path + f64 polish."""
    kw = dict(norb=1, nbath=6, uloc=(2.2,), lanc_dim_threshold=16,
              lmats=32, lreal=8)
    cfg_s = ed.read_input(None, **kw)
    cfg_m = cfg_s.replace(mesh_shape=(8,), ed_shard_min_dimdw=8,
                          ed_backend="dense", ed_precision="mixed")
    rs = _solve(cfg_s)
    rm = _solve(cfg_m)
    assert abs(rs.state_list.emin - rm.state_list.emin) < 1e-9
    np.testing.assert_allclose(rm.observables.dens, rs.observables.dens,
                               atol=1e-6)


def test_sharded_jxjp_sector():
    """Non-local Jx/Jp tensor-product terms under sharding (the reference's
    allgather fallback, ED_HAMILTONIAN_SPARSE_HxV.f90:674-692)."""
    kw = dict(norb=2, nbath=2, uloc=(1.6, 1.6), ust=0.7, jh=0.15,
              jx=0.15, jp=0.15, lanc_dim_threshold=8, lmats=24, lreal=8)
    cfg_s = ed.read_input(None, **kw)
    cfg_p = cfg_s.replace(mesh_shape=(4,), ed_shard_min_dimdw=4)
    rs = _solve(cfg_s)
    rp = _solve(cfg_p)
    assert abs(rs.state_list.emin - rp.state_list.emin) < 1e-12
    np.testing.assert_allclose(rp.g_mats, rs.g_mats, atol=1e-8)
