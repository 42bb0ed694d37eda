"""Pallas matvec kernel correctness (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.sectors import SectorTable, qn
from dmft_lanc_ed_tpu.bath import Bath
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.ops.pallas_matvec import (build_pallas_op,
                                                matvec_pallas, ell_to_runs,
                                                _encode_runs)

RNG = np.random.default_rng(5)


def _h(cfg, sqn, seed=0):
    rng = np.random.default_rng(seed)
    bath = Bath(
        e=jnp.asarray(rng.normal(size=(1, cfg.norb, cfg.nbath))),
        v=jnp.asarray(rng.normal(size=(1, cfg.norb, cfg.nbath)) * 0.5))
    sec = SectorTable(cfg).sector(sqn)
    hloc = np.zeros((1, 1, cfg.norb, cfg.norb))
    return sec, build_sector_hamiltonian(cfg, sec, hloc, bath)


def test_runs_cover_all_entries():
    cfg = EDConfig(norb=1, nbath=5, uloc=(1.0,))
    sec, h = _h(cfg, qn(3, 3))
    runs = _encode_runs(np.asarray(h.dw_cols), np.asarray(h.dw_vals))
    total = sum(r[2] for r in runs)
    nnz = int((np.asarray(h.dw_vals) != 0).sum())
    assert total == nnz
    # reconstruct the dense factor from runs
    dd = sec.dim_dw
    dense = np.zeros((dd, dd))
    for d0, s0, L, v in runs:
        for i in range(L):
            dense[d0 + i, s0 + i] += v
    ref = np.zeros((dd, dd))
    cols = np.asarray(h.dw_cols)
    vals = np.asarray(h.dw_vals)
    for k in range(cols.shape[1]):
        np.add.at(ref, (np.arange(dd), cols[:, k]), vals[:, k])
    np.testing.assert_allclose(dense, ref)


@pytest.mark.parametrize("sqn", [((3,), (3,)), ((2,), (4,))])
def test_pallas_matvec_matches_xla(sqn):
    cfg = EDConfig(norb=1, nbath=5, uloc=(1.8,), ed_dtype="float32")
    sec, h = _h(cfg, sqn)
    op = build_pallas_op(h)
    v = RNG.normal(size=(sec.dim_dw, sec.dim_up)).astype(np.float32)
    y_ref = np.asarray(apply_h(h, jnp.asarray(v, jnp.float64)))
    y_pal = np.asarray(matvec_pallas(op, jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(y_pal, y_ref, atol=2e-5)


def test_pallas_matvec_two_orbitals():
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.5), ust=0.3, jh=0.05,
                   ed_dtype="float32")
    sec, h = _h(cfg, qn(3, 2), seed=3)
    op = build_pallas_op(h)
    v = RNG.normal(size=(sec.dim_dw, sec.dim_up)).astype(np.float32)
    y_ref = np.asarray(apply_h(h, jnp.asarray(v, jnp.float64)))
    y_pal = np.asarray(matvec_pallas(op, jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(y_pal, y_ref, atol=2e-5)
