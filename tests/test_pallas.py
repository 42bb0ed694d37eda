"""Fused Pallas dense-factor matvec kernel (interpret mode on CPU) and its
factory dispatch. Device parity with the XLA path is covered by bench.py and
the TPU verification drive; here the kernel math is validated against the
ELL backend and the full-Fock oracle discipline of the suite."""
import jax.numpy as jnp
import numpy as np
import pytest

from dmft_lanc_ed_tpu.bath import Bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.ops.pallas_matvec import (PallasSectorOp,
                                                build_pallas_dense_op,
                                                matvec_pallas,
                                                matvec_pallas_exact_flat,
                                                pallas_applicable)

RNG = np.random.default_rng(5)


def _h(cfg, sqn, seed=0):
    from dmft_lanc_ed_tpu.sectors import SectorTable
    rng = np.random.default_rng(seed)
    bath = Bath(
        e=jnp.asarray(rng.normal(size=(1, cfg.norb, cfg.nbath))),
        v=jnp.asarray(rng.normal(size=(1, cfg.norb, cfg.nbath)) * 0.5))
    sec = SectorTable(cfg).sector(sqn)
    hloc = np.zeros((1, 1, cfg.norb, cfg.norb))
    return sec, build_sector_hamiltonian(cfg, sec, hloc, bath)


@pytest.mark.parametrize("sqn", [((3,), (3,)), ((2,), (4,))])
def test_pallas_fused_matches_xla(sqn):
    cfg = EDConfig(norb=1, nbath=5, uloc=(1.8,))
    sec, h = _h(cfg, sqn)
    assert pallas_applicable(h)
    op = build_pallas_dense_op(h)
    v = jnp.asarray(RNG.normal(size=(sec.dim_dw, sec.dim_up)))
    y_ref = np.asarray(apply_h(h, v))
    y_pal = np.asarray(matvec_pallas(op, v, interpret=True))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-5 * scale)
    # the exact f64 apply over the same factors matches to f64
    y_exact = np.asarray(
        matvec_pallas_exact_flat(op, v.reshape(-1))).reshape(y_ref.shape)
    np.testing.assert_allclose(y_exact, y_ref, atol=1e-12 * scale)


def test_pallas_two_orbitals():
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.5), ust=0.3, jh=0.05)
    sec, h = _h(cfg, ((3,), (2,)), seed=3)
    op = build_pallas_dense_op(h)
    v = jnp.asarray(RNG.normal(size=(sec.dim_dw, sec.dim_up)))
    y_ref = np.asarray(apply_h(h, v))
    y_pal = np.asarray(matvec_pallas(op, v, interpret=True))
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-5 * np.abs(y_ref).max())


def test_pallas_applicability_gates():
    # Jx/Jp sectors are not covered by the fused kernel
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.0), ust=0.5, jh=0.1,
                   jx=0.1, jp=0.1)
    _, h = _h(cfg, ((3,), (3,)), seed=1)
    assert not pallas_applicable(h)
    # phonon sectors neither
    cfg = EDConfig(norb=1, nbath=3, uloc=(1.0,), nph=2, g_ph=(0.2,),
                   w0_ph=0.5)
    _, h = _h(cfg, ((2,), (2,)), seed=1)
    assert not pallas_applicable(h)


def test_factory_pallas_dispatch_and_fallback(caplog):
    """ed_backend=pallas dispatches the fused op, and falls back (loudly)
    to dense for unsupported sectors."""
    from dmft_lanc_ed_tpu.ops.dense import DenseSectorOp
    from dmft_lanc_ed_tpu.ops.factory import make_sector_op
    from dmft_lanc_ed_tpu.sectors import SectorTable
    from dmft_lanc_ed_tpu.bath import init_bath

    cfg = EDConfig(norb=1, nbath=4, uloc=(2.0,), ed_backend="pallas")
    table = SectorTable(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    op, apply_fn = make_sector_op(cfg, table.sector(((2,), (2,))), hloc, bath)
    assert isinstance(op, PallasSectorOp)

    cfg2 = EDConfig(norb=1, nbath=3, uloc=(2.0,), nph=1, g_ph=(0.2,),
                    w0_ph=0.5, ed_backend="pallas")
    table2 = SectorTable(cfg2)
    bath2 = init_bath(cfg2)
    import logging
    with caplog.at_level(logging.WARNING, logger="dmft_lanc_ed_tpu"):
        op2, _ = make_sector_op(cfg2, table2.sector(((2,), (2,))), hloc,
                                bath2)
    assert isinstance(op2, DenseSectorOp)
    assert any("falling back to dense" in r.message for r in caplog.records)
