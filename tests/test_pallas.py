"""Band-sparse fused Pallas kernel (interpret mode on CPU) and its factory
dispatch. Device parity with the XLA path is covered by bench.py and the TPU
verification drive; here the kernel math (RCM permutation, banded dw slabs,
fused diagonal, padded-f32 chain semantics) is validated against the ELL
backend and the exact f64 factor apply."""
import jax.numpy as jnp
import numpy as np
import pytest

from dmft_lanc_ed_tpu.bath import Bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.blocksparse import (BlockSparseSectorOp,
                                              blocksparse_applicable,
                                              build_blocksparse_op,
                                              chain_step, from_padded,
                                              matvec_bs_exact_flat,
                                              matvec_bs_padded, to_padded)
from dmft_lanc_ed_tpu.ops.matvec import apply_h

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
def test_blocksparse_kernel_matches_xla(sqn):
    cfg = EDConfig(norb=1, nbath=5, uloc=(1.8,))
    sec, h = _h(cfg, sqn)
    assert blocksparse_applicable(h)
    op = build_blocksparse_op(h)
    v = jnp.asarray(RNG.normal(size=(sec.dim_dw, sec.dim_up)))
    y_ref = np.asarray(apply_h(h, v))
    vp = to_padded(op, v)
    yp = matvec_bs_padded(op, vp, interpret=True)
    y_k = np.asarray(from_padded(op, yp))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_k, y_ref, atol=1e-5 * scale)
    # padded rows/cols stay exactly zero (chain invariant)
    ddp, dup = op.padded_shape
    assert float(np.abs(np.asarray(yp)[sec.dim_dw:, :]).max(initial=0)) == 0
    assert float(np.abs(np.asarray(yp)[:, sec.dim_up:]).max(initial=0)) == 0
    # the exact f64 apply over the natural-order factors matches to f64
    y_exact = np.asarray(
        matvec_bs_exact_flat(op, v.reshape(-1))).reshape(y_ref.shape)
    np.testing.assert_allclose(y_exact, y_ref, atol=1e-12 * scale)
    # static-runs kernel == grid kernel to f32 grouping tolerance, and the
    # runs stash exists + is applicable at these sizes
    from dmft_lanc_ed_tpu.ops.blocksparse import (_matvec_padded_pop,
                                                  _matvec_padded_runs,
                                                  _runs_applicable)
    assert getattr(op.pop, "_trim_runs", None) is not None
    assert _runs_applicable(op.pop)
    runs = op.pop._trim_runs
    y_runs, ss_runs = _matvec_padded_runs(op.pop, vp, jnp.float32(1.0),
                                          runs[0], runs[1], interpret=True)
    y_grid, ss_grid = _matvec_padded_pop(op.pop, vp, jnp.float32(1.0),
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(y_runs), np.asarray(y_grid),
                               atol=1e-5 * scale)
    assert abs(float(np.sum(np.asarray(ss_runs)))
               - float(np.sum(np.asarray(ss_grid)))) < 1e-4 * scale


def test_blocksparse_two_orbitals():
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.5), ust=0.3, jh=0.05)
    sec, h = _h(cfg, ((3,), (2,)), seed=3)
    op = build_blocksparse_op(h)
    v = jnp.asarray(RNG.normal(size=(sec.dim_dw, sec.dim_up)))
    y_ref = np.asarray(apply_h(h, v))
    y_k = np.asarray(from_padded(
        op, matvec_bs_padded(op, to_padded(op, v), interpret=True)))
    np.testing.assert_allclose(y_k, y_ref, atol=1e-5 * np.abs(y_ref).max())


def test_blocksparse_chain_step_normalizes():
    """The fused chain step y = inv_norm * H v returns rsqrt(|y|^2) that
    matches 1/|y| — a power-iteration chain needs no extra HBM pass."""
    cfg = EDConfig(norb=1, nbath=6, uloc=(2.0,))
    sec, h = _h(cfg, ((3,), (4,)), seed=2)
    op = build_blocksparse_op(h)
    v = jnp.asarray(RNG.normal(size=(sec.dim_dw, sec.dim_up)))
    vp = to_padded(op, v / jnp.linalg.norm(v))
    y1, r1 = chain_step(op, vp, jnp.float32(1.0), interpret=True)
    np.testing.assert_allclose(float(r1), 1.0 / float(jnp.linalg.norm(y1)),
                               rtol=1e-5)
    # y2 = r1 * H y1 == H (r1 * y1) == H applied to the normalized y1
    y2, r2 = chain_step(op, y1, r1, interpret=True)
    y_ref = matvec_bs_padded(op, y1 * r1, interpret=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref), atol=1e-6)


def test_blocksparse_applicability_gates():
    # Jx/Jp sectors are not covered by the fused kernel
    cfg = EDConfig(norb=2, nbath=2, uloc=(1.0, 1.0), ust=0.5, jh=0.1,
                   jx=0.1, jp=0.1)
    _, h = _h(cfg, ((3,), (3,)), seed=1)
    assert not blocksparse_applicable(h)
    # phonon sectors neither
    cfg = EDConfig(norb=1, nbath=3, uloc=(1.0,), nph=2, g_ph=(0.2,),
                   w0_ph=0.5)
    _, h = _h(cfg, ((2,), (2,)), seed=1)
    assert not blocksparse_applicable(h)


def test_factory_pallas_dispatch_and_fallback(caplog):
    """ed_backend=pallas dispatches the band-sparse op, and falls back
    (loudly) to dense for unsupported sectors."""
    from dmft_lanc_ed_tpu.ops.dense import DenseSectorOp
    from dmft_lanc_ed_tpu.ops.factory import make_sector_op
    from dmft_lanc_ed_tpu.sectors import SectorTable
    from dmft_lanc_ed_tpu.bath import init_bath

    cfg = EDConfig(norb=1, nbath=4, uloc=(2.0,), ed_backend="pallas")
    table = SectorTable(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    op, apply_fn = make_sector_op(cfg, table.sector(((2,), (2,))), hloc, bath)
    assert isinstance(op, BlockSparseSectorOp)

    cfg2 = EDConfig(norb=1, nbath=3, uloc=(2.0,), nph=1, g_ph=(0.2,),
                    w0_ph=0.5, ed_backend="pallas")
    table2 = SectorTable(cfg2)
    bath2 = init_bath(cfg2)
    import logging
    with caplog.at_level(logging.WARNING, logger="dmft_lanc_ed_tpu"):
        op2, _ = make_sector_op(cfg2, table2.sector(((2,), (2,))), hloc,
                                bath2)
    assert isinstance(op2, DenseSectorOp)
    assert any("falling back" in r.message for r in caplog.records)


def test_blocksparse_ground_state_exact_path():
    """lanczos_ground_state over the op's exact f64 apply matches the dense
    backend to 1e-10 — validates the natural-order factor algebra the
    Rayleigh-Ritz polish relies on. (The compiled-kernel accuracy gate runs
    on the real chip in bench.py; CPU only supports interpret mode.)"""
    from dmft_lanc_ed_tpu.ops.lanczos import lanczos_ground_state
    from dmft_lanc_ed_tpu.ops.dense import densify, matvec_dense_flat
    cfg = EDConfig(norb=1, nbath=6, uloc=(2.0,))
    sec, h = _h(cfg, ((3,), (3,)), seed=4)
    op = build_blocksparse_op(h)
    dop = densify(h)
    e_ref, _ = lanczos_ground_state(dop, matvec_dense_flat, sec.dim, 1,
                                    ncv=32, tol=1e-12)
    e_bs, _ = lanczos_ground_state(op, matvec_bs_exact_flat, sec.dim, 1,
                                   ncv=32, tol=1e-12)
    np.testing.assert_allclose(e_bs[0], e_ref[0], atol=1e-10)


def test_full_solve_pallas_backend_matches_dense():
    """End-to-end ed_backend=pallas solve (f32 padded chain + f64 polish,
    interpreter-mode kernel on CPU) matches the dense backend."""
    import dmft_lanc_ed_tpu as ed
    kw = dict(norb=1, nbath=4, uloc=(2.0,), lmats=24, lreal=8,
              lanc_dim_threshold=8)
    cfg_d = ed.read_input(None, **kw)
    cfg_p = cfg_d.replace(ed_backend="pallas", ed_batch_sectors=False)
    sd = ed.EDSolver(cfg_d)
    sp = ed.EDSolver(cfg_p)
    rd = sd.solve(sd.init_bath())
    rp = sp.solve(sp.init_bath())
    assert abs(rd.state_list.emin - rp.state_list.emin) < 1e-9
    np.testing.assert_allclose(rp.observables.dens, rd.observables.dens,
                               atol=1e-7)
    # GF chains run through the f32 kernel: ~1e-6 relative on the tridiag
    # coefficients (the mixed-precision contract for spectra, not energies)
    np.testing.assert_allclose(rp.g_mats, rd.g_mats, atol=1e-4)
