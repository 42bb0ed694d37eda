"""Fused chain-in-kernel tests (ops/bs_chain.py) — CPU interpret mode.

Covers the round-3 chain kernels against independent oracles:
- fused tridiag chain vs the f64 plain Lanczos recurrence on the exact
  natural-order apply (same similarity-transformed operator, same start),
- Chebyshev filter seed quality vs dense eigh,
- the production two-stage blocksparse ground state through the fused path,
- breakdown (invariant subspace) handling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dmft_lanc_ed_tpu as ed
from dmft_lanc_ed_tpu.ops.blocksparse import (blocksparse_applicable,
                                              build_blocksparse_op,
                                              matvec_bs_exact_flat,
                                              to_padded)
from dmft_lanc_ed_tpu.ops.bs_chain import (chain_applicable, cheb_chain,
                                           ground_state_seed, tridiag_chain)
from dmft_lanc_ed_tpu.ops.lanczos import lanczos_tridiag


def _sector_op(norb=1, nbath=6, nup=3, ndw=3, uloc=2.0):
    cfg = ed.read_input(None, norb=norb, nbath=nbath,
                        uloc=(uloc,) * norb)
    bath = ed.init_bath(cfg)
    sec = ed.SectorTable(cfg).sector(ed.qn(nup, ndw))
    h = ed.build_sector_hamiltonian(cfg, sec,
                                    np.zeros((norb,) * 4), bath)
    assert blocksparse_applicable(h)
    return cfg, sec, h, build_blocksparse_op(h)


def test_chain_applicable_gate():
    _, _, _, op = _sector_op()
    assert chain_applicable(op)


def test_tridiag_chain_matches_f64_oracle():
    _, _, h, op = _sector_op()
    v0n = jax.random.normal(jax.random.PRNGKey(3),
                            (op.dim_dw, op.dim_up), jnp.float64)
    v0n = v0n / jnp.linalg.norm(v0n)
    m = 16
    al, be, bout = tridiag_chain(op, to_padded(op, v0n), m)
    alr, ber = lanczos_tridiag(op, v0n.reshape(-1), m, matvec_bs_exact_flat)
    # split-bf16 kernel contract: ~1.5e-5 relative per matvec
    scale = max(1.0, float(np.max(np.abs(np.asarray(alr)))))
    assert np.max(np.abs(al - np.asarray(alr))) < 5e-4 * scale
    assert np.max(np.abs(be - np.asarray(ber))) < 5e-4 * scale
    assert bout > 0.0


def test_cheb_chain_amplifies_ground_state():
    _, _, h, op = _sector_op()
    dense = ed.dense_hamiltonian(h)
    w, v = np.linalg.eigh(dense)
    v0n = jax.random.normal(jax.random.PRNGKey(5),
                            (op.dim_dw, op.dim_up), jnp.float64)
    v0n = v0n / jnp.linalg.norm(v0n)
    vp = to_padded(op, v0n)
    b = float(w[-1]) + 0.05 * (w[-1] - w[0])
    cut = float(w[0]) + 0.4 * (w[1] - w[0])
    c, e = 0.5 * (b + cut), 0.5 * (b - cut)
    vf = cheb_chain(op, vp, 32, c, e)
    from dmft_lanc_ed_tpu.ops.blocksparse import from_padded
    vn = np.asarray(from_padded(op, vf, jnp.float64)).ravel()
    ov0 = abs(np.vdot(np.asarray(v0n).ravel(), v[:, 0]))
    ovf = abs(np.vdot(vn / np.linalg.norm(vn), v[:, 0]))
    assert ovf > 0.99 and ovf > ov0 * 10


def test_ground_state_seed_and_two_stage():
    cfg, sec, h, op = _sector_op()
    dense = ed.dense_hamiltonian(h)
    w, v = np.linalg.eigh(dense)
    th, seed, eta = ground_state_seed(op, m_tri=24, m_cheb=32)
    ov = abs(np.vdot(np.asarray(seed).ravel(), v[:, 0]))
    assert abs(th - w[0]) < 1e-3
    assert ov > 0.999
    assert np.sqrt(max(1.0 - ov * ov, 0.0)) <= max(eta, 1e-6) * 3
    from dmft_lanc_ed_tpu.diag import _blocksparse_ground_state
    evals, evecs = _blocksparse_ground_state(cfg, op, sec.dim, 1, 32)
    assert abs(evals[0] - w[0]) < 1e-10
    vec = np.asarray(evecs[0])
    assert abs(abs(np.vdot(vec, v[:, 0])) - 1.0) < 1e-8


def test_tridiag_chain_breakdown():
    """Start vector = exact eigenvector: chain dies after one step and the
    zero-beta truncation in ground_state_seed must still return it."""
    _, sec, h, op = _sector_op(nbath=4, nup=2, ndw=2)
    dense = ed.dense_hamiltonian(h)
    w, v = np.linalg.eigh(dense)
    v0 = jnp.asarray(v[:, 0].reshape(op.dim_dw, op.dim_up))
    al, be, bout = tridiag_chain(op, to_padded(op, v0), 8)
    # alpha_0 = Rayleigh quotient = E0 (to kernel precision); the coupling
    # out of an eigenvector is ~ the matvec noise floor
    assert abs(al[0] - w[0]) < 1e-3
    assert be[1] < 1e-2
    th, seed, _ = ground_state_seed(op, m_tri=8, m_cheb=8,
                                    v0=to_padded(op, v0))
    ov = abs(np.vdot(np.asarray(seed).ravel(), v[:, 0]))
    assert ov > 0.999


def test_gf_tridiag_batch_matches_f64_oracle():
    """The f32-fidelity GF chain kernel (6-pass HIGHEST over f32 slabs)
    reproduces the f64 plain-Lanczos tridiagonal to the mixed contract, and
    the continued-fraction GF it implies matches to ~1e-6."""
    from dmft_lanc_ed_tpu.ops.bs_chain import (gf_chain_applicable,
                                               gf_tridiag_batch)
    from dmft_lanc_ed_tpu.ops.lanczos import tridiag_eigh
    _, _, h, op = _sector_op()
    m = 24
    assert gf_chain_applicable(op, m)
    rng = jax.random.PRNGKey(11)
    vs = jax.random.normal(rng, (3, op.dim), jnp.float64)
    vs = vs / jnp.linalg.norm(vs, axis=1, keepdims=True)
    al_k, be_k = gf_tridiag_batch(op, vs, m)
    z = 1j * np.linspace(0.05, 3.0, 20)
    for i in range(3):
        alr, ber = lanczos_tridiag(op, vs[i], m, matvec_bs_exact_flat)
        scale = max(1.0, float(np.max(np.abs(np.asarray(alr)))))
        # early chain steps carry the f32 contract; late steps of a plain
        # (non-reorthogonalized) chain diverge between any two precisions
        # once orthogonality is lost — compare the physical observable too
        assert np.max(np.abs(al_k[i][:8] - np.asarray(alr)[:8])) \
            < 5e-5 * scale
        assert np.max(np.abs(be_k[i][:8] - np.asarray(ber)[:8])) \
            < 5e-5 * scale
        # continued-fraction GF from each tridiagonal
        th_k, s_k = tridiag_eigh(al_k[i], be_k[i])
        th_r, s_r = tridiag_eigh(np.asarray(alr), np.asarray(ber))
        g_k = ((s_k[0, :] ** 2)[None, :] / (z[:, None] - th_k)).sum(1)
        g_r = ((s_r[0, :] ** 2)[None, :] / (z[:, None] - th_r)).sum(1)
        assert np.max(np.abs(g_k - g_r)) < 2e-5


def test_solver_gf_chain_path_matches_dense(monkeypatch):
    """Full solve with the GF chain kernel forced on (threshold 0) agrees
    with the dense-backend GF to the mixed-precision contract."""
    kw = dict(norb=1, nbath=6, uloc=(2.2,), lanc_dim_threshold=16,
              lmats=64, lreal=8, lanc_ngfiter=48)
    cfg_d = ed.read_input(None, ed_backend="dense", **kw)
    cfg_p = ed.read_input(None, ed_backend="pallas",
                          ed_gf_chain_min_dim=0, **kw)
    sd = ed.EDSolver(cfg_d)
    rd = sd.solve(sd.init_bath())
    sp = ed.EDSolver(cfg_p)
    rp = sp.solve(sp.init_bath())
    assert abs(rd.state_list.emin - rp.state_list.emin) < 1e-9
    # the f32-arithmetic chain carries ~2e-5 RELATIVE GF noise (the chain
    # recurrence itself runs in f32, unlike the dense path's f64 recurrence
    # with mixed matvecs) — the documented contract of this path
    np.testing.assert_allclose(rp.g_mats, rd.g_mats, atol=5e-5, rtol=3e-5)
    np.testing.assert_allclose(rp.observables.dens, rd.observables.dens,
                               atol=1e-7)


def test_sharded_bs_matvec_matches_serial():
    """Dw-sharded band-sparse fused matvec (ppermute halo exchange,
    parallel/bs_sharded.py) == single-chip fused matvec, on a 2-device
    mesh where the band constraint ntd/n >= d_dw+1 holds."""
    from dmft_lanc_ed_tpu.ops.blocksparse import _matvec_padded_pop
    from dmft_lanc_ed_tpu.parallel.bs_sharded import (bs_shard_applicable,
                                                      make_sharded_bs_matvec)
    from dmft_lanc_ed_tpu.parallel.mesh import make_mesh
    # the bench geometry (nbath=11 -> 924x924, padded 1024, ntd=8, band
    # 224 -> d_dw=2) is the smallest where the RCM band actually clips;
    # interpret-mode pallas compiles to XLA CPU so one matvec is cheap
    _, _, h, op = _sector_op(nbath=11, nup=6, ndw=6)
    ntd = op.padded_shape[0] // 128
    n = 2
    if not bs_shard_applicable(op, n):
        pytest.skip(f"band constraint: ntd={ntd}, d_dw={op.d_dw}")
    mesh = make_mesh(n)
    v = jax.random.normal(jax.random.PRNGKey(7),
                          (op.dim_dw, op.dim_up), jnp.float64)
    vp = to_padded(op, v / jnp.linalg.norm(v))
    # grid-form serial kernel: same per-panel dot grouping as the sharded
    # kernel (the static-runs kernel groups the window dots differently)
    y_ser, ss_ser = _matvec_padded_pop(op.pop, vp, jnp.float32(1.0),
                                       interpret=True)
    apply_sh, _spec = make_sharded_bs_matvec(op, mesh)
    y_sh, ss_sh = apply_sh(vp)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ser),
                               rtol=0, atol=1e-6)
    assert abs(float(ss_sh) - float(np.sum(np.asarray(ss_ser)))) < 1e-5


def test_solver_pallas_backend_uses_chain(monkeypatch):
    """ed_backend=pallas end-to-end solve on a chain-applicable sector."""
    cfg = ed.read_input(None, norb=1, nbath=5, uloc=(2.0,),
                        ed_backend="pallas", lanc_dim_threshold=64)
    bath = ed.init_bath(cfg)
    table = ed.SectorTable(cfg)
    from dmft_lanc_ed_tpu.diag import diagonalize_impurity
    states = diagonalize_impurity(cfg, table, np.zeros((1, 1, 1, 1)), bath)
    # oracle: dense eigh over all sectors
    e_best = np.inf
    for sqn in table.all_qns():
        sec = table.sector(sqn)
        hh = ed.build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)),
                                         bath)
        e_best = min(e_best, float(np.linalg.eigvalsh(
            ed.dense_hamiltonian(hh))[0]))
    assert abs(states.emin - e_best) < 1e-9
