"""On-chip probe of the fused chain kernels at the 854k bench sector.

Measures (slope-timed between two chain lengths, cancelling the ~24 ms
axon dispatch latency):
  - fused tridiag chain per-step time (the new headline candidate)
  - fused Chebyshev chain per-step time
  - per-call kernel chain per-step time (round-3 headline, for comparison)
and then drives the production two-stage ground state, gating against the
host scipy-ARPACK f64 energy.

Usage: python experiments/chain_bench.py [nbath] [quick]
"""
import sys
import time

import numpy as np

NBATH = int(sys.argv[1]) if len(sys.argv) > 1 else 11
QUICK = "quick" in sys.argv


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    import dmft_lanc_ed_tpu as ed
    from dmft_lanc_ed_tpu.ops.blocksparse import (blocksparse_applicable,
                                                  build_blocksparse_op,
                                                  chain_step, to_padded)
    from dmft_lanc_ed_tpu.ops.bs_chain import (cheb_call, tridiag_call,
                                               chain_applicable,
                                               ground_state_seed)

    print("device:", jax.devices()[0], flush=True)
    cfg = ed.read_input(None, norb=1, nbath=NBATH, uloc=(2.0,))
    nup = cfg.ns // 2
    table = ed.SectorTable(cfg)
    sec = table.sector(ed.qn(nup, nup))
    bath = ed.init_bath(cfg)
    h = ed.build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)), bath)
    print(f"sector dim={sec.dim} nnz/mv={h.nnz}", flush=True)
    assert blocksparse_applicable(h)
    op = build_blocksparse_op(h)
    print(f"chain_applicable={chain_applicable(op)} padded={op.padded_shape}"
          f" w_dw={op.w_dw} w_up={op.w_up}", flush=True)

    v0n = jax.random.normal(jax.random.PRNGKey(0),
                            (op.dim_dw, op.dim_up), jnp.float64)
    v0 = to_padded(op, v0n / jnp.linalg.norm(v0n))

    k_lo, k_hi = (16, 64) if QUICK else (64, 256)

    def slope(fn):
        t = {}
        for kk in (k_lo, k_hi):
            fn(kk)                                     # compile+warm
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                fn(kk)
                best = min(best, time.perf_counter() - t0)
            t[kk] = best
        return (t[k_hi] - t[k_lo]) / (k_hi - k_lo)

    # fused tridiag chain
    def run_tri(kk):
        al, be = tridiag_call(op, v0, kk)
        jax.block_until_ready((al, be))
    dt = slope(run_tri)
    print(f"tridiag_chain: {dt*1e6:8.1f} us/step -> "
          f"{h.nnz/dt/1e9:7.1f} Gnnz/s", flush=True)

    # fused chebyshev chain
    ce = jnp.asarray(np.array([[0.0], [0.1]], np.float32))

    def run_cheb(kk):
        v, nrm = cheb_call(op, v0, ce, kk)
        jax.block_until_ready(nrm)
    dtc = slope(run_cheb)
    print(f"cheb_chain:    {dtc*1e6:8.1f} us/step -> "
          f"{h.nnz/dtc/1e9:7.1f} Gnnz/s", flush=True)

    # per-call kernel chain (round-3 headline path)
    def make_call_chain(kk):
        @jax.jit
        def run(v):
            def step(carry, _):
                v, r = carry
                return chain_step(op, v, r), None
            (out, _), _ = jax.lax.scan(step, (v, jnp.float32(1.0)),
                                       None, length=kk)
            return out
        return run
    runs = {kk: make_call_chain(kk) for kk in (k_lo, k_hi)}
    t = {}
    for kk, r in runs.items():
        r(v0).block_until_ready()
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            r(v0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[kk] = best
    dtp = (t[k_hi] - t[k_lo]) / (k_hi - k_lo)
    print(f"per-call:      {dtp*1e6:8.1f} us/step -> "
          f"{h.nnz/dtp/1e9:7.1f} Gnnz/s", flush=True)

    if QUICK:
        return

    # seed quality + timing
    t0 = time.perf_counter()
    th, seed, _eta = ground_state_seed(op)
    seed.block_until_ready()
    t_seed = time.perf_counter() - t0
    print(f"ground_state_seed: theta0={th:+.9f} in {t_seed:.2f}s", flush=True)

    # production two-stage gate vs host ARPACK
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    def factor_csr(cols, vals, n):
        cols = np.asarray(cols)
        rows = np.repeat(np.arange(n), cols.shape[1])
        m = sp.csr_matrix((np.asarray(vals, np.float64).ravel(),
                           (rows, cols.ravel())), shape=(n, n))
        m.eliminate_zeros()
        return m
    hup = factor_csr(h.up_cols, h.up_vals, sec.dim_up)
    hdw = factor_csr(h.dw_cols, h.dw_vals, sec.dim_dw)
    hfull = (sp.kron(sp.identity(sec.dim_dw, format="csr"), hup)
             + sp.kron(hdw, sp.identity(sec.dim_up, format="csr"))
             + sp.diags(np.asarray(h.diag, np.float64).ravel())).tocsr()
    e_ref = float(spl.eigsh(hfull, k=1, which="SA", tol=1e-13,
                            return_eigenvectors=False)[0])
    print(f"host ARPACK E0 = {e_ref:+.12f}", flush=True)

    from dmft_lanc_ed_tpu.diag import _blocksparse_ground_state
    t0 = time.perf_counter()
    evals, _ = _blocksparse_ground_state(cfg, op, sec.dim, 1, 48)
    t_gs = time.perf_counter() - t0
    print(f"two-stage E0 = {evals[0]:+.12f} |dE| = {abs(evals[0]-e_ref):.2e}"
          f" in {t_gs:.2f}s", flush=True)


if __name__ == "__main__":
    main()
