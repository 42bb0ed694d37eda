"""Micro-benchmark of sector-matvec formulations on the live device.

Formulations (all compute the same y = D v + (1 (x) Hup) v + (Hdw (x) 1) v):
  ell      : ELL gather + einsum (current apply_h)
  perm     : sum over hop *terms*, each a partial permutation applied as a
             full row-gather (up factor applied in transposed layout)
  dense    : hop factors densified, jnp matmul (MXU path; f32/bf16 only
             sensible with split-compensation for accuracy)
Run:  python experiments/matvec_variants.py [dtype ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dmft_lanc_ed_tpu.bath import init_bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.sectors import SectorTable, qn


def timeit(f, *args, reps=10):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args[:-1], y) if False else f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def main():
    dtypes = sys.argv[1:] or ["float64", "float32"]
    cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,))
    table = SectorTable(cfg)
    sec = table.sector(qn(6, 6))
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    h64 = build_sector_hamiltonian(cfg, sec, hloc, bath)
    dd, du = sec.dim_dw, sec.dim_up
    print(f"sector {dd}x{du} = {sec.dim}")

    # build permutation-term representation from ELL (host)
    def ell_to_perms(cols, vals):
        cols = np.asarray(cols)
        vals = np.asarray(vals, dtype=np.float64)
        perms = []
        for k in range(cols.shape[1]):
            src = cols[:, k].astype(np.int32)
            val = vals[:, k]
            if np.any(val != 0):
                perms.append((src, val))
        return perms

    up_perms = ell_to_perms(h64.up_cols, h64.up_vals)
    dw_perms = ell_to_perms(h64.dw_cols, h64.dw_vals)
    print(f"K_up={len(up_perms)} K_dw={len(dw_perms)}")

    for dts in dtypes:
        dt = jnp.dtype(dts)
        diag = jnp.asarray(h64.diag, dt)
        up_cols = jnp.asarray(h64.up_cols)
        up_vals = jnp.asarray(h64.up_vals, dt)
        dw_cols = jnp.asarray(h64.dw_cols)
        dw_vals = jnp.asarray(h64.dw_vals, dt)
        v = jax.random.normal(jax.random.PRNGKey(0), (dd, du), dt)

        # (a) ELL einsum
        @jax.jit
        def mv_ell(v):
            y = diag * v
            g = v[:, up_cols]
            y = y + jnp.einsum("dnk,nk->dn", g, up_vals)
            g2 = v[dw_cols, :]
            y = y + jnp.einsum("dku,dk->du", g2, dw_vals)
            return y
        t = timeit(mv_ell, v)
        print(f"{dts:8s} ell   : {t * 1e3:8.2f} ms")

        # (b) permutation row-gathers
        upS = jnp.asarray(np.stack([p[0] for p in up_perms]))
        upV = jnp.asarray(np.stack([p[1] for p in up_perms]), dt)
        dwS = jnp.asarray(np.stack([p[0] for p in dw_perms]))
        dwV = jnp.asarray(np.stack([p[1] for p in dw_perms]), dt)

        @jax.jit
        def mv_perm(v):
            y = diag * v
            # dw factor: row gathers
            def body(t, acc):
                return acc + dwV[t][:, None] * v[dwS[t], :]
            y = jax.lax.fori_loop(0, dwS.shape[0], body, y)
            # up factor in transposed layout
            vt = v.T
            def bodyu(t, acc):
                return acc + upV[t][:, None] * vt[upS[t], :]
            yt = jax.lax.fori_loop(0, upS.shape[0], bodyu,
                                   jnp.zeros_like(vt))
            return y + yt.T
        t = timeit(mv_perm, v)
        print(f"{dts:8s} perm  : {t * 1e3:8.2f} ms")

        # (c) dense factors (matmul / MXU)
        hup = np.zeros((du, du))
        cols = np.asarray(h64.up_cols)
        vals = np.asarray(h64.up_vals, dtype=np.float64)
        for k in range(cols.shape[1]):
            np.add.at(hup, (np.arange(du), cols[:, k]), vals[:, k])
        hdw = np.zeros((dd, dd))
        cols = np.asarray(h64.dw_cols)
        vals = np.asarray(h64.dw_vals, dtype=np.float64)
        for k in range(cols.shape[1]):
            np.add.at(hdw, (np.arange(dd), cols[:, k]), vals[:, k])
        hupT = jnp.asarray(hup.T, dt)
        hdwj = jnp.asarray(hdw, dt)

        @jax.jit
        def mv_dense(v):
            y = diag * v
            y = y + v @ hupT
            y = y + hdwj @ v
            return y
        t = timeit(mv_dense, v)
        print(f"{dts:8s} dense : {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
