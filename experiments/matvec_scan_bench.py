"""Chain N matvecs inside one jit (lax.scan) to amortize dispatch latency."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from dmft_lanc_ed_tpu.bath import init_bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.sectors import SectorTable, qn

def bench_chain(mv, v, n=100, reps=3):
    @jax.jit
    def chain(v):
        def step(v, _):
            w = mv(v)
            return w / jnp.linalg.norm(w), None
        out, _ = jax.lax.scan(step, v, None, length=n)
        return out
    y = chain(v); jax.block_until_ready(y)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chain(v); jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / n)
    return best

cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,))
sec = SectorTable(cfg).sector(qn(6, 6))
bath = init_bath(cfg)
h64 = build_sector_hamiltonian(cfg, sec, np.zeros((1,1,1,1)), bath)
dd, du = sec.dim_dw, sec.dim_up
print(f"sector {dd}x{du} = {sec.dim}, nnz/mv={h64.nnz}")

def ell_to_perms(cols, vals):
    cols = np.asarray(cols); vals = np.asarray(vals, np.float64)
    return [(cols[:, k].astype(np.int32), vals[:, k])
            for k in range(cols.shape[1]) if np.any(vals[:, k] != 0)]

up_perms = ell_to_perms(h64.up_cols, h64.up_vals)
dw_perms = ell_to_perms(h64.dw_cols, h64.dw_vals)

for dts in ["float64", "float32"]:
    dt = jnp.dtype(dts)
    diag = jnp.asarray(h64.diag, dt)
    upS = jnp.asarray(np.stack([p[0] for p in up_perms]))
    upV = jnp.asarray(np.stack([p[1] for p in up_perms]), dt)
    dwS = jnp.asarray(np.stack([p[0] for p in dw_perms]))
    dwV = jnp.asarray(np.stack([p[1] for p in dw_perms]), dt)
    v = jax.random.normal(jax.random.PRNGKey(0), (dd, du), dt)

    def mv_perm(v):
        y = diag * v
        def body(t, acc):
            return acc + dwV[t][:, None] * v[dwS[t], :]
        y = jax.lax.fori_loop(0, dwS.shape[0], body, y)
        vt = v.T
        def bodyu(t, acc):
            return acc + upV[t][:, None] * vt[upS[t], :]
        yt = jax.lax.fori_loop(0, upS.shape[0], bodyu, jnp.zeros_like(vt))
        return y + yt.T
    t = bench_chain(mv_perm, v)
    print(f"{dts:8s} perm scan : {t*1e3:8.3f} ms/mv -> {h64.nnz/t/1e9:7.2f} Gnnz/s")

    # unrolled (no fori) version — lets XLA fuse the K gathers
    def mv_perm_unroll(v):
        y = diag * v
        for t in range(dwS.shape[0]):
            y = y + dwV[t][:, None] * v[dwS[t], :]
        vt = v.T
        yt = jnp.zeros_like(vt)
        for t in range(upS.shape[0]):
            yt = yt + upV[t][:, None] * vt[upS[t], :]
        return y + yt.T
    t = bench_chain(mv_perm_unroll, v)
    print(f"{dts:8s} perm unrl : {t*1e3:8.3f} ms/mv -> {h64.nnz/t/1e9:7.2f} Gnnz/s")
