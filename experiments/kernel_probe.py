"""On-chip probes: (A) f64 accuracy floor of dense matmul vs ELL gather
matvec; (B) where the fused kernel's time goes (term-by-term + XLA pure-f32
fused baselines)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dmft_lanc_ed_tpu.bath import init_bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.dense import densify, matvec_dense
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.sectors import SectorTable, qn

print("device:", jax.devices()[0], flush=True)
cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,), ed_dtype="float64")
table = SectorTable(cfg)
sec = table.sector(qn(6, 6))
bath = init_bath(cfg)
hloc = np.zeros((1, 1, 1, 1))
h = build_sector_hamiltonian(cfg, sec, hloc, bath)
dop = densify(h)
print("built", flush=True)

rng = np.random.default_rng(0)
v = rng.standard_normal((sec.dim_dw, sec.dim_up))
v /= np.linalg.norm(v)

# ---- probe A: f64 accuracy of each apply vs host numpy ----
hup = np.asarray(dop.hup)
hdw = np.asarray(dop.hdw)
diag = np.asarray(dop.diag)
y_host = diag * v + v @ hup + hdw @ v
scale = np.abs(y_host).max()

vj = jnp.asarray(v)
y_dense = np.asarray(jax.jit(matvec_dense)(dop, vj))
print(f"A: dense f64 matvec err = {np.abs(y_dense - y_host).max()/scale:.2e}"
      f" (rel)", flush=True)
y_ell = np.asarray(jax.jit(apply_h)(h, vj))
print(f"A: ell   f64 matvec err = {np.abs(y_ell - y_host).max()/scale:.2e}"
      f" (rel)", flush=True)

# host ARPACK self-check: residual of the returned pair
import scipy.sparse as sp
import scipy.sparse.linalg as spl


def factor_csr(cols, vals, n):
    cols = np.asarray(cols)
    rows = np.repeat(np.arange(n), cols.shape[1])
    m = sp.csr_matrix((np.asarray(vals, np.float64).ravel(),
                       (rows, cols.ravel())), shape=(n, n))
    m.eliminate_zeros()
    return m


hfull = (sp.kron(sp.identity(sec.dim_dw, format="csr"),
                 factor_csr(h.up_cols, h.up_vals, sec.dim_up))
         + sp.kron(factor_csr(h.dw_cols, h.dw_vals, sec.dim_dw),
                   sp.identity(sec.dim_up, format="csr"))
         + sp.diags(diag.ravel())).tocsr()
w, x = spl.eigsh(hfull, k=1, which="SA", tol=1e-13)
r = hfull @ x[:, 0] - w[0] * x[:, 0]
print(f"A: host ARPACK E = {w[0]:+.12f}, |Hx-Ex| = {np.linalg.norm(r):.2e}",
      flush=True)

# ---- probe B: kernel time decomposition ----
from dmft_lanc_ed_tpu.ops.blocksparse import (build_blocksparse_op,
                                              chain_step, to_padded)

op = build_blocksparse_op(h)
vp = to_padded(op, jnp.asarray(v))


def bench(f, x, chain=50, reps=3, fused=False):
    if fused:
        @jax.jit
        def run(x):
            def step(carry, _):
                v, r = carry
                return f(v, r), None
            (out, _), _ = jax.lax.scan(step, (x, jnp.float32(1.0)), None,
                                       length=chain)
            return out
    else:
        @jax.jit
        def run(x):
            def step(v, _):
                w = f(v)
                return w / jnp.linalg.norm(w), None
            out, _ = jax.lax.scan(step, x, None, length=chain)
            return out
    run(x).block_until_ready()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / chain)
    return best * 1e3


dt = bench(lambda w, r: chain_step(op, w, r), vp, fused=True)
print(f"B: pallas fused chain        {dt:8.3f} ms/mv", flush=True)

# XLA pure-f32 fused baselines (no pallas, no f64 anywhere in the chain)
hup32p = op.hup32p
diag32p = op.diag32p
hdw32pp = jnp.zeros(op.padded_shape[:1] * 2, jnp.float32)
# reassemble full padded permuted hdw from the slabs for the XLA baseline
hdw_full = np.zeros((op.padded_shape[0],) * 2, np.float32)
slabs = np.asarray(op.dw_slabs)
ddp = op.padded_shape[0]
for i in range(slabs.shape[0]):
    t = min(max((i - op.d_dw) * 128, 0), ddp - op.w_dw)
    hdw_full[i * 128:(i + 1) * 128, t:t + op.w_dw] = slabs[i]
hdw32p = jnp.asarray(hdw_full)

HI = jax.lax.Precision.HIGHEST


def xla_f32(v):
    return diag32p * v + jnp.matmul(v, hup32p, precision=HI) \
        + jnp.matmul(hdw32p, v, precision=HI)


dt = bench(xla_f32, vp)
print(f"B: XLA pure-f32 HIGHEST      {dt:8.3f} ms/mv", flush=True)


def xla_f32_high(v):
    p = jax.lax.Precision.HIGH
    return diag32p * v + jnp.matmul(v, hup32p, precision=p) \
        + jnp.matmul(hdw32p, v, precision=p)


dt = bench(xla_f32_high, vp)
print(f"B: XLA pure-f32 HIGH         {dt:8.3f} ms/mv", flush=True)


def xla_f32_default(v):
    return diag32p * v + jnp.matmul(v, hup32p) + jnp.matmul(hdw32p, v)


dt = bench(xla_f32_default, vp)
print(f"B: XLA pure-f32 DEFAULT      {dt:8.3f} ms/mv", flush=True)

# kernel without the up term / without the dw term (cost split)
from functools import partial

import dmft_lanc_ed_tpu.ops.blocksparse as bs

zero_up = bs.BlockSparseSectorOp(
    diag32p=op.diag32p, hup32p=jnp.zeros_like(op.hup32p),
    dw_slabs=op.dw_slabs, perm_dw=op.perm_dw, perm_up=op.perm_up,
    iperm_dw=op.iperm_dw, iperm_up=op.iperm_up, diag=op.diag, hup=op.hup,
    hdw=op.hdw, dim_dw=op.dim_dw, dim_up=op.dim_up, w_dw=op.w_dw,
    d_dw=op.d_dw, nnz_count=op.nnz_count)
dt = bench(lambda w, r: chain_step(zero_up, w, r), vp, fused=True)
print(f"B: pallas (zeroed hup data)  {dt:8.3f} ms/mv  "
      "(same compute, shows data-dependence only)", flush=True)

# matmul-only pallas time: diag zeroed
zero_diag = bs.BlockSparseSectorOp(
    diag32p=jnp.zeros_like(op.diag32p), hup32p=op.hup32p,
    dw_slabs=op.dw_slabs, perm_dw=op.perm_dw, perm_up=op.perm_up,
    iperm_dw=op.iperm_dw, iperm_up=op.iperm_up, diag=op.diag, hup=op.hup,
    hdw=op.hdw, dim_dw=op.dim_dw, dim_up=op.dim_up, w_dw=op.w_dw,
    d_dw=op.d_dw, nnz_count=op.nnz_count)
dt = bench(lambda w, r: chain_step(zero_diag, w, r), vp, fused=True)
print(f"B: pallas (zeroed diag data) {dt:8.3f} ms/mv", flush=True)

# pure MXU reference: single big f32 matmul same flops scale
a = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
b = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
dt = bench(lambda x: jnp.matmul(x, b, precision=HI), a)
print(f"B: bare 1024^3 f32 HIGHEST   {dt:8.3f} ms", flush=True)
print("PROBE DONE", flush=True)
