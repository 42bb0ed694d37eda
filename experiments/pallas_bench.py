"""Benchmark the Pallas kernel vs the XLA row-gather path on device."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from dmft_lanc_ed_tpu.bath import init_bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.ops.pallas_matvec import (build_pallas_op, apply_pallas,
                                                pad_rows, SLAB_L)
from dmft_lanc_ed_tpu.sectors import SectorTable, qn

cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,))
sec = SectorTable(cfg).sector(qn(6, 6))
bath = init_bath(cfg)
h = build_sector_hamiltonian(cfg, sec, np.zeros((1,1,1,1)), bath)
dd, du = sec.dim_dw, sec.dim_up
op = build_pallas_op(h)
ns_runs = (op.dw_runs.s_da.shape[0], op.dw_runs.l_da.shape[0],
           op.up_runs.s_da.shape[0], op.up_runs.l_da.shape[0])
print(f"sector {dd}x{du}, nnz/mv={h.nnz}, runs (dwS,dwL,upS,upL)={ns_runs}")

def bench_chain(f, v, n=100, reps=3, label=""):
    @jax.jit
    def chain(v):
        def step(v, _):
            w = f(v)
            return w / jnp.linalg.norm(w), None
        out, _ = jax.lax.scan(step, v, None, length=n)
        return out
    y = chain(v); jax.block_until_ready(y)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(chain(v))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label:16s}: {best*1e3:8.3f} ms/mv -> {h.nnz/best/1e9:7.2f} Gnnz/s")
    return best

# XLA f32 path
h32 = jax.tree.map(lambda x: x.astype(jnp.float32)
                   if x.dtype == jnp.float64 else x, h)
v32 = jax.random.normal(jax.random.PRNGKey(0), (dd, du), jnp.float32)
bench_chain(lambda v: apply_h(h32, v), v32, label="xla f32")

# pallas path (maintains padded pair inside the step)
vp = pad_rows(v32)
def pallas_step(vp):
    v = vp[:dd]
    y = apply_pallas(op, vp, pad_rows(v.T))
    y = y / jnp.linalg.norm(y)
    return pad_rows(y)
bench_chain(pallas_step, vp, label="pallas f32")

# f64 XLA reference
v64 = v32.astype(jnp.float64)
bench_chain(lambda v: apply_h(h, v), v64, label="xla f64")
