"""Benchmark matvec backends on device: ELL row-gather (round-1 production)
vs dense tensor-product XLA matmuls (f64 / mixed / fast) vs the fused Pallas
kernel, Lanczos-chained (dispatch-amortized). Run on the real TPU chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dmft_lanc_ed_tpu.bath import init_bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.dense import (densify, matvec_dense,
                                        matvec_dense_fast, matvec_dense_mixed)
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.ops.pallas_matvec import (build_pallas_dense_op,
                                                matvec_pallas,
                                                pallas_applicable)
from dmft_lanc_ed_tpu.sectors import SectorTable, qn

NBATH = int(sys.argv[1]) if len(sys.argv) > 1 else 11

cfg = EDConfig(norb=1, nbath=NBATH, uloc=(2.0,))
nup = cfg.ns // 2
sec = SectorTable(cfg).sector(qn(nup, nup))
bath = init_bath(cfg)
h = build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)), bath)
dd, du = sec.dim_dw, sec.dim_up
print(f"device: {jax.devices()[0]}  sector {dd}x{du} = {sec.dim}, "
      f"nnz/mv={h.nnz}")
dop = densify(h)
pop = build_pallas_dense_op(h) if pallas_applicable(h) else None


def bench_chain(f, v, n=100, reps=3, label=""):
    @jax.jit
    def chain(v):
        def step(v, _):
            w = f(v)
            return w / jnp.linalg.norm(w), None
        out, _ = jax.lax.scan(step, v, None, length=n)
        return out

    chain(v).block_until_ready()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        chain(v).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label:16s} {best * 1e3:8.3f} ms/mv   "
          f"{h.nnz / best / 1e9:8.2f} Gnnz/s")
    return best


v64 = jax.random.normal(jax.random.PRNGKey(0), (dd, du), jnp.float64)
v64 = v64 / jnp.linalg.norm(v64)

# accuracy probe vs the f64 ELL reference
y_ref = np.asarray(apply_h(h, v64))
scale = np.abs(y_ref).max()
for name, f in [("dense f64", lambda v: matvec_dense(dop, v)),
                ("dense mixed", lambda v: matvec_dense_mixed(dop, v)),
                ("dense fast", lambda v: matvec_dense_fast(dop, v))] + (
                    [("pallas", lambda v: matvec_pallas(pop, v))]
                    if pop is not None else []):
    err = np.abs(np.asarray(f(v64)) - y_ref).max() / scale
    print(f"accuracy {name:12s} rel err {err:.2e}")

bench_chain(lambda v: apply_h(h, v), v64, label="ell f64")
bench_chain(lambda v: matvec_dense(dop, v), v64, label="dense f64")
bench_chain(lambda v: matvec_dense_mixed(dop, v), v64, label="dense mixed")
bench_chain(lambda v: matvec_dense_fast(dop, v), v64, label="dense fast")
if pop is not None:
    bench_chain(lambda v: matvec_pallas(pop, v), v64, label="pallas fused")
