"""Slope-timing probe: per-step time = (T(chain_hi) - T(chain_lo)) / dchain
eliminates the fixed per-dispatch tunnel latency exactly. Confirms the
~23 ms dispatch floor hypothesis and gives the true per-matvec times."""
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
from dmft_lanc_ed_tpu.ops.blocksparse import (build_blocksparse_op,
                                              chain_step, to_padded)
from dmft_lanc_ed_tpu.ops.dense import (densify, matvec_dense_fast,
                                        matvec_dense_mixed)
from dmft_lanc_ed_tpu.ops.matvec import apply_h
from dmft_lanc_ed_tpu.sectors import SectorTable, qn

print("device:", jax.devices()[0], flush=True)
cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,), ed_dtype="float64")
sec = SectorTable(cfg).sector(qn(6, 6))
bath = init_bath(cfg)
h = build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)), bath)
op = build_blocksparse_op(h)
dop = densify(h)
rng = np.random.default_rng(0)
v = rng.standard_normal((sec.dim_dw, sec.dim_up))
v /= np.linalg.norm(v)
vp = to_padded(op, jnp.asarray(v))
v64 = jnp.asarray(v)
diag32p = op.diag32p

LO, HI_N = 200, 1200


def runner(f, n, fused=False):
    if fused:
        @jax.jit
        def run(x):
            def step(carry, _):
                w, r = carry
                return f(w, r), None
            (out, _), _ = jax.lax.scan(step, (x, jnp.float32(1.0)), None,
                                       length=n)
            return out
    else:
        @jax.jit
        def run(x):
            def step(w, _):
                y = f(w)
                return y / jnp.linalg.norm(y), None
            out, _ = jax.lax.scan(step, x, None, length=n)
            return out
    return run


VARIANTS = {
    "ell_f64": (lambda w: apply_h(h, w), v64, False),
    "dense_mixed": (lambda w: matvec_dense_mixed(dop, w), v64, False),
    "dense_fast": (lambda w: matvec_dense_fast(dop, w), v64, False),
    "pallas_fused": (lambda w, r: chain_step(op, w, r), vp, True),
    "diag_only_f32": (lambda w: diag32p * w + 1e-6 * w, vp, False),
}

runners = {}
for name, (f, x, fused) in VARIANTS.items():
    runners[name] = {n: runner(f, n, fused) for n in (LO, HI_N)}
    t0 = time.perf_counter()
    runners[name][LO](x).block_until_ready()
    runners[name][HI_N](x).block_until_ready()
    print(f"compiled {name} ({time.perf_counter()-t0:.1f}s)", flush=True)


def t_of(run, x, reps=3):
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


print(f"--- slope timing (chains {LO} vs {HI_N}) ---", flush=True)
for name, (f, x, fused) in VARIANTS.items():
    tlo = t_of(runners[name][LO], x)
    thi = t_of(runners[name][HI_N], x)
    slope = (thi - tlo) / (HI_N - LO)
    fixed = tlo - slope * LO
    print(f"  {name:15s} slope {slope*1e3:8.4f} ms/mv   "
          f"fixed {fixed*1e3:7.1f} ms   -> {h.nnz/slope/1e9:8.1f} Gnnz/s",
          flush=True)
print("PROBE3 DONE", flush=True)
