"""Drift-aware on-chip kernel probe: interleave all variants over R rounds,
take per-variant minima (the chip/tunnel warms up and drifts 2-3x within
and across processes — single-shot comparisons are meaningless)."""
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
from dmft_lanc_ed_tpu.ops.dense import densify, matvec_dense_fast
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

HI = jax.lax.Precision.HIGHEST
hup32p, diag32p = op.hup32p, op.diag32p
hdw_full = np.zeros((op.padded_shape[0],) * 2, np.float32)
slabs = np.asarray(op.dw_slabs)
ddp = op.padded_shape[0]
for i in range(slabs.shape[0]):
    t = min(max((i - op.d_dw) * 128, 0), ddp - op.w_dw)
    hdw_full[i * 128:(i + 1) * 128, t:t + op.w_dw] = slabs[i]
hdw32p = jnp.asarray(hdw_full)
a1k = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
b1k = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)

CHAIN = 50


def make_runner(f, fused=False):
    if fused:
        @jax.jit
        def run(x):
            def step(carry, _):
                w, r = carry
                return f(w, r), None
            (out, _), _ = jax.lax.scan(step, (x, jnp.float32(1.0)), None,
                                       length=CHAIN)
            return out
    else:
        @jax.jit
        def run(x):
            def step(w, _):
                y = f(w)
                return y / jnp.linalg.norm(y), None
            out, _ = jax.lax.scan(step, x, None, length=CHAIN)
            return out
    return run


VARIANTS = {
    "pallas_fused": (make_runner(lambda w, r: chain_step(op, w, r),
                                 fused=True), vp),
    "xla_f32_highest": (make_runner(
        lambda w: diag32p * w + jnp.matmul(w, hup32p, precision=HI)
        + jnp.matmul(hdw32p, w, precision=HI)), vp),
    "xla_f32_default": (make_runner(
        lambda w: diag32p * w + jnp.matmul(w, hup32p)
        + jnp.matmul(hdw32p, w)), vp),
    "diag_only_f32": (make_runner(lambda w: diag32p * w + 1e-6 * w), vp),
    "up_only_highest": (make_runner(
        lambda w: jnp.matmul(w, hup32p, precision=HI) + 1e-6 * w), vp),
    "bare_1024_matmul": (make_runner(
        lambda w: jnp.matmul(w, b1k, precision=HI)), a1k),
    "dense_fast_prod": (make_runner(lambda w: matvec_dense_fast(dop, w)),
                        v64),
}

# compile all first (so rounds measure steady-state only)
for name, (run, x) in VARIANTS.items():
    t0 = time.perf_counter()
    run(x).block_until_ready()
    print(f"compiled {name} ({time.perf_counter()-t0:.1f}s)", flush=True)

best = {k: 1e30 for k in VARIANTS}
ROUNDS = 6
for r in range(ROUNDS):
    for name, (run, x) in VARIANTS.items():
        t0 = time.perf_counter()
        run(x).block_until_ready()
        dt = (time.perf_counter() - t0) / CHAIN
        best[name] = min(best[name], dt)
    print(f"round {r}: " + " ".join(
        f"{k}={best[k]*1e3:.3f}" for k in VARIANTS), flush=True)

print("--- per-variant best (ms/mv) ---")
for k, dt in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"  {k:20s} {dt*1e3:8.3f}", flush=True)
print("PROBE2 DONE", flush=True)
