"""Benchmark: sector SpMV throughput (the BASELINE.json metric).

Runs the hot kernel of the framework — the (Nup, Ndw) sector Hamiltonian
matvec (reference hot loop: spMatVec_mpi_main inside ARPACK reverse
communication, ED_HAMILTONIAN_SPARSE_HxV.f90:568) — as a Lanczos-style chain
inside a single jit (dispatch-amortized, the way the solver actually runs it)
and reports nnz/s plus the fraction of the measured HBM stream roofline.

Prints exactly ONE JSON line on stdout:
  {"metric": "sector_spmv_nnz_per_s", "value": N, "unit": "nnz/s",
   "vs_baseline": fraction_of_hbm_roofline}
(vs_baseline = achieved / roofline where roofline assumes the minimum HBM
traffic of one read + one write of the sector vector per matvec; the
BASELINE.md north-star target is >= 0.70.)
Supplementary details go to stderr.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_stream_bw(jax, jnp, nbytes=2 ** 27, chain=30):
    """Measured HBM bandwidth via a two-array recurrence the compiler cannot
    fold (each step reads two arrays and writes one: 3 passes)."""
    n = nbytes // 8
    x = jnp.arange(n, dtype=jnp.float64)
    y = jnp.ones(n, dtype=jnp.float64)

    @jax.jit
    def run(x, y):
        def step(carry, _):
            x, y = carry
            z = 0.5 * x + 0.4999999 * y
            return (y, z), None
        (xf, yf), _ = jax.lax.scan(step, (x, y), None, length=chain)
        return yf

    run(x, y).block_until_ready()
    t0 = time.perf_counter()
    run(x, y).block_until_ready()
    dt = (time.perf_counter() - t0) / chain
    bw = 3.0 * nbytes / dt
    # guard against any residual compiler shortcuts: v5e HBM tops out ~819GB/s
    return min(bw, 1.2e12)


def bench_sector(cfg, sqn, chain=100, reps=3):
    import jax
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.bath import init_bath
    from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
    from dmft_lanc_ed_tpu.ops.matvec import apply_h
    from dmft_lanc_ed_tpu.sectors import SectorTable

    table = SectorTable(cfg)
    sec = table.sector(sqn)
    bath = init_bath(cfg)
    hloc = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    nnz = h.nnz
    log(f"sector {sqn}: dim={sec.dim} ({sec.dim_dw}x{sec.dim_up}), "
        f"nnz/matvec={nnz}")

    @jax.jit
    def run(v):
        def step(v, _):
            w = apply_h(h, v)
            return w / jnp.linalg.norm(w), None
        out, _ = jax.lax.scan(step, v, None, length=chain)
        return out

    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (sec.dim_dw, sec.dim_up),
                          jnp.dtype(cfg.ed_dtype))
    run(v).block_until_ready()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        run(v).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / chain)
    return nnz / best, best, sec.dim, nnz


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.config import EDConfig

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    bw = measure_stream_bw(jax, jnp)
    log(f"measured stream bandwidth: {bw / 1e9:.1f} GB/s")

    # ~1e6-state sector (BASELINE config "Nbath=9 / 1e6-state sectors" scale):
    # nbath=11 -> ns=12, half-filled sector (6,6): 924 x 924 = 853776 states
    cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,), ed_dtype="float64")
    nups = cfg.ns // 2
    nnz_s, dt, dim, nnz = bench_sector(cfg, ((nups,), (nups,)))
    log(f"  matvec: {dt * 1e3:.3f} ms -> {nnz_s / 1e9:.3f} Gnnz/s")
    bytes_min = 2 * dim * 8
    roofline = nnz / (bytes_min / bw)
    vs = nnz_s / roofline
    log(f"roofline {roofline / 1e9:.1f} Gnnz/s -> fraction {vs:.4f}")
    print(json.dumps({
        "metric": "sector_spmv_nnz_per_s",
        "value": round(nnz_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
