"""Benchmark: sector SpMV throughput (the BASELINE.json metric).

Runs the hot kernel of the framework — the (Nup, Ndw) sector Hamiltonian
matvec (reference hot loop: spMatVec_mpi_main inside ARPACK reverse
communication, ED_HAMILTONIAN_SPARSE_HxV.f90:568) — on the available device
and reports nnz/s plus the fraction of the measured HBM stream roofline.

Prints exactly ONE JSON line on stdout:
  {"metric": "sector_spmv_nnz_per_s", "value": N, "unit": "nnz/s",
   "vs_baseline": fraction_of_hbm_roofline}
(vs_baseline is achieved/roofline; the BASELINE.md target is >= 0.70.)
Supplementary details go to stderr.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_stream_bw(jnp, jax, nbytes=2 ** 28):
    """Measured HBM copy bandwidth (read+write) in bytes/s."""
    x = jnp.ones(nbytes // 8, jnp.float64)
    f = jax.jit(lambda x: x * 1.000001)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    y = x
    for _ in range(reps):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return 2.0 * nbytes / dt     # read + write


def bench_sector(cfg, sqn, reps=20):
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

    mv = jax.jit(lambda hh, v: apply_h(hh, v))
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (sec.dim_dw, sec.dim_up),
                          jnp.dtype(cfg.ed_dtype))
    y = mv(h, v)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        y = mv(h, y)           # chain to defeat CSE; Lanczos-like dependency
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return nnz / dt, dt, sec.dim, nnz


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.config import EDConfig

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    bw = measure_stream_bw(jnp, jax)
    log(f"measured stream bandwidth: {bw / 1e9:.1f} GB/s")

    # ~1e6-state sector (BASELINE config "Nbath=9 / 1e6-state sectors" scale):
    # nbath=11 -> ns=12, sector (6,6): 924 x 924 = 853776 states
    cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,), ed_dtype="float64")
    nups = cfg.ns // 2
    best = 0.0
    details = {}
    for sqn_dims, reps in [(((nups,), (nups,)), 20)]:
        nnz_s, dt, dim, nnz = bench_sector(cfg, sqn_dims, reps)
        log(f"  matvec: {dt * 1e3:.2f} ms -> {nnz_s / 1e9:.3f} Gnnz/s")
        if nnz_s > best:
            best = nnz_s
            # roofline: minimum traffic = read v + write y once (factor
            # tables are KB-scale, VMEM-resident)
            bytes_min = 2 * dim * 8
            roofline = nnz / (bytes_min / bw)
            details = dict(dim=dim, nnz=nnz, ms=dt * 1e3,
                           roofline_gnnz=roofline / 1e9)
    vs = best / (details["roofline_gnnz"] * 1e9)
    log(f"roofline {details['roofline_gnnz']:.1f} Gnnz/s -> "
        f"fraction {vs:.3f}")
    print(json.dumps({
        "metric": "sector_spmv_nnz_per_s",
        "value": round(best, 1),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
