"""Benchmark: sector SpMV throughput (the BASELINE.json metric).

Runs the hot kernel of the framework — the (Nup, Ndw) sector Hamiltonian
matvec (reference hot loop: spMatVec_mpi_main inside ARPACK reverse
communication, ED_HAMILTONIAN_SPARSE_HxV.f90:568) — as a Lanczos-style chain
inside a single jit (dispatch-amortized, the way the solver actually runs it)
on the ~854k-state benchmark sector, across every backend:

  ell         f64 row-gather (round-1 production; the TPU gather wall)
  dense f64   dense tensor-product factors, f64 matmuls
  dense mixed f32 MXU matmuls @ HIGHEST + f64 diagonal (production speed
              path; GS energies recovered to f64 by Rayleigh-Ritz polish)
  dense fast  f32 MXU matmuls @ HIGH
  pallas      fused Pallas kernel over the dense factors

The headline value is the fastest backend that passes the accuracy gate
(ground-state energy via that backend + f64 polish matches the f64 path to
1e-10 — the VERDICT round-2 "Done" bar).

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


def bench_chain(jax, jnp, f, v, chain=100, reps=3):
    @jax.jit
    def run(v):
        def step(v, _):
            w = f(v)
            return w / jnp.linalg.norm(w), None
        out, _ = jax.lax.scan(step, v, None, length=chain)
        return out

    run(v).block_until_ready()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        run(v).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.bath import init_bath
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
    from dmft_lanc_ed_tpu.ops.dense import (densify, matvec_dense,
                                            matvec_dense_fast,
                                            matvec_dense_fast_flat,
                                            matvec_dense_flat,
                                            matvec_dense_mixed,
                                            matvec_dense_mixed_flat)
    from dmft_lanc_ed_tpu.ops.lanczos import lanczos_ground_state
    from dmft_lanc_ed_tpu.ops.matvec import apply_h, matvec_flat
    from dmft_lanc_ed_tpu.ops.pallas_matvec import (build_pallas_dense_op,
                                                    matvec_pallas,
                                                    matvec_pallas_flat,
                                                    pallas_applicable)
    from dmft_lanc_ed_tpu.sectors import SectorTable, qn

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    bw = measure_stream_bw(jax, jnp)
    log(f"measured stream bandwidth: {bw / 1e9:.1f} GB/s")

    # ~1e6-state sector (BASELINE config "Nbath=9 / 1e6-state sectors" scale):
    # nbath=11 -> ns=12, half-filled sector (6,6): 924 x 924 = 853776 states
    cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,), ed_dtype="float64")
    nup = cfg.ns // 2
    table = SectorTable(cfg)
    sec = table.sector(qn(nup, nup))
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    dop = densify(h)
    pop = build_pallas_dense_op(h) if pallas_applicable(h) else None
    nnz, dim = h.nnz, sec.dim
    log(f"sector ({nup},{nup}): dim={dim} ({sec.dim_dw}x{sec.dim_up}), "
        f"nnz/matvec={nnz}")

    v = jax.random.normal(jax.random.PRNGKey(0), (sec.dim_dw, sec.dim_up),
                          jnp.float64)
    v = v / jnp.linalg.norm(v)

    results = {}
    results["ell"] = bench_chain(jax, jnp, lambda x: apply_h(h, x), v)
    results["dense_mixed"] = bench_chain(
        jax, jnp, lambda x: matvec_dense_mixed(dop, x), v)
    results["dense_fast"] = bench_chain(
        jax, jnp, lambda x: matvec_dense_fast(dop, x), v)
    if pop is not None:
        results["pallas"] = bench_chain(
            jax, jnp, lambda x: matvec_pallas(pop, x), v)
    for k, dt in results.items():
        log(f"  {k:12s} {dt * 1e3:8.3f} ms/mv -> "
            f"{nnz / dt / 1e9:8.2f} Gnnz/s")

    # accuracy gate: GS energy via each fast backend (+ f64 polish) must
    # match the f64 path to 1e-10
    log("accuracy gate: ground-state energies (ncv=48)")
    e_ref, _ = lanczos_ground_state(h, matvec_flat, dim, 1, ncv=48,
                                    tol=1e-12)
    log(f"  f64 ell GS     E = {e_ref[0]:+.12f}")
    candidates = [("dense_mixed", dop, matvec_dense_mixed_flat, 3e-6),
                  ("dense_fast", dop, matvec_dense_fast_flat, 3e-5)]
    if pop is not None:
        candidates.append(("pallas", pop, matvec_pallas_flat, 3e-6))
    exact = {id(dop): matvec_dense_flat}
    accurate = set()
    for name, op, app, tol in candidates:
        from dmft_lanc_ed_tpu.ops.factory import exact_apply
        e, _ = lanczos_ground_state(op, app, dim, 1, ncv=48, tol=tol,
                                    polish_apply=exact_apply(op))
        err = abs(e[0] - e_ref[0])
        log(f"  {name:12s} E = {e[0]:+.12f}  |dE| = {err:.2e}")
        if err < 1e-10:
            accurate.add(name)

    eligible = {k: dt for k, dt in results.items()
                if k == "ell" or k in accurate}
    best_name = min(eligible, key=eligible.get)
    best = eligible[best_name]
    nnz_s = nnz / best
    log(f"headline backend: {best_name} ({best * 1e3:.3f} ms/mv)")

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
