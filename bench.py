"""Benchmark: sector SpMV throughput (the BASELINE.json metric).

Runs the hot kernel of the framework — the (Nup, Ndw) sector Hamiltonian
matvec (reference hot loop: spMatVec_mpi_main inside ARPACK reverse
communication, ED_HAMILTONIAN_SPARSE_HxV.f90:568) — as a Lanczos-style chain
inside a single jit (dispatch-amortized, the way the solver actually runs it)
on the ~854k-state benchmark sector, across every backend:

  ell         f64 row-gather (round-1 production; the TPU gather wall)
  dense mixed f32 MXU matmuls @ HIGHEST + f64 diagonal glue
  dense fast  f32 MXU matmuls @ HIGH + f64 diagonal glue
  pallas      band-sparse fused kernel (ops/blocksparse.py): RCM-permuted
              factors, diagonal fused in f32, chain on padded f32 vectors,
              normalization folded into the kernel — zero per-step f64 ops

Crash resilience (round-3 redesign): rounds 1-2 lost their artifact to a
"TPU worker crashed / kernel fault" inside the on-chip f64 ELL reference
Lanczos — so (a) the f64 reference ground-state energy is now computed ON
HOST via scipy ARPACK over the assembled sparse sector matrix (no TPU
involvement, and an *independent* oracle: ARPACK is what the reference
itself uses), and (b) every backend runs in its OWN subprocess phase with a
settle pause between them (the axon tunnel stalls after process churn), so
one fault cannot void the others' fragments. The parent holds no TPU client
and always emits the final JSON line from whatever fragments survived.

The headline value is the fastest backend that passes the accuracy gate
(ground-state energy via that backend + f64 Rayleigh-Ritz polish matches the
host-ARPACK f64 value to 1e-10).

Prints exactly ONE JSON line on stdout:
  {"metric": "sector_spmv_nnz_per_s", "value": N, "unit": "nnz/s",
   "vs_baseline": fraction_of_hbm_roofline}
(vs_baseline = achieved / roofline where roofline assumes the minimum HBM
traffic of one read + one write of the f64 sector vector per matvec; see
BASELINE.md "Roofline re-derivation" for what fraction is achievable by
construction.) Supplementary details go to stderr.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# bench sector (BASELINE config "Nbath=9 / 1e6-state sectors" scale):
# nbath=11 -> ns=12, half-filled sector (6,6): 924 x 924 = 853776 states
# (BENCH_NBATH shrinks it for CPU smoke tests of the harness itself)
NORB, NBATH = 1, int(os.environ.get("BENCH_NBATH", "11"))
GATE_TOL = 1e-10
PHASE_TIMEOUT = {"ref": 900, "ell": 1200, "dense": 1500, "pallas": 1200}
SETTLE_S = int(os.environ.get("BENCH_SETTLE_S", "75"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# measurement helpers (child processes only)
#
# Round-4 measurement discipline (VERDICT r3 weak #1: the two-point slope
# produced a NEGATIVE per-step time on the drifting axon tunnel and the
# artifact of record was invalid):
#   * every slope is a least-squares fit over >= 3 chain lengths,
#   * a measurement is REJECTED and re-taken unless the per-length times
#     are strictly increasing, the fitted slope is positive, AND the slope
#     is above a physical floor (minimum HBM/MXU time the work provably
#     takes — a "faster than light" fit is a broken measurement, not a
#     fast kernel; round 4 observed the ELL chain "measure" 1.5e-8 s/mv
#     = 763 Tnnz/s because jax.block_until_ready returned without waiting),
#   * every timed program returns a SCALAR and is synced by copying that
#     scalar to host (`float(...)`) — the only readiness signal this
#     tunnel provably honors; block_until_ready is never trusted,
#   * every call gets a distinct `salt` input folded into the start vector
#     so no runtime result-cache can short-circuit repeated measurements,
#   * a quantity that stays invalid after MAX_ATTEMPTS re-measurements is
#     reported as absent (None), never as a garbage number.
# --------------------------------------------------------------------------
MAX_ATTEMPTS = 4


def _lsq_slope(ns, ts):
    """Least-squares slope of wall-time vs chain length (cancels the fixed
    ~24 ms dispatch latency of the axon tunnel exactly, like differencing,
    but uses every point)."""
    n = np.asarray(ns, np.float64)
    t = np.asarray(ts, np.float64)
    a = np.vstack([n, np.ones_like(n)]).T
    slope = np.linalg.lstsq(a, t, rcond=None)[0][0]
    return float(slope)


def robust_slope(measure, ns, what="", floor=0.0):
    """Per-step time via LSQ slope over the lengths `ns`, with rejection:
    accept only strictly-increasing times and a slope above the physical
    `floor` (seconds/step the hardware provably cannot beat for this work);
    re-measure up to MAX_ATTEMPTS times otherwise; return None if never
    valid. `measure(n)` returns the best-of-reps wall time for length n."""
    for attempt in range(MAX_ATTEMPTS):
        ts = [measure(n) for n in ns]
        monotone = all(t1 < t2 for t1, t2 in zip(ts, ts[1:]))
        slope = _lsq_slope(ns, ts)
        if monotone and slope > max(floor, 0.0):
            return slope
        log(f"  slope rejected ({what}, attempt {attempt + 1}/"
            f"{MAX_ATTEMPTS}): times={['%.4f' % t for t in ts]} "
            f"slope={slope:.3e} floor={floor:.3e} — re-measuring")
    log(f"  slope measurement FAILED ({what}): no valid (monotone, "
        f"above-floor) fit — reporting no timing")
    return None


def _host_sync(x):
    """The trusted sync: copy a scalar result to host. On this axon
    version block_until_ready can return before execution finishes
    (experiments/timing_probe.py: a 10 s stream chain 'ready' in 0.086 ms);
    an 8-byte device->host read cannot lie about completion."""
    return float(np.asarray(x).ravel()[0])


def _best_of(fn, reps):
    """Best-of-reps wall time of fn(salt): each call gets a distinct salt
    so repeated measurements are distinct programs executions (defeats any
    result caching in the remote-execution layer)."""
    best = 1e30
    for i in range(reps):
        salt = 1e-9 * (i + 1)
        t0 = time.perf_counter()
        _host_sync(fn(salt))
        best = min(best, time.perf_counter() - t0)
    return best


# v5e spec ceilings used for physical floors (a measurement implying the
# hardware beat its own spec is invalid by construction)
SPEC_BW = 8.19e11           # HBM bytes/s
SPEC_BF16 = 1.97e14         # bf16 MXU FLOP/s
FLOOR_SLACK = 2.0           # allow 2x over spec before rejecting


def measure_stream_bw(jax, jnp, nbytes=2 ** 27):
    """Measured HBM bandwidth via a two-array recurrence the compiler cannot
    fold (each step reads two arrays and writes one: 3 passes). LSQ
    slope-timed over 3 chain lengths with floor rejection; returns None
    when no valid fit is obtained (the roofline denominator then falls back
    to the chip-spec floor — it can never see a negative/absurd value)."""
    n = nbytes // 8
    x = jnp.arange(n, dtype=jnp.float64)
    y = jnp.ones(n, dtype=jnp.float64)

    def make_run(chain):
        @jax.jit
        def run(x, y, salt):
            def step(carry, _):
                x, y = carry
                z = 0.5 * x + 0.4999999 * y
                return (y, z), None
            (xf, yf), _ = jax.lax.scan(step, (x * (1.0 + salt), y), None,
                                       length=chain)
            # full reduction over the carry: the scalar depends on EVERY
            # element streamed, so slice-propagation/DCE cannot legally
            # shrink the 3-pass traffic (ADVICE r4: yf[0] data-depended
            # only on element 0 of the elementwise recurrence)
            return jnp.sum(yf)
        return run

    runs = {c: make_run(c) for c in (10, 35, 60)}
    for r in runs.values():
        _host_sync(r(x, y, jnp.float64(0.0)))

    def measure(c):
        return _best_of(lambda s: runs[c](x, y, jnp.float64(s)), 3)

    floor = 3.0 * nbytes / (SPEC_BW * FLOOR_SLACK)
    dt = robust_slope(measure, (10, 35, 60), what="stream", floor=floor)
    if dt is None:
        return None
    bw = 3.0 * nbytes / dt
    # guard against residual compiler shortcuts: v5e HBM tops out ~819 GB/s
    return min(bw, 1.2e12)


CHAIN_NS = (200, 700, 1200)


def _vector_floor(v):
    """Minimum seconds/step for any matvec chain on vector v: one read +
    one write of the state vector at FLOOR_SLACK x spec HBM bandwidth
    (chains whose state stays VMEM-resident pass their own MXU floor
    instead — see phase_pallas)."""
    return 2.0 * v.size * v.dtype.itemsize / (SPEC_BW * FLOOR_SLACK)


def _chain_slope(jax, make_run, v, reps=3, what="", floor=0.0):
    runs = {n: make_run(n) for n in CHAIN_NS}
    for r in runs.values():
        _host_sync(r(v, 0.0))

    def measure(n):
        return _best_of(lambda s: runs[n](v, s), reps)

    return robust_slope(measure, CHAIN_NS, what=what, floor=floor)


def bench_chain(jax, jnp, f, v, reps=3, what=""):
    def make_run(n):
        @jax.jit
        def run(v, salt):
            def step(v, _):
                w = f(v)
                return w / jnp.linalg.norm(w), None
            out, _ = jax.lax.scan(step, v * (1.0 + salt), None, length=n)
            return out.ravel()[0]
        return run
    return _chain_slope(jax, make_run, v, reps, what=what,
                        floor=_vector_floor(v))


def bench_chain_fused(jax, jnp, step_fn, v0, reps=3, what=""):
    """Chain where the step carries (v, inv_norm) and normalization is
    fused into the kernel (the blocksparse chain contract)."""
    def make_run(n):
        @jax.jit
        def run(v, salt):
            def step(carry, _):
                v, r = carry
                return step_fn(v, r), None
            (out, _), _ = jax.lax.scan(
                step, (v * (1.0 + jnp.float32(salt)), jnp.float32(1.0)),
                None, length=n)
            return out.ravel()[0]
        return run
    return _chain_slope(jax, make_run, v0, reps, what=what,
                        floor=_vector_floor(v0))


def _setup(cpu=False):
    import jax
    if cpu or os.environ.get("BENCH_CPU"):
        # the axon plugin overrides JAX_PLATFORMS from the env; only the
        # programmatic config forces CPU (see .claude/skills/verify)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.bath import init_bath
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
    from dmft_lanc_ed_tpu.sectors import SectorTable, qn

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = EDConfig(norb=NORB, nbath=NBATH, uloc=(2.0,), ed_dtype="float64")
    nup = cfg.ns // 2
    table = SectorTable(cfg)
    sec = table.sector(qn(nup, nup))
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    log(f"sector ({nup},{nup}): dim={sec.dim} ({sec.dim_dw}x{sec.dim_up}), "
        f"nnz/matvec={h.nnz}")
    return jax, jnp, sec, h


class _Frag:
    def __init__(self, out_path):
        self.out_path = out_path
        self.data = {"times": {}, "gates": {}, "gate_kinds": {}}

    def __setitem__(self, k, v):
        self.data[k] = v
        self.flush()

    def time(self, name, dt, nnz):
        self.data["times"][name] = dt
        log(f"  {name:12s} {dt * 1e3:8.3f} ms/mv -> "
            f"{nnz / dt / 1e9:8.2f} Gnnz/s")
        self.flush()

    def gate(self, name, e, e_ref):
        """Energy gate: |E_backend - E_hostARPACK| (kind 'energy')."""
        err = abs(float(e) - e_ref)
        self.data["gates"][name] = err
        self.data["gate_kinds"][name] = "energy"
        log(f"  gate {name:12s} E = {e:+.12f}  |dE| = {err:.2e}")
        self.flush()

    def gate_matvec(self, name, rel):
        """Matvec-oracle gate: relative matvec error vs the host CSR
        (kind 'matvec' — recorded under its own kind so the gate
        comparison never mixes quantities silently; VERDICT r4 weak #6)."""
        self.data["gates"][name] = float(rel)
        self.data["gate_kinds"][name] = "matvec"
        log(f"  gate {name:12s} matvec rel err = {rel:.2e}")
        self.flush()

    def flush(self):
        with open(self.out_path, "w") as fh:
            json.dump(self.data, fh)


def phase_ref(out_path: str):
    """Host-only f64 reference: scipy ARPACK ground state of the assembled
    sparse sector matrix (the reference's own eigensolver family; no TPU
    client, immune to tunnel faults)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    jax, jnp, sec, h = _setup(cpu=True)
    frag = _Frag(out_path)
    frag["nnz"] = h.nnz
    frag["dim"] = sec.dim

    def factor_csr(cols, vals, n):
        cols = np.asarray(cols)
        rows = np.repeat(np.arange(n), cols.shape[1])
        m = sp.csr_matrix((np.asarray(vals, np.float64).ravel(),
                           (rows, cols.ravel())), shape=(n, n))
        m.eliminate_zeros()
        return m

    t0 = time.perf_counter()
    hup = factor_csr(h.up_cols, h.up_vals, sec.dim_up)
    hdw = factor_csr(h.dw_cols, h.dw_vals, sec.dim_dw)
    hfull = (sp.kron(sp.identity(sec.dim_dw, format="csr"), hup)
             + sp.kron(hdw, sp.identity(sec.dim_up, format="csr"))
             + sp.diags(np.asarray(h.diag, np.float64).ravel())).tocsr()
    e_ref = float(spl.eigsh(hfull, k=1, which="SA", tol=1e-13,
                            return_eigenvectors=False)[0])
    frag["e_ref"] = e_ref
    log(f"  host ARPACK GS E = {e_ref:+.12f} "
        f"({time.perf_counter() - t0:.1f}s)")


def phase_ell(out_path: str):
    """Stream bandwidth + f64 ELL row-gather chain timing + its gate.

    The ell gate is a MATVEC oracle (|H_ell v - H_csr v| / |H_csr v| on a
    random vector against the host-assembled CSR) rather than a ground-state
    energy: the on-chip f64 ELL Lanczos reproducibly crashes the tunneled
    TPU worker (round-3 diagnosis, ROUND3_NOTES.md) and the matvec error
    bounds the Rayleigh-quotient error directly. Every headline candidate
    is therefore gated — no exemptions (VERDICT r3 weak #1b)."""
    import scipy.sparse as sp
    jax, jnp, sec, h = _setup()
    from dmft_lanc_ed_tpu.ops.matvec import apply_h
    frag = _Frag(out_path)
    bw = measure_stream_bw(jax, jnp)
    frag["bw"] = bw
    if bw:
        log(f"measured stream bandwidth: {bw / 1e9:.1f} GB/s")
    v = jax.random.normal(jax.random.PRNGKey(0), (sec.dim_dw, sec.dim_up),
                          jnp.float64)
    v = v / jnp.linalg.norm(v)
    dt = bench_chain(jax, jnp, lambda x: apply_h(h, x), v, what="ell")
    if dt is not None:
        frag.time("ell", dt, h.nnz)
    # matvec-oracle gate (host CSR assembled from the same ELL tables)
    y_dev = np.asarray(jax.jit(apply_h)(h, v))
    vh = np.asarray(v)

    def factor_csr(cols, vals, n):
        cols = np.asarray(cols)
        rows = np.repeat(np.arange(n), cols.shape[1])
        m = sp.csr_matrix((np.asarray(vals, np.float64).ravel(),
                           (rows, cols.ravel())), shape=(n, n))
        m.eliminate_zeros()
        return m

    hup = factor_csr(h.up_cols, h.up_vals, sec.dim_up)
    hdw = factor_csr(h.dw_cols, h.dw_vals, sec.dim_dw)
    y_host = (vh @ hup.T) + (hdw @ vh) + np.asarray(h.diag, np.float64) * vh
    rel = float(np.linalg.norm(y_dev - y_host) / np.linalg.norm(y_host))
    frag.gate_matvec("ell", rel)


def phase_dense(out_path: str, e_ref):
    """Dense MXU chains (mixed/fast) + their accuracy gates."""
    jax, jnp, sec, h = _setup()
    from dmft_lanc_ed_tpu.ops.dense import (densify, matvec_dense_fast,
                                            matvec_dense_fast_flat,
                                            matvec_dense_flat,
                                            matvec_dense_mixed,
                                            matvec_dense_mixed_flat)
    from dmft_lanc_ed_tpu.ops.lanczos import lanczos_ground_state
    frag = _Frag(out_path)
    dop = densify(h)
    v = jax.random.normal(jax.random.PRNGKey(0), (sec.dim_dw, sec.dim_up),
                          jnp.float64)
    v = v / jnp.linalg.norm(v)
    dt = bench_chain(jax, jnp, lambda x: matvec_dense_mixed(dop, x), v,
                     what="dense_mixed")
    if dt is not None:
        frag.time("dense_mixed", dt, h.nnz)
    dt = bench_chain(jax, jnp, lambda x: matvec_dense_fast(dop, x), v,
                     what="dense_fast")
    if dt is not None:
        frag.time("dense_fast", dt, h.nnz)
    if e_ref is None:
        return
    for name, app, tol in [("dense_mixed", matvec_dense_mixed_flat, 3e-6),
                           ("dense_fast", matvec_dense_fast_flat, 3e-5)]:
        e, _ = lanczos_ground_state(dop, app, sec.dim, 1, ncv=48, tol=tol,
                                    polish_apply=matvec_dense_flat)
        frag.gate(name, float(e[0]), e_ref)


CHAIN_M = 8           # dependent chain-kernel launches fused into one jit
CHAIN_KS = (64, 128, 256)


def phase_pallas(out_path: str, e_ref):
    """Band-sparse fused kernels: chain timings + accuracy gates.

    Two timings: "pallas" is the fused chain-in-kernel Lanczos
    tridiagonalization (ops/bs_chain.py — K steps per pallas_call, chain
    state resident in VMEM, per-step HBM = 0), "pallas_call" the per-call
    kernel chain (ops/blocksparse.py — one launch per step, V streamed).

    Chain-kernel timing (the measurement that came out NEGATIVE in round 3):
    CHAIN_M data-dependent kernel launches are fused into ONE jit — one
    dispatch through the tunnel, M launches on device — so the timed span
    between K values is amplified M-fold relative to the ~24 ms dispatch
    noise; the slope is then an LSQ fit over three K values with the same
    rejection discipline as every other timing.

    Gates: the production two-stage path is run TWICE — once with the fused
    chain stage (gates "pallas") and once with the per-call kernel stage
    (use_chain=False; gates "pallas_call") — so each timed code path is
    gated by a run that actually exercised it (ADVICE r3 #2)."""
    jax, jnp, sec, h = _setup()
    from dmft_lanc_ed_tpu.diag import _blocksparse_ground_state
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.ops.blocksparse import (blocksparse_applicable,
                                                  build_blocksparse_op,
                                                  chain_step, to_padded)
    from dmft_lanc_ed_tpu.ops.bs_chain import tridiag_call, chain_applicable
    frag = _Frag(out_path)
    if not blocksparse_applicable(h):
        log("blocksparse not applicable to the bench sector")
        return
    op = build_blocksparse_op(h)
    log(f"blocksparse: w_dw={op.w_dw}, w_up={op.w_up} "
        f"(padded {op.padded_shape}), diag rank {op.diag_a.shape[1]}")
    frag["geom"] = {"w_dw": int(op.w_dw), "w_up": int(op.w_up),
                    "ddp": int(op.padded_shape[0]),
                    "dup": int(op.padded_shape[1]),
                    "diag_rank": int(op.diag_a.shape[1])}
    v = jax.random.normal(jax.random.PRNGKey(0), (sec.dim_dw, sec.dim_up),
                          jnp.float64)
    vp = to_padded(op, v / jnp.linalg.norm(v))

    if chain_applicable(op):
        def make_run(kk):
            @jax.jit
            def run(v0, salt):
                v = v0 * (jnp.float32(1.0) + jnp.float32(salt))
                al = None
                for _ in range(CHAIN_M):
                    al, _be = tridiag_call(op, v, kk)
                    # data dependency between launches (defeats CSE/hoisting
                    # of identical pure pallas_calls): rescale v0 by a factor
                    # that is exactly 1.0 at runtime but unknown to XLA
                    v = v0 * (jnp.float32(1.0) + jnp.float32(1e-30)
                              * al[0, 0])
                return al[0, 0] + 0.0 * al[kk - 1, 0]
            return run

        runs = {kk: make_run(kk) for kk in CHAIN_KS}
        for r in runs.values():
            _host_sync(r(vp, 0.0))

        def measure(kk):
            return _best_of(lambda s: runs[kk](vp, s), 4)

        # per-step floor: the kernel's own MXU speed-of-light (its state is
        # VMEM-resident so the vector-stream floor does not apply), with
        # FLOOR_SLACK headroom; amplified by the CHAIN_M launches per jit
        geom = frag.data["geom"]
        floor = CHAIN_M * (h.nnz / kernel_roofline_nnz_s(geom, h.nnz)) \
            / FLOOR_SLACK
        slope = robust_slope(measure, CHAIN_KS, what="pallas chain",
                             floor=floor)
        if slope is not None:
            frag.time("pallas", slope / CHAIN_M, h.nnz)

    dt = bench_chain_fused(jax, jnp, lambda w, r: chain_step(op, w, r), vp,
                           what="pallas_call")
    if dt is not None:
        frag.time("pallas_call", dt, h.nnz)
    if e_ref is None:
        return
    cfg = EDConfig(norb=NORB, nbath=NBATH, uloc=(2.0,), ed_dtype="float64")
    if chain_applicable(op):
        e, _ = _blocksparse_ground_state(cfg, op, sec.dim, 1, ncv=48,
                                         use_chain=True)
        frag.gate("pallas", float(e[0]), e_ref)
    e, _ = _blocksparse_ground_state(cfg, op, sec.dim, 1, ncv=48,
                                     use_chain=False)
    frag.gate("pallas_call", float(e[0]), e_ref)


# --------------------------------------------------------------------------
# parent orchestration
# --------------------------------------------------------------------------
def _run_phase(phase: str, out_path: str, extra=()):
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase,
           "--out", out_path, *extra]
    # one retry for a phase that dies leaving NO fragments at all: the
    # axon tunnel can stall a process at a random compile/dispatch after
    # heavy process churn (round-5 run: the ell phase hung before even
    # the stream probe; the probe alone re-ran fine) — a stall that
    # produced partial fragments is NOT retried (its timings survive)
    for attempt in range(2):
        log(f"--- phase {phase} (timeout {PHASE_TIMEOUT[phase]}s"
            + (", retry" if attempt else "") + ")")
        try:
            r = subprocess.run(cmd, timeout=PHASE_TIMEOUT[phase],
                               stdout=sys.stderr, stderr=sys.stderr)
            if r.returncode != 0:
                log(f"phase {phase}: exited rc={r.returncode} "
                    "(fragments up to the fault survive)")
        except subprocess.TimeoutExpired:
            log(f"phase {phase}: timed out (fragments up to the stall "
                "survive)")
        if os.path.exists(out_path):
            with open(out_path) as fh:
                data = json.load(fh)
            ok = (("e_ref" in data) if phase == "ref"
                  else bool(data.get("times") or data.get("gates")))
            if ok:
                return data
        if attempt == 0:
            log(f"phase {phase}: no fragments recorded — settling "
                f"{SETTLE_S}s and retrying once")
            time.sleep(SETTLE_S)
    if os.path.exists(out_path):
        with open(out_path) as fh:
            return json.load(fh)
    return {}


PEAK_BF16 = 1.97e14    # v5e bf16 MXU peak, FLOP/s


def kernel_roofline_nnz_s(geom, nnz):
    """Speed-of-light of the band-sparse kernel itself (BASELINE.md
    "Roofline re-derivation"): MXU-bound at 3-pass split-bf16 over both
    banded factor windows plus the rank-R diagonal product; the fused chain
    has ~zero per-step HBM so the MXU term is the binding one."""
    ddp, dup = geom["ddp"], geom["dup"]
    macs = ddp * dup * (geom["w_dw"] + geom["w_up"]) * 3 \
        + ddp * dup * geom["diag_rank"]
    t_mxu = 2.0 * macs / PEAK_BF16
    return nnz / t_mxu


def main():
    tmp = tempfile.mkdtemp(prefix="bench_")
    ref = _run_phase("ref", os.path.join(tmp, "ref.json"))
    e_ref = ref.get("e_ref")
    eref_args = ("--eref", repr(e_ref)) if e_ref is not None else ()

    times, gates, gate_kinds = {}, {}, {}
    bw = None
    geom = None
    for phase in ("ell", "dense", "pallas"):
        frag = _run_phase(phase, os.path.join(tmp, phase + ".json"),
                          eref_args if phase != "ell" else ())
        times.update(frag.get("times", {}))
        gates.update(frag.get("gates", {}))
        gate_kinds.update(frag.get("gate_kinds", {}))
        if phase == "ell":
            bw = frag.get("bw")
        if phase == "pallas":
            geom = frag.get("geom")
        log(f"settling the TPU tunnel for {SETTLE_S}s (process churn "
            "stalls it; see .claude/skills/verify)")
        time.sleep(SETTLE_S)

    nnz = ref.get("nnz") or 11099088
    dim = ref.get("dim") or 853776
    # roofline denominator: never below the v5e spec HBM bandwidth, so a
    # degraded tunnel-side measurement (202 GB/s observed round 3 vs the
    # 819 GB/s chip spec) cannot inflate vs_baseline across rounds
    bw = max(bw or 0.0, 8.19e11)

    def fail(msg):
        log(f"BENCH INVALID: {msg}")
        print(json.dumps({"metric": "sector_spmv_nnz_per_s", "value": 0.0,
                          "unit": "nnz/s", "vs_baseline": 0.0,
                          "error": msg}))

    # discard anything non-positive/non-finite (robust_slope should never
    # emit these; defense in depth so an invalid number can never win)
    times = {k: dt for k, dt in times.items()
             if np.isfinite(dt) and dt > 0.0}
    if not times:
        return fail("no backend produced a valid positive timing")

    # uniform accuracy gate: every headline candidate must have a recorded
    # gate below GATE_TOL — no exemptions (VERDICT r3) — and a KNOWN gate
    # kind ('energy' |dE| vs host ARPACK, or 'matvec' relative error vs the
    # host CSR — the ell case, where the on-chip f64 Lanczos crashes the
    # worker; the matvec error bounds the Rayleigh-quotient error). A timed
    # backend whose gate kind is unrecorded can never become the headline.
    for name in times:
        if name in gates and gate_kinds.get(name) not in ("energy",
                                                          "matvec"):
            return fail(f"gate kind of timed backend {name!r} is unknown "
                        f"({gate_kinds.get(name)!r}) — refusing to compare "
                        "gates of mixed/unknown quantities")
    eligible = {k: dt for k, dt in times.items()
                if gates.get(k, np.inf) < GATE_TOL}
    if not eligible:
        return fail(
            f"no timed backend passed the accuracy gate "
            f"(gates: { {k: f'{v:.2e}' for k, v in gates.items()} })")
    best_name = min(eligible, key=eligible.get)
    best = eligible[best_name]
    nnz_s = nnz / best
    if not (np.isfinite(nnz_s) and nnz_s > 0.0):
        return fail(f"headline value invalid: {nnz_s}")
    log(f"headline backend: {best_name} ({best * 1e3:.3f} ms/mv); "
        f"gates: { {k: f'{v:.2e}' for k, v in gates.items()} }")

    bytes_min = 2 * dim * 8
    roofline = nnz / (bytes_min / bw)
    vs = nnz_s / roofline
    out = {
        "metric": "sector_spmv_nnz_per_s",
        "value": round(nnz_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
        "backend": best_name,
        "gate_kind": gate_kinds.get(best_name),
    }
    log(f"streaming roofline {roofline / 1e9:.1f} Gnnz/s -> "
        f"fraction {vs:.4f}")
    if geom:
        kroof = kernel_roofline_nnz_s(geom, nnz)
        out["kernel_roofline_fraction"] = round(nnz_s / kroof, 4)
        log(f"band-sparse kernel roofline {kroof / 1e9:.1f} Gnnz/s -> "
            f"fraction {nnz_s / kroof:.4f}")
    print(json.dumps(out))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        import argparse
        p = argparse.ArgumentParser()
        p.add_argument("--phase", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--eref", default=None)
        a = p.parse_args()
        e_ref = float(a.eref) if a.eref else None
        if a.phase == "ref":
            phase_ref(a.out)
        elif a.phase == "ell":
            phase_ell(a.out)
        elif a.phase == "dense":
            phase_dense(a.out, e_ref)
        else:
            phase_pallas(a.out, e_ref)
    else:
        main()
