"""End-to-end DMFT benchmark matrix (VERDICT round-2 item 6).

Runs one warm DMFT iteration per BASELINE.json config class and records
wall-clock + phase breakdown (diag / gf / fit / observables), so later
rounds can measure regressions. Results stream into BENCH_MATRIX.json
incrementally (the TPU tunnel can drop mid-run; partial results survive).

Configs (BASELINE.md "configs" table):
  bethe4      1-orbital Bethe, nbath=4   (~4k-state sectors)
  bethe9      1-orbital Bethe, nbath=9   (~63k-state sectors, 121 sectors)
  hund2b      2-band Hubbard + Hund, square lattice, normal bath
  bhz_replica BHZ 2D topological, replica bath

Usage: python bench_matrix.py [config ...]   (default: all)
"""
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_MATRIX.json")
# backend override for A/B loop comparisons (ROUND3 item: drive a full DMFT
# loop with ed_backend=pallas and compare phase times vs the dense default);
# results record under "<config>_<backend>" when set
ED_BACKEND = os.environ.get("BENCH_ED_BACKEND", "")


def _cfg_kw():
    return {"ed_backend": ED_BACKEND} if ED_BACKEND else {}


def record(name, entry):
    # run-id stamp: BENCH_MATRIX.json persists across runs (and rounds), so
    # the retry sweep must distinguish "recorded by THIS run" from a stale
    # entry left by a previous one (ADVICE r4: a config that hung in sweep 0
    # was skipped by sweep 1 because its old entry looked present)
    if os.environ.get("BENCH_RUN_ID"):
        entry["run_id"] = os.environ["BENCH_RUN_ID"]
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data[name] = entry
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    log(f"[{name}] recorded: {entry}")


def _phases(res):
    t = res.timings
    return {k: round(t[k], 4) for k in
            ("diag", "gf", "observables", "sigma", "total") if k in t}


def _one_iteration(cfg, hloc, solver_cls, fit_fn, weiss_of):
    """Two solve+fit iterations; returns timings of the warm second one."""
    from dmft_lanc_ed_tpu.solver import matsubara_grid
    solver = solver_cls(cfg, hloc)
    bath = solver.init_bath()
    wm = matsubara_grid(cfg)
    out = {}
    for it in ("cold", "warm"):
        t0 = time.perf_counter()
        res = solver.solve(bath)
        t_solve = time.perf_counter() - t0
        weiss = weiss_of(res, 1j * wm)
        t1 = time.perf_counter()
        bath = fit_fn(cfg, weiss, bath, hloc)
        t_fit = time.perf_counter() - t1
        out[it] = dict(solve_s=round(t_solve, 3), fit_s=round(t_fit, 3),
                       loop_s=round(time.perf_counter() - t0, 3),
                       phases=_phases(res))
    out["egs"] = float(res.observables.egs)
    out["dens"] = [float(x) for x in res.observables.dens]
    return out


def bench_bethe(nbath):
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.dmft import bethe_bands, gloc_dos, self_consistency
    from dmft_lanc_ed_tpu.fit import chi2_fitgf
    from dmft_lanc_ed_tpu.solver import EDSolver

    cfg = EDConfig(norb=1, nbath=nbath, uloc=(2.0,), beta=100.0,
                   lmats=1024, lfit=256, lreal=64, cg_scheme="weiss",
                   **_cfg_kw())
    ebands, dbands, h0 = bethe_bands(1, 1.0)
    hloc = np.zeros((1, 1, 1, 1))

    def weiss_of(res, z):
        gloc = gloc_dos(ebands, dbands, h0, res.sigma_mats, z)
        return self_consistency(gloc, res.sigma_mats, hloc, z,
                                sctype=cfg.cg_scheme)
    return _one_iteration(cfg, hloc, EDSolver, chi2_fitgf, weiss_of)


def bench_hund2b():
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.dmft import self_consistency
    from dmft_lanc_ed_tpu.dmft.gloc import gloc_hk
    from dmft_lanc_ed_tpu.dmft.hk import hk_square, hloc_from_hk
    from dmft_lanc_ed_tpu.fit import chi2_fitgf
    from dmft_lanc_ed_tpu.solver import EDSolver

    cfg = EDConfig(norb=2, nspin=1, nbath=2, uloc=(2.0, 2.0), ust=1.2,
                   jh=0.4, jx=0.4, jp=0.4, beta=100.0, lmats=1024,
                   lfit=256, lreal=64, cg_scheme="weiss", **_cfg_kw())
    hk = hk_square(16, 2, t=0.25)
    hloc = hloc_from_hk(hk, 1, 2)

    def weiss_of(res, z):
        gloc = gloc_hk(hk, res.sigma_mats, z)
        return self_consistency(gloc, res.sigma_mats, hloc, z,
                                sctype=cfg.cg_scheme)
    return _one_iteration(cfg, hloc, EDSolver, chi2_fitgf, weiss_of)


def bench_bhz_replica():
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.dmft import self_consistency
    from dmft_lanc_ed_tpu.dmft.gloc import gloc_hk
    from dmft_lanc_ed_tpu.dmft.hk import hk_bhz_2d, hloc_from_hk
    from dmft_lanc_ed_tpu.fit import chi2_fitgf
    from dmft_lanc_ed_tpu.hloc import decompose_hloc
    from dmft_lanc_ed_tpu.solver import EDSolver

    cfg = EDConfig(norb=2, nspin=2, nbath=4, uloc=(2.0, 2.0), ust=1.0,
                   beta=100.0, lmats=1024, lfit=256, lreal=64,
                   bath_type="replica", cg_scheme="weiss",
                   lanc_dim_threshold=2048, **_cfg_kw())
    hk = hk_bhz_2d(16, m0=1.0, lam=0.3, t=0.5)
    hloc = hloc_from_hk(hk, 2, 2)
    h_basis, lam_imp = decompose_hloc(cfg, hloc)

    class _Solver:
        def __init__(self, cfg, hloc):
            from dmft_lanc_ed_tpu.solver import EDSolver
            self._s = EDSolver(cfg, hloc, h_basis=h_basis,
                               lambda_imp=lam_imp)
            self.init_bath = self._s.init_bath
            self.solve = self._s.solve

    def fit_fn(cfg, weiss, bath, hloc):
        return chi2_fitgf(cfg, weiss, bath, hloc, h_basis=h_basis)

    def weiss_of(res, z):
        gloc = gloc_hk(hk, res.sigma_mats, z)
        return self_consistency(gloc, res.sigma_mats, hloc, z,
                                sctype=cfg.cg_scheme)
    return _one_iteration(cfg, hloc, _Solver, fit_fn, weiss_of)


def bench_gs854k():
    """Backend A/B on the workload the backends differ on: a full warm
    ground-state solve of the 854k bench sector (nbath=11), production
    pallas path (_blocksparse_ground_state: fused chain seed + mixed
    top-off skip + f64 polish) vs the dense MXU path (thick-restart
    mixed Lanczos + f64 polish). VERDICT r3 item 3's "pallas beats dense
    in a full solve" evidence — the four DMFT configs above never reach
    the serial big-sector path (their largest sector is 63.5k, under
    ed_batch_dim_max)."""
    import jax.numpy as jnp
    from dmft_lanc_ed_tpu.config import EDConfig
    from dmft_lanc_ed_tpu.diag import _blocksparse_ground_state, _lanc_tol
    from dmft_lanc_ed_tpu.bath import init_bath
    from dmft_lanc_ed_tpu.sectors import SectorTable, qn
    from dmft_lanc_ed_tpu.ops.blocksparse import build_blocksparse_op
    from dmft_lanc_ed_tpu.ops.dense import (build_dense_op,
                                            matvec_dense_flat,
                                            matvec_dense_mixed_flat)
    from dmft_lanc_ed_tpu.ops.lanczos import lanczos_ground_state

    cfg = EDConfig(norb=1, nbath=11, uloc=(2.0,), ed_dtype="float64")
    sec = SectorTable(cfg).sector(qn(6, 6))
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
    h = build_sector_hamiltonian(cfg, sec, hloc, bath)
    out = {"dim": sec.dim}

    bs_op = build_blocksparse_op(h)
    for it in ("cold", "warm"):
        t0 = time.perf_counter()
        e_p, _ = _blocksparse_ground_state(cfg, bs_op, sec.dim, 1, ncv=48)
        out[f"pallas_{it}_s"] = round(time.perf_counter() - t0, 3)
    out["pallas_egs"] = float(e_p[0])

    dop = build_dense_op(cfg, sec, hloc, bath)
    for it in ("cold", "warm"):
        t0 = time.perf_counter()
        e_d, _ = lanczos_ground_state(
            dop, matvec_dense_mixed_flat, sec.dim, 1, ncv=48, tol=3e-6,
            polish_apply=matvec_dense_flat)
        out[f"dense_{it}_s"] = round(time.perf_counter() - t0, 3)
    out["dense_egs"] = float(e_d[0])
    out["egs_diff"] = abs(out["pallas_egs"] - out["dense_egs"])
    return out


BENCHES = {
    "bethe4": lambda: bench_bethe(4),
    "bethe9": lambda: bench_bethe(9),
    "hund2b": bench_hund2b,
    "bhz_replica": bench_bhz_replica,
    "gs854k": bench_gs854k,
}


def run_one(name):
    import faulthandler
    faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
    import jax
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    log(f"=== {name} ===")
    t0 = time.perf_counter()
    entry = BENCHES[name]()
    entry["platform"] = dev.platform
    if ED_BACKEND:
        entry["ed_backend"] = ED_BACKEND
    entry["bench_wall_s"] = round(time.perf_counter() - t0, 1)
    record(name + ("_" + ED_BACKEND if ED_BACKEND else ""), entry)


def main():
    """Parent: one subprocess per config with settle pauses (round-3
    harness discipline — a tunnel stall/fault in one config cannot void the
    others; BENCH_MATRIX.json accumulates incrementally either way)."""
    import subprocess
    names = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or list(BENCHES)
    settle = int(os.environ.get("BENCH_SETTLE_S", "75"))
    timeout_s = int(os.environ.get("BENCH_MATRIX_TIMEOUT_S", "2400"))
    run_id = os.environ.setdefault("BENCH_RUN_ID",
                                   time.strftime("%Y%m%d-%H%M%S"))

    def one(name):
        cmd = [sys.executable, os.path.abspath(__file__), "--one", name]
        log(f"--- config {name} (timeout {timeout_s}s)")
        try:
            r = subprocess.run(cmd, timeout=timeout_s, stdout=sys.stderr,
                               stderr=sys.stderr)
            if r.returncode != 0:
                log(f"{name}: exited rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"{name}: timed out")

    def recorded():
        """Names recorded BY THIS RUN (stale entries from previous runs do
        not count — ADVICE r4)."""
        if not os.path.exists(OUT):
            return set()
        with open(OUT) as fh:
            data = json.load(fh)
        return {k for k, v in data.items()
                if isinstance(v, dict) and v.get("run_id") == run_id}

    # two sweeps: the axon tunnel can hang a run at a random device_put /
    # compile (.claude/skills/verify "expect to retry once"). Sweep 0 runs
    # every requested config (re-recording over stale entries); sweep 1
    # retries only configs that still have no entry (lost to a hang).
    for sweep in range(2):
        if sweep == 0:
            todo = list(names)
        else:
            todo = [n for n in names
                    if (n + ("_" + ED_BACKEND if ED_BACKEND else ""))
                    not in recorded()]
            if not todo:
                break
            log(f"retry sweep for configs lost to tunnel hangs: {todo}")
        for i, name in enumerate(todo):
            one(name)
            if i + 1 < len(todo) or sweep == 0:
                log(f"settling the TPU tunnel for {settle}s")
                time.sleep(settle)
    if os.path.exists(OUT):
        with open(OUT) as fh:
            log("BENCH_MATRIX.json:", json.dumps(json.load(fh)))


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
