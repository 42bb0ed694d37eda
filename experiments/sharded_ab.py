"""Sharded-solve crossover A/B (VERDICT r4 item 5).

Measures the three ground-state solve paths on a CPU device mesh (the one
real chip cannot host a mesh; CPU wall-clock is the accepted proxy — the
DISPATCH POLICY, which is what this experiment pins down, is
platform-independent):

  serial_pallas   single-chip two-stage band-sparse solve
                  (diag._blocksparse_ground_state, interpret mode)
  sharded_dense   dw-sharded dense-factor thick-restart Lanczos
                  (parallel.production.shard_dense_op)
  sharded_bs      dw-sharded band-sparse fused solve
                  (parallel.bs_sharded.bs_sharded_ground_state)

Two sectors:
  nbath=10 (5,5)  213k states — ALL THREE paths apply (the bs halo
                  constraint holds at n=2): the measured crossover.
  nbath=12 (6,6)  2.9M states — above the single-chip VMEM gate AND the
                  per-device bs VMEM gate (halo'd window at d_dw=4): the
                  production answer is sharded dense/direct, and the
                  experiment records the gate REASONS alongside.

Usage: python experiments/sharded_ab.py     (CPU; ~5-10 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import dmft_lanc_ed_tpu as ed
from dmft_lanc_ed_tpu.diag import _blocksparse_ground_state, _lanc_tol
from dmft_lanc_ed_tpu.ops.blocksparse import (blocksparse_applicable,
                                              build_blocksparse_op)
from dmft_lanc_ed_tpu.ops.lanczos import lanczos_ground_state
from dmft_lanc_ed_tpu.parallel.bs_sharded import (blocksparse_shardable,
                                                  bs_sharded_ground_state)
from dmft_lanc_ed_tpu.parallel.mesh import make_mesh
from dmft_lanc_ed_tpu.parallel.production import shard_dense_op
from dmft_lanc_ed_tpu.ops.dense import build_dense_op


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_sector(nbath, nup, ndw, n_dev):
    cfg = ed.read_input(None, norb=1, nbath=nbath, uloc=(2.0,))
    sec = ed.SectorTable(cfg).sector(ed.qn(nup, ndw))
    bath = ed.init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    h = ed.build_sector_hamiltonian(cfg, sec, hloc, bath)
    log(f"--- nbath={nbath} ({nup},{ndw}): dim={sec.dim}")
    results = {}

    ok_serial = blocksparse_applicable(h)
    log(f"  single-chip bs gate: {'ok' if ok_serial else 'VMEM-gated out'}")
    if ok_serial:
        op = build_blocksparse_op(h)
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            e_s, _ = _blocksparse_ground_state(cfg, op, sec.dim, 1, ncv=32)
            results[f"serial_pallas_{tag}"] = time.perf_counter() - t0
        results["serial_pallas_egs"] = float(e_s[0])

    why = blocksparse_shardable(h, n_dev)
    log(f"  sharded bs gate (n={n_dev}): {why or 'ok'}")
    if why is None:
        op = build_blocksparse_op(h)
        mesh = make_mesh(n_dev)
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            e_b, _ = bs_sharded_ground_state(cfg, op, mesh, 1, ncv=32)
            results[f"sharded_bs_{tag}"] = time.perf_counter() - t0
        results["sharded_bs_egs"] = float(e_b[0])

    mesh = make_mesh(n_dev)
    dop = build_dense_op(cfg, sec, hloc, bath)
    sop = shard_dense_op(dop, mesh, cfg)
    v0 = sop.pad_flat(jnp.asarray(
        np.random.default_rng(17).standard_normal(sec.dim)))
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        e_d, _ = lanczos_ground_state(
            sop.op, sop.apply_nd, int(np.prod(sop.vshape)), 1, ncv=32,
            tol=max(_lanc_tol(cfg), 3e-6), v0=v0, vshape=sop.vshape,
            sharding=sop.sharding, polish_apply=sop.exact_nd)
        results[f"sharded_dense_{tag}"] = time.perf_counter() - t0
    results["sharded_dense_egs"] = float(e_d[0])

    for k, v in sorted(results.items()):
        log(f"  {k:22s} {v:.6g}")
    return results


def main():
    out = {}
    out["213k_n2"] = run_sector(10, 5, 5, 2)
    out["2.9M_n8"] = run_sector(12, 6, 6, 8)
    import json
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
