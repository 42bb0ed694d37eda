"""A/B the zero-tile trim structures for the per-call fused kernel (round 5).

The full per-tile trim (dynamic-bound fori over SMEM tile lists, both
sides) measured 82.3 us/mv vs the untrimmed kernel's 54 us/mv — the tiny
[128,128] dots in dynamic loops stall the MXU pipeline more than the
27.5% skipped zero-tiles save. Variants measured here:

  untrimmed   the round-4 kernel restated (single [128,W]@[W,dup] dw dot,
              8 static [128,W]@[W,128] up dots)
  dwtrim      dw side per-tile dynamic loop ([128,128]@[128,1024] dots,
              N=1024 keeps the MXU busy), up side untrimmed
  dwtrim_s    dw side per-tile with STATIC bound (max cnt) + pl.when-free
              masked accumulate? -- skipped; static bound = no savings
  uptrim      up side per-tile dynamic loops (N=128 tiny dots), dw
              untrimmed -- isolates the tiny-dot cost
  both        both sides trimmed (the regressed form)

Usage: python experiments/trim_ab.py   (on the TPU; ~4 min)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dmft_lanc_ed_tpu as ed
from dmft_lanc_ed_tpu.ops.blocksparse import (VMEM_LIMIT, _dot3,
                                              build_blocksparse_op,
                                              to_padded)

_HIGHEST = jax.lax.Precision.HIGHEST


def _tables_from_runs(pop):
    """(cnt, lst) SMEM tables reconstructed from the op's static trim runs
    (the production op stores only the runs; the dynamic-variant probes
    here need the flat tile lists)."""
    dw_runs, up_runs = pop._trim_runs

    def expand(runs_tup, ntw):
        nt = len(runs_tup)
        cnt = np.zeros((nt, 1), np.int32)
        lst = np.zeros((nt, ntw), np.int32)
        for i, runs in enumerate(runs_tup):
            k = 0
            for (r0, r1) in runs:
                for wt in range(r0, r1):
                    lst[i, k] = wt
                    k += 1
            cnt[i, 0] = k
        return jnp.asarray(cnt), jnp.asarray(lst)

    dwc, dwl = expand(dw_runs, pop.w_dw // 128)
    upc, upl = expand(up_runs, pop.w_up // 128)
    return dwc, dwl, upc, upl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_variant(op, mode):
    pop = op.pop
    d_dw, w_dw, d_up, w_up = pop.d_dw, pop.w_dw, pop.d_up, pop.w_up
    ddp, dup = pop.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    trim_dw = mode in ("dwtrim", "both")
    trim_up = mode in ("uptrim", "both")
    trim_tables = _tables_from_runs(pop)

    def kernel(scale_ref, v_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
               a_ref, b_ref, dwc_ref, dwl_ref, upc_ref, upl_ref,
               out_ref, ss_ref):
        i = pl.program_id(0)
        t_tile = jnp.minimum(jnp.maximum(i - d_dw, 0), (ddp - w_dw) // 128)
        v_blk = v_ref[pl.ds(i * 128, 128), :]
        diag_panel = jnp.dot(a_ref[pl.ds(i * 128, 128), :], b_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=_HIGHEST)
        acc = diag_panel * v_blk
        if trim_dw:
            def dw_body(k, acc):
                wt = dwl_ref[i, k]
                wrow = v_ref[pl.ds((t_tile + wt) * 128, 128), :]
                w_hi = wrow.astype(jnp.bfloat16)
                w_lo = (wrow - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                return acc + _dot3(dwhi_ref[0, :, pl.ds(wt * 128, 128)],
                                   dwlo_ref[0, :, pl.ds(wt * 128, 128)],
                                   w_hi, w_lo)
            acc = jax.lax.fori_loop(0, dwc_ref[i, 0], dw_body, acc)
        else:
            vw = v_ref[pl.ds(t_tile * 128, w_dw), :]
            vw_hi = vw.astype(jnp.bfloat16)
            vw_lo = (vw - vw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + _dot3(dwhi_ref[0], dwlo_ref[0], vw_hi, vw_lo)
        if trim_up:
            up_parts = []
            for j in range(ntu):
                s_t = min(max(j - d_up, 0), (dup - w_up) // 128)

                def up_body(k, accj, _j=j, _s=s_t):
                    wt = upl_ref[_j, k]
                    vb = v_ref[pl.ds(i * 128, 128),
                               pl.ds((_s + wt) * 128, 128)]
                    vb_hi = vb.astype(jnp.bfloat16)
                    vb_lo = (vb - vb_hi.astype(jnp.float32)) \
                        .astype(jnp.bfloat16)
                    return accj + _dot3(vb_hi, vb_lo,
                                        uphi_ref[_j, pl.ds(wt * 128, 128), :],
                                        uplo_ref[_j, pl.ds(wt * 128, 128), :])
                up_parts.append(jax.lax.fori_loop(
                    0, upc_ref[j, 0], up_body,
                    jnp.zeros((128, 128), jnp.float32)))
            acc = acc + jnp.concatenate(up_parts, axis=1)
        else:
            vb_hi = v_blk.astype(jnp.bfloat16)
            vb_lo = (v_blk - vb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            up_parts = []
            for j in range(ntu):
                s = min(max((j - d_up) * 128, 0), dup - w_up)
                up_parts.append(_dot3(vb_hi[:, s:s + w_up],
                                      vb_lo[:, s:s + w_up],
                                      uphi_ref[j], uplo_ref[j]))
            acc = acc + jnp.concatenate(up_parts, axis=1)
        acc = acc * scale_ref[0, 0]
        out_ref[:] = acc
        ss_ref[i, 0] = jnp.sum(acc * acc)

    rp = pop.diag_a.shape[1]
    ntwd, ntwu = w_dw // 128, w_up // 128

    @jax.jit
    def call(v32p, scale):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(ntd,),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((ddp, dup), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128, w_dw), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128, w_dw), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ntu, w_up, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ntu, w_up, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ddp, rp), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rp, dup), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ntd, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((ntd, ntwd), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((ntu, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((ntu, ntwu), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((128, dup), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ntd, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((ddp, dup), jnp.float32),
                    jax.ShapeDtypeStruct((ntd, 1), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
            )(scale.reshape(1, 1).astype(jnp.float32), v32p, pop.dw_hi,
              pop.dw_lo, pop.up_hi, pop.up_lo, pop.diag_a, pop.diag_b,
              *trim_tables)
    return call


def _runs(cnt_row, lst_row):
    """Contiguous runs of nonzero window tiles, e.g. {0,2,3} -> [(0,1),(2,4)]."""
    tiles = sorted(int(lst_row[k]) for k in range(int(cnt_row)))
    runs = []
    for t in tiles:
        if runs and t == runs[-1][1]:
            runs[-1] = (runs[-1][0], t + 1)
        else:
            runs.append((t, t + 1))
    return runs


def make_static_runs(op):
    """No-grid kernel: panels python-unrolled, per-panel STATIC contiguous
    runs of nonzero window tiles — every zero tile skipped with large
    static dots and zero dynamic control flow. Keys per sector (the trim
    runs are compile-time constants), which is fine for the per-call
    kernel's uses (bench + rare non-chain stage-1)."""
    pop = op.pop
    d_dw, w_dw, d_up, w_up = pop.d_dw, pop.w_dw, pop.d_up, pop.w_up
    ddp, dup = pop.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    dw_runs, up_runs = pop._trim_runs

    def kernel(scale_ref, v_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
               a_ref, b_ref, out_ref, ss_ref):
        sc = scale_ref[0, 0]
        for i in range(ntd):
            t = min(max((i - d_dw), 0), (ddp - w_dw) // 128)
            v_blk = v_ref[i * 128:(i + 1) * 128, :]
            diag_panel = jnp.dot(a_ref[i * 128:(i + 1) * 128, :], b_ref[:],
                                 preferred_element_type=jnp.float32,
                                 precision=_HIGHEST)
            acc = diag_panel * v_blk
            for (r0, r1) in dw_runs[i]:
                vw = v_ref[(t + r0) * 128:(t + r1) * 128, :]
                vw_hi = vw.astype(jnp.bfloat16)
                vw_lo = (vw - vw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + _dot3(
                    dwhi_ref[i * 128:(i + 1) * 128, r0 * 128:r1 * 128],
                    dwlo_ref[i * 128:(i + 1) * 128, r0 * 128:r1 * 128],
                    vw_hi, vw_lo)
            vb_hi = v_blk.astype(jnp.bfloat16)
            vb_lo = (v_blk - vb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            up_parts = []
            for j in range(ntu):
                s = min(max((j - d_up) * 128, 0), dup - w_up)
                pj = jnp.zeros((128, 128), jnp.float32)
                for (r0, r1) in up_runs[j]:
                    pj = pj + _dot3(
                        vb_hi[:, s + r0 * 128:s + r1 * 128],
                        vb_lo[:, s + r0 * 128:s + r1 * 128],
                        uphi_ref[j, r0 * 128:r1 * 128, :],
                        uplo_ref[j, r0 * 128:r1 * 128, :])
                up_parts.append(pj)
            acc = acc + jnp.concatenate(up_parts, axis=1)
            acc = acc * sc
            out_ref[i * 128:(i + 1) * 128, :] = acc
            ss_ref[i, 0] = jnp.sum(acc * acc)

    rp = pop.diag_a.shape[1]
    dwhi2 = pop.dw_hi.reshape(ntd * 128, w_dw)
    dwlo2 = pop.dw_lo.reshape(ntd * 128, w_dw)

    @jax.jit
    def call(v32p, scale):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((ddp, dup), jnp.float32),
                    jax.ShapeDtypeStruct((ntd, 1), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=int(15.8 * 1024 * 1024)),
            )(scale.reshape(1, 1).astype(jnp.float32), v32p, dwhi2, dwlo2,
              pop.up_hi, pop.up_lo, pop.diag_a, pop.diag_b)
    return call


def main():
    cfg = ed.read_input(None, norb=1, nbath=11, uloc=(2.0,))
    sec = ed.SectorTable(cfg).sector(ed.qn(6, 6))
    h = ed.build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)),
                                    ed.init_bath(cfg))
    op = build_blocksparse_op(h)
    v = jax.random.normal(jax.random.PRNGKey(0), (sec.dim_dw, sec.dim_up),
                          jnp.float64)
    vp = to_padded(op, v / jnp.linalg.norm(v))
    NS = (200, 700, 1200)

    for mode in ("untrimmed", "static_runs"):
        call = (make_static_runs(op) if mode == "static_runs"
                else make_variant(op, mode))

        def make_run(n):
            @jax.jit
            def run(v, salt):
                def step(carry, _):
                    w, r = carry
                    y, ss = call(w, r)
                    return (y, jax.lax.rsqrt(jnp.sum(ss) + 1e-30)), None
                (out, _), _ = jax.lax.scan(
                    step, (v * (jnp.float32(1.0) + jnp.float32(salt)),
                           jnp.float32(1.0)), None, length=n)
                return out.ravel()[0]
            return run

        runs = {n: make_run(n) for n in NS}
        try:
            for n in NS:
                float(np.asarray(runs[n](vp, 0.0)))
        except Exception as e:
            log(f"{mode}: compile failed: {str(e)[:200]}")
            continue
        ts = {}
        for n in NS:
            best = 1e30
            for i in range(3):
                t0 = time.perf_counter()
                float(np.asarray(runs[n](vp, 1e-9 * (i + 1))))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        a = np.vstack([np.array(NS, float), np.ones(3)]).T
        slope = np.linalg.lstsq(a, np.array([ts[n] for n in NS]),
                                rcond=None)[0][0]
        log(f"{mode:10s}: {slope * 1e6:7.1f} us/mv -> "
            f"{h.nnz / slope / 1e9:6.1f} Gnnz/s  "
            f"(t={['%.4f' % ts[n] for n in NS]})")


if __name__ == "__main__":
    main()
