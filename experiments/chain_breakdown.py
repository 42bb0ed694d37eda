"""Where do the fused chain kernel's 56 us/step go? (round-4 probe)

Measured (bench r04): chain step = 56.3 us vs the 40.9 us MXU speed-of-
light of its 3-pass split-bf16 band geometry — a ~15 us/step gap. Two
candidate costs: (a) VPU casts — every VMEM window read re-casts
f32->bf16 hi/lo (~12M element-casts/step); (b) the orthogonalization
sweep (p1) over the planes.

Timed variants (TIMING ONLY — bf16pair/nop1 run with unseeded planes):
  3pass    the production kernel restated here (reference point)
  1pass    _dot3 replaced by a single bf16 dot (isolates the MXU share)
  bf16pair planes stored as bf16 hi/lo pairs (same bytes as f32): window
           reads feed the MXU directly, casts only on write — the
           candidate v3 design
  nop1     p1's write-back skipped (dot+norm kept)

Usage: python experiments/chain_breakdown.py   (on the TPU; ~3 min)
Result (2026-08-20, v5e): see ROUND4_NOTES.md.
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
from dmft_lanc_ed_tpu.ops.blocksparse import (build_blocksparse_op,
                                              to_padded, _dot3)
from dmft_lanc_ed_tpu.ops import bs_chain as bsc

_HIGHEST = jax.lax.Precision.HIGHEST
D, SS, SPRV, SCUR, BETA = range(5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _tile_masks(op):
    """Host: which 128x128 tiles inside the band windows are nonzero."""
    ddp, dup = op.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    ntw_d, ntw_u = op.w_dw // 128, op.w_up // 128
    dw = np.abs(np.asarray(op.dw_hi, np.float32)).reshape(ntd, 128, op.w_dw) \
        + np.abs(np.asarray(op.dw_lo, np.float32)).reshape(ntd, 128, op.w_dw)
    up = np.abs(np.asarray(op.up_hi, np.float32)) \
        + np.abs(np.asarray(op.up_lo, np.float32))        # [ntu, w_up, 128]
    dwm = np.zeros((ntd, ntw_d), np.int32)
    upm = np.zeros((ntu, ntw_u), np.int32)
    for i in range(ntd):
        for wt in range(ntw_d):
            dwm[i, wt] = dw[i, :, wt * 128:(wt + 1) * 128].max() > 0
    for j in range(ntu):
        for wt in range(ntw_u):
            upm[j, wt] = up[j, wt * 128:(wt + 1) * 128, :].max() > 0
    return jnp.asarray(dwm), jnp.asarray(upm)


def make_variant(op, mode):
    d_dw, w_dw, d_up, w_up = op.d_dw, op.w_dw, op.d_up, op.w_up
    ddp, dup = op.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    bf16pair = mode == "bf16pair"
    tileskip = mode == "tileskip"

    def dots(xh, xl, ah, al):
        if mode == "1pass":
            return jnp.dot(xh, ah, preferred_element_type=jnp.float32)
        return _dot3(xh, xl, ah, al)

    def kernel(v0_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref, a_ref, b_ref,
               *rest, kk):
        if tileskip:
            dwm_ref, upm_ref, alphas_ref, betas_ref, *bufs = rest
        else:
            dwm_ref = upm_ref = None
            alphas_ref, betas_ref, *bufs = rest
        if bf16pair:
            vhi, vlo, st, sem = bufs
        else:
            (vbuf, st, sem) = bufs
        k = pl.program_id(0)
        cur = jax.lax.rem(k, 2)
        prv = 1 - cur

        @pl.when(k == 0)
        def _():
            if not bf16pair:
                dma = pltpu.make_async_copy(v0_ref, vbuf.at[0], sem)
                dma.start()
                dma.wait()
            st[D] = 0.0
            st[SS] = 0.0
            st[SPRV] = 0.0
            st[SCUR] = 1.0
            st[BETA] = 0.0

        coup = st[BETA] * st[SPRV]
        s_cur = st[SCUR]

        def read_f32(buf_sel, i0, nrows):
            if bf16pair:
                return (vhi[buf_sel, pl.ds(i0, nrows), :].astype(jnp.float32)
                        + vlo[buf_sel, pl.ds(i0, nrows), :]
                        .astype(jnp.float32))
            return vbuf[buf_sel, pl.ds(i0, nrows), :]

        def write_split(buf_sel, i0, w):
            if bf16pair:
                w_hi = w.astype(jnp.bfloat16)
                vhi[buf_sel, pl.ds(i0, 128), :] = w_hi
                vlo[buf_sel, pl.ds(i0, 128), :] = \
                    (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            else:
                vbuf[buf_sel, pl.ds(i0, 128), :] = w

        def p0(i, _):
            base_t = jnp.minimum(jnp.maximum(i - d_dw, 0),
                                 (ddp - w_dw) // 128)
            if bf16pair:
                vb_hi = vhi[cur, pl.ds(i * 128, 128), :]
                vb_lo = vlo[cur, pl.ds(i * 128, 128), :]
                v_blk = vb_hi.astype(jnp.float32) \
                    + vb_lo.astype(jnp.float32)
            else:
                v_blk = vbuf[cur, pl.ds(i * 128, 128), :]
                vb_hi = v_blk.astype(jnp.bfloat16)
                vb_lo = (v_blk - vb_hi.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
            diag_panel = jnp.dot(a_ref[pl.ds(i * 128, 128), :], b_ref[:],
                                 preferred_element_type=jnp.float32,
                                 precision=_HIGHEST)
            acc = diag_panel * v_blk
            for wt in range(w_dw // 128):
                if bf16pair:
                    w_hi = vhi[cur, pl.ds((base_t + wt) * 128, 128), :]
                    w_lo = vlo[cur, pl.ds((base_t + wt) * 128, 128), :]
                else:
                    wrow = vbuf[cur, pl.ds((base_t + wt) * 128, 128), :]
                    w_hi = wrow.astype(jnp.bfloat16)
                    w_lo = (wrow - w_hi.astype(jnp.float32)) \
                        .astype(jnp.bfloat16)
                if tileskip:
                    def dw_do(a, _wt=wt, _w_hi=w_hi, _w_lo=w_lo, _i=i):
                        return a + dots(
                            dwhi_ref[pl.ds(_i * 128, 128),
                                     _wt * 128:(_wt + 1) * 128],
                            dwlo_ref[pl.ds(_i * 128, 128),
                                     _wt * 128:(_wt + 1) * 128],
                            _w_hi, _w_lo)
                    acc = jax.lax.cond(dwm_ref[i, wt] > 0, dw_do,
                                       lambda a: a, acc)
                else:
                    acc = acc + dots(
                        dwhi_ref[pl.ds(i * 128, 128),
                                 wt * 128:(wt + 1) * 128],
                        dwlo_ref[pl.ds(i * 128, 128),
                                 wt * 128:(wt + 1) * 128],
                        w_hi, w_lo)
            up_parts = []
            for j in range(ntu):
                s = min(max((j - d_up) * 128, 0), dup - w_up)
                if tileskip:
                    part = jnp.zeros((128, 128), jnp.float32)
                    for wt in range(w_up // 128):
                        def up_do(a, _j=j, _wt=wt, _s=s):
                            return a + dots(
                                vb_hi[:, _s + _wt * 128:_s + (_wt + 1) * 128],
                                vb_lo[:, _s + _wt * 128:_s + (_wt + 1) * 128],
                                uphi_ref[_j, _wt * 128:(_wt + 1) * 128, :],
                                uplo_ref[_j, _wt * 128:(_wt + 1) * 128, :])
                        part = jax.lax.cond(upm_ref[j, wt] > 0, up_do,
                                            lambda a: a, part)
                    up_parts.append(part)
                else:
                    up_parts.append(dots(vb_hi[:, s:s + w_up],
                                         vb_lo[:, s:s + w_up],
                                         uphi_ref[j], uplo_ref[j]))
            acc = acc + (up_parts[0] if ntu == 1
                         else jnp.concatenate(up_parts, axis=1))
            y = s_cur * acc
            st[D] += jnp.sum(v_blk * y)

            @pl.when(k > 0)
            def _():
                write_split(prv, i * 128,
                            y - coup * read_f32(prv, i * 128, 128))

            @pl.when(k == 0)
            def _():
                write_split(prv, i * 128, y)
            return 0

        jax.lax.fori_loop(0, ntd, p0, 0)
        alpha = s_cur * st[D]
        alphas_ref[k, 0] = alpha
        st[D] = 0.0
        co = alpha * s_cur

        def p1(i, _):
            w = read_f32(prv, i * 128, 128) \
                - co * read_f32(cur, i * 128, 128)
            if mode != "nop1":
                write_split(prv, i * 128, w)
            st[SS] += jnp.sum(w * w)
            return 0

        jax.lax.fori_loop(0, ntd, p1, 0)
        beta = jnp.sqrt(st[SS])
        betas_ref[k, 0] = beta
        st[SPRV] = st[SCUR]
        st[SCUR] = jnp.where(beta > 1e-30, 1.0 / beta, 0.0)
        st[BETA] = beta
        st[SS] = 0.0

    if bf16pair:
        scratch = [pltpu.VMEM((2, ddp, dup), jnp.bfloat16),
                   pltpu.VMEM((2, ddp, dup), jnp.bfloat16),
                   pltpu.SMEM((8,), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    else:
        scratch = [pltpu.VMEM((2, ddp, dup), jnp.float32),
                   pltpu.SMEM((8,), jnp.float32),
                   pltpu.SemaphoreType.DMA]

    extra_specs, extra_inputs = [], ()
    if tileskip:
        dwm, upm = _tile_masks(op)
        extra_specs = [
            pl.BlockSpec((ntd, w_dw // 128), lambda *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ntu, w_up // 128), lambda *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        extra_inputs = (dwm, upm)

    @partial(jax.jit, static_argnames=("kk",))
    def call(v32p, kk):
        with jax.enable_x64(False):
            kern = partial(kernel, kk=kk)
            return pl.pallas_call(
                kern,
                grid=(kk,),
                in_specs=bsc._chain_specs(op, ddp, dup) + extra_specs,
                out_specs=[
                    pl.BlockSpec((kk, 1), lambda *_: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((kk, 1), lambda *_: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((kk, 1), jnp.float32),
                    jax.ShapeDtypeStruct((kk, 1), jnp.float32),
                ],
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=bsc.CHAIN_VMEM_LIMIT),
            )(*bsc._chain_inputs(op, v32p), *extra_inputs)
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
    M = 8
    for mode in ("3pass", "tileskip"):
        call = make_variant(op, mode)

        def make_run(kk):
            @jax.jit
            def run(v0, salt):
                vv = v0 * (jnp.float32(1.0) + jnp.float32(salt))
                al = None
                for _ in range(M):
                    al, _ = call(vv, kk)
                    vv = v0 * (jnp.float32(1.0)
                               + jnp.float32(1e-30) * al[0, 0])
                return al[0, 0]
            return run

        runs = {kk: make_run(kk) for kk in (64, 256)}
        try:
            for r in runs.values():
                np.asarray(r(vp, 0.0))
        except Exception as e:
            log(f"{mode}: compile/run failed: {str(e)[:300]}")
            continue
        ts = {}
        for kk in (64, 256):
            best = 1e30
            for i in range(4):
                t0 = time.perf_counter()
                np.asarray(runs[kk](vp, 1e-7 * (i + 1)))
                best = min(best, time.perf_counter() - t0)
            ts[kk] = best
        per = (ts[256] - ts[64]) / (256 - 64) / M
        log(f"{mode:8s}: {per * 1e6:8.2f} us/step "
            f"(t64={ts[64] * 1e3:.1f} ms, t256={ts[256] * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
