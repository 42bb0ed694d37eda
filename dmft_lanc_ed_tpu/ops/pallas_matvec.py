"""Pallas TPU kernel for the sector matvec (stored-factor fast path).

The hop factors are partial permutations whose (src, dst) index maps are
piecewise *contiguous*: consecutive basis states whose varying bits lie below
both flipped levels map to consecutive targets with a constant amplitude.
Host-side we run-length-encode each factor into slabs

    y[dst0:dst0+len, :] += val * v[src0:src0+len, :]

and the kernel is a fori loop of slab AXPYs over VMEM-resident v/y — one HBM
round trip per matvec instead of one per ELL slot. Mosaic requires
8-row-aligned vector loads, so each slab is processed as an aligned window
with a dynamic sublane roll (`pltpu.roll`) to line the source rows up with
the destination window, and a row mask for the head/tail. Runs are binned
into a short class (16-row window; the median run is 1-4 rows) and a long
class (128-row window).

Run tables ride in SMEM via PrefetchScalarGridSpec. Mosaic has no f64, so
this backend runs in f32 — it serves the speed path (ed_dtype="float32");
the f64 XLA row-gather path remains the accuracy path. Kernel output is
validated against it in tests (interpret mode on CPU, device parity on TPU).

Reference analogue: replaces the CSR SpMV half of
ED_HAMILTONIAN_SPARSE_HxV.f90; the run encoding is the TPU-native answer to
the reference's tensor-product factor storage.

Gotcha (hard-won): Mosaic fails to legalize this kernel when jax x64 mode is
enabled (`pl.multiple_of` hints and weak-int promotion produce i64 scalars);
every call here therefore runs under `jax.enable_x64(False)` — the kernel is
f32/int32 throughout, so 32-bit tracing is exactly right.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hamiltonian import SectorHamiltonian

SLAB_S = 16    # short-run window (run length <= 8, head <= 7)
SLAB_L = 128   # long-run window (run length <= 120)
RUN_CAP_S = 8
RUN_CAP_L = SLAB_L - 8


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RunFactor:
    """Aligned run tables, two slab classes. Layout per run r:
    dst window starts at 8-aligned `da[r]`, rows [head, head+len) of the
    window receive `val * v[sa + shead ...]` where the source window is the
    8-aligned `sa[r]` rolled by `head - shead`."""
    s_da: jnp.ndarray
    s_sa: jnp.ndarray
    s_head: jnp.ndarray
    s_shift: jnp.ndarray   # head - shead (roll amount)
    s_len: jnp.ndarray
    s_val: jnp.ndarray
    l_da: jnp.ndarray
    l_sa: jnp.ndarray
    l_head: jnp.ndarray
    l_shift: jnp.ndarray
    l_len: jnp.ndarray
    l_val: jnp.ndarray


def _encode_runs(cols: np.ndarray, vals: np.ndarray) -> List[Tuple]:
    """RLE of an ELL factor into (dst, src, len, val) tuples."""
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=np.float64)
    n, kmax = cols.shape
    out = []
    for k in range(kmax):
        src = cols[:, k]
        val = vals[:, k]
        nz = val != 0.0
        if not nz.any():
            continue
        rows = np.nonzero(nz)[0]
        s = src[rows]
        v = val[rows]
        brk = np.ones(len(rows), bool)
        brk[1:] = ((np.diff(rows) != 1) | (np.diff(s) != 1)
                   | (v[1:] != v[:-1]))
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(rows))
        for a, b in zip(starts, ends):
            out.append((int(rows[a]), int(s[a]), int(b - a), float(v[a])))
    return out


def ell_to_runs(cols: np.ndarray, vals: np.ndarray) -> RunFactor:
    runs = _encode_runs(cols, vals)
    short, long_ = [], []
    for d0, s0, L, v in runs:
        while L > 0:
            take = min(L, RUN_CAP_L) if L > RUN_CAP_S else L
            rec = (d0, s0, take, v)
            (short if take <= RUN_CAP_S else long_).append(rec)
            d0 += take
            s0 += take
            L -= take

    def pack(lst, slab):
        if not lst:
            lst = [(0, 0, 0, 0.0)]
        da, sa, head, shift, ln, vv = [], [], [], [], [], []
        for d0, s0, L, v in lst:
            a = (d0 // 8) * 8
            b = (s0 // 8) * 8
            da.append(a)
            sa.append(b)
            head.append(d0 - a)
            # cyclic (non-negative) roll; wrapped rows are masked out
            shift.append(((d0 - a) - (s0 - b)) % slab)
            ln.append(L)
            vv.append(v)
        return (jnp.asarray(np.array(da, np.int32)),
                jnp.asarray(np.array(sa, np.int32)),
                jnp.asarray(np.array(head, np.int32)),
                jnp.asarray(np.array(shift, np.int32)),
                jnp.asarray(np.array(ln, np.int32)),
                jnp.asarray(np.array(vv, np.float32)))

    s = pack(short, SLAB_S)
    l = pack(long_, SLAB_L)
    return RunFactor(s_da=s[0], s_sa=s[1], s_head=s[2], s_shift=s[3],
                     s_len=s[4], s_val=s[5],
                     l_da=l[0], l_sa=l[1], l_head=l[2], l_shift=l[3],
                     l_len=l[4], l_val=l[5])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PallasSectorOp:
    """All data for the Pallas matvec of one sector (f32)."""
    diag: jnp.ndarray            # [dd_pad, du] f32 (row-padded)
    dw_runs: RunFactor           # native layout
    up_runs: RunFactor           # transposed layout
    dim_dw: int
    dim_up: int


def _lanes(n: int) -> int:
    """Round up to the 128-lane granularity Mosaic requires."""
    return ((n + 127) // 128) * 128


def _rows(n: int) -> int:
    """Row-pad: + SLAB_L window slack, rounded to the 8-sublane grain."""
    return ((n + SLAB_L + 7) // 8) * 8


def build_pallas_op(h: SectorHamiltonian) -> PallasSectorOp:
    if h.ph_diag is not None or h.nd_up_src is not None:
        raise NotImplementedError(
            "pallas backend: phonon / non-local terms not supported yet")
    dd, du = int(h.dim_dw), int(h.dim_up)
    diag = np.zeros((_rows(dd), _lanes(du)), np.float32)
    diag[:dd, :du] = np.asarray(h.diag, np.float32)
    return PallasSectorOp(
        diag=jnp.asarray(diag),
        dw_runs=ell_to_runs(h.dw_cols, h.dw_vals),
        up_runs=ell_to_runs(h.up_cols, h.up_vals),
        dim_dw=dd, dim_up=du)


def _kernel_body(s_da, s_sa, s_head, s_shift, s_len, s_val,
                 l_da, l_sa, l_head, l_shift, l_len, l_val,
                 v_ref, out_ref):
    """Shared slab-AXPY loops (out_ref must already be initialized)."""
    def make_body(da, sa, head, shift, ln, val, slab, rows):
        def body(r, _):
            a = pl.multiple_of(da[r], 8)
            b = pl.multiple_of(sa[r], 8)
            h0 = head[r]
            window = v_ref[pl.ds(b, slab), :]
            window = pltpu.roll(window, shift[r], 0)
            mask = (rows >= h0) & (rows < h0 + ln[r])
            cur = out_ref[pl.ds(a, slab), :]
            out_ref[pl.ds(a, slab), :] = jnp.where(
                mask, cur + val[r] * window, cur)
            return 0
        return body

    rows_s = jax.lax.broadcasted_iota(jnp.int32, (SLAB_S, 1), 0)
    rows_l = jax.lax.broadcasted_iota(jnp.int32, (SLAB_L, 1), 0)
    jax.lax.fori_loop(
        0, s_da.shape[0],
        make_body(s_da, s_sa, s_head, s_shift, s_len, s_val,
                  SLAB_S, rows_s), 0)
    jax.lax.fori_loop(
        0, l_da.shape[0],
        make_body(l_da, l_sa, l_head, l_shift, l_len, l_val,
                  SLAB_L, rows_l), 0)


def _kernel_diag(s_da, s_sa, s_head, s_shift, s_len, s_val,
                 l_da, l_sa, l_head, l_shift, l_len, l_val,
                 diag_ref, v_ref, out_ref):
    out_ref[:] = diag_ref[:] * v_ref[:]
    _kernel_body(s_da, s_sa, s_head, s_shift, s_len, s_val,
                 l_da, l_sa, l_head, l_shift, l_len, l_val,
                 v_ref, out_ref)


def _kernel_nodiag(s_da, s_sa, s_head, s_shift, s_len, s_val,
                   l_da, l_sa, l_head, l_shift, l_len, l_val,
                   v_ref, out_ref):
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    _kernel_body(s_da, s_sa, s_head, s_shift, s_len, s_val,
                 l_da, l_sa, l_head, l_shift, l_len, l_val,
                 v_ref, out_ref)


def _runs_call(kernel, runs: RunFactor, arrays, out_shape, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(runs.s_da, runs.s_sa, runs.s_head, runs.s_shift, runs.s_len, runs.s_val,
      runs.l_da, runs.l_sa, runs.l_head, runs.l_shift, runs.l_len, runs.l_val,
      *arrays)


def apply_pallas(op: PallasSectorOp, v_pad: jnp.ndarray, vt_pad: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """One matvec on row-padded inputs.

    v_pad: [dd + pad, du_lanes] native layout; vt_pad likewise transposed.
    Returns y [dd, du] (unpadded). Padding rows/lanes must be zero.
    Runs under 32-bit tracing (see module docstring).
    """
    with jax.enable_x64(False):
        return _apply_pallas_inner(op, v_pad, vt_pad, interpret)


def _apply_pallas_inner(op, v_pad, vt_pad, interpret):
    dd, du = op.dim_dw, op.dim_up
    y = _runs_call(_kernel_diag, op.dw_runs, (op.diag, v_pad),
                   jax.ShapeDtypeStruct(v_pad.shape, v_pad.dtype),
                   interpret)[:dd, :du]
    yt = _runs_call(_kernel_nodiag, op.up_runs, (vt_pad,),
                    jax.ShapeDtypeStruct(vt_pad.shape, vt_pad.dtype),
                    interpret)[:du, :dd]
    return y + yt.T


def pad_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Row-pad (window slack, 8-grain) and lane-pad to a 128 multiple."""
    return jnp.pad(x, ((0, _rows(x.shape[0]) - x.shape[0]),
                       (0, _lanes(x.shape[1]) - x.shape[1])))


def matvec_pallas(op: PallasSectorOp, v: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Convenience single-arg matvec (handles padding + transpose)."""
    return apply_pallas(op, pad_rows(v), pad_rows(v.T), interpret)
