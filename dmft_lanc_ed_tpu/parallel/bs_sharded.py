"""Dw-sharded band-sparse fused matvec — the flagship kernel at pod scale.

The single-chip band-sparse kernel (ops/blocksparse.py) keeps the whole
padded vector resident in VMEM; past one chip the reference distributes its
hot SpMV over ranks with a row split + vector_transpose_MPI halo motion
(spMatVec_mpi_main, ED_HAMILTONIAN_COMMON.f90:53-118). The TPU-native
analogue here exploits the RCM band structure instead of a full transpose:

- the padded vector is dw-row-sharded over a 1-D mesh: device d holds rows
  [d*L, (d+1)*L) of the permuted padded grid (L = ddp/n);
- the **up contraction is fully local** (it contracts lanes, and every
  device holds all lanes) — the dominant MXU work never communicates;
- the **dw contraction** needs only the banded window of rows around each
  local panel: two `ppermute` strips of d_dw*128 rows from the ring
  neighbors (the halo), NOT an all-gather — per-step bytes are
  2*halo*dup*4 per device instead of the full vector;
- the **diagonal factors** are row-sharded; Lanczos dots/norms are `psum`.

Applicability: each device must hold at least the window reach,
``ntd/n >= d_dw + 1`` (bs_shard_applicable). Beyond that ratio — or for
non-multiple meshes — production falls back to the sharded dense/direct
backends (the measured crossover: those pay full-tile MXU passes but have
no band constraint).

The kernel itself is the single-chip fused kernel with one generalization:
the per-panel window start is an SMEM input (tile units, multiplied by 128
in-kernel LAST so Mosaic can prove alignment) instead of being computed
from the global panel id, so the same body serves any shard with its
edge-clamped windows precomputed on host.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.blocksparse import (VMEM_LIMIT, BlockSparseSectorOp,
                               _auto_interpret, _dot3)

_HIGHEST = jax.lax.Precision.HIGHEST


def bs_shard_applicable(op: BlockSparseSectorOp, n: int) -> bool:
    """Row split must be a tile multiple and cover the window reach."""
    ntd = op.padded_shape[0] // 128
    return ntd % n == 0 and ntd // n >= op.d_dw + 1


def _window_tiles(op: BlockSparseSectorOp) -> np.ndarray:
    """Global per-panel window start, in tiles (the builder's clamp)."""
    ddp = op.padded_shape[0]
    ntd = ddp // 128
    i = np.arange(ntd)
    return np.clip(i - op.d_dw, 0, (ddp - op.w_dw) // 128).astype(np.int32)


def _local_kernel(t_ref, v_ref, vext_ref, dwhi_ref, dwlo_ref, uphi_ref,
                  uplo_ref, a_ref, b_ref, out_ref, ss_ref, *, w_dw: int,
                  d_up: int, w_up: int, dup: int, ntl: int):
    """One local row panel of y = H_p v (same math as blocksparse
    `_fused_kernel`; window start from SMEM instead of program_id)."""
    i = pl.program_id(0)
    ntu = dup // 128
    t = t_ref[i, 0] * 128          # multiply LAST: provably tile-aligned

    v_blk = v_ref[pl.ds(i * 128, 128), :]
    vb_hi = v_blk.astype(jnp.bfloat16)
    vb_lo = (v_blk - vb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    vw = vext_ref[pl.ds(t, w_dw), :]
    vw_hi = vw.astype(jnp.bfloat16)
    vw_lo = (vw - vw_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    diag_panel = jnp.dot(a_ref[pl.ds(i * 128, 128), :], b_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=_HIGHEST)
    acc = diag_panel * v_blk
    acc = acc + _dot3(dwhi_ref[0], dwlo_ref[0], vw_hi, vw_lo)
    up_parts = []
    for j in range(ntu):
        s = min(max((j - d_up) * 128, 0), dup - w_up)
        up_parts.append(_dot3(vb_hi[:, s:s + w_up], vb_lo[:, s:s + w_up],
                              uphi_ref[j], uplo_ref[j]))
    acc = acc + (up_parts[0] if ntu == 1
                 else jnp.concatenate(up_parts, axis=1))
    out_ref[:] = acc
    ss_ref[i, 0] = jnp.sum(acc * acc)


@partial(jax.jit,
         static_argnames=("w_dw", "d_up", "w_up", "dup", "interpret"))
def _local_call(t_tiles, v_loc, v_ext, dw_hi, dw_lo, up_hi, up_lo, a_loc,
                b_mat, *, w_dw: int, d_up: int, w_up: int, dup: int,
                interpret: bool = False):
    with jax.enable_x64(False):
        ntl = v_loc.shape[0] // 128
        next_rows = v_ext.shape[0]
        rp = a_loc.shape[1]
        kern = partial(_local_kernel, w_dw=w_dw, d_up=d_up, w_up=w_up,
                       dup=dup, ntl=ntl)
        return pl.pallas_call(
            kern,
            grid=(ntl,),
            in_specs=[
                pl.BlockSpec((ntl, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),        # window tiles
                pl.BlockSpec((ntl * 128, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # local rows
                pl.BlockSpec((next_rows, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # halo'd rows
                pl.BlockSpec((1, 128, w_dw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),        # dw slab hi
                pl.BlockSpec((1, 128, w_dw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),        # dw slab lo
                pl.BlockSpec((dup // 128, w_up, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),        # up slabs hi
                pl.BlockSpec((dup // 128, w_up, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),        # up slabs lo
                pl.BlockSpec((ntl * 128, rp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # diag A rows
                pl.BlockSpec((rp, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # diag B
            ],
            out_specs=[
                pl.BlockSpec((128, dup), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ntl, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ntl * 128, dup), jnp.float32),
                jax.ShapeDtypeStruct((ntl, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(t_tiles, v_loc, v_ext, dw_hi, dw_lo, up_hi, up_lo, a_loc, b_mat)


def make_sharded_bs_matvec(op: BlockSparseSectorOp, mesh: Mesh,
                           interpret: bool = False):
    """Build `(apply, spec)`: apply(v_padded [ddp, dup] f32, sharded by
    rows) -> (y, ss_sum) with the same semantics as the single-chip
    `_matvec_padded(op, v, 1.0)` (y = H_p v, total sum of squares).

    The returned apply is a shard_map program: ppermute halo strips +
    per-device fused kernel + psum'd norm accumulator.
    """
    if mesh.devices.ndim != 1:
        raise ValueError("bs sharded matvec expects a 1-D mesh")
    n = mesh.devices.size
    if not bs_shard_applicable(op, n):
        raise ValueError(
            f"band-sparse shard constraint violated: ntd="
            f"{op.padded_shape[0] // 128}, n={n}, d_dw={op.d_dw} "
            "(need ntd % n == 0 and ntd/n >= d_dw + 1)")
    ax = mesh.axis_names[0]
    ddp, dup = op.padded_shape
    ntd = ddp // 128
    ntl = ntd // n
    local = ntl * 128
    halo = op.d_dw * 128
    interpret = _auto_interpret(interpret)

    t_glob = _window_tiles(op)                       # [ntd] tiles, global
    # per-device local window starts, relative to the halo'd buffer
    # v_ext = [left_halo | local | right_halo] of device d whose first
    # global row is d*local - halo
    t_local = np.stack([
        t_glob[d * ntl:(d + 1) * ntl] - (d * ntl - op.d_dw)
        for d in range(n)]).astype(np.int32)[..., None]   # [n, ntl, 1]

    dw_hi = op.dw_hi.reshape(ntd, 128, op.w_dw)
    dw_lo = op.dw_lo.reshape(ntd, 128, op.w_dw)

    def _apply(t_loc, v_loc, dwhi_loc, dwlo_loc, up_hi, up_lo, a_loc, b_mat):
        # halo exchange: strip of `halo` rows to each ring neighbor
        right = jax.lax.ppermute(v_loc[-halo:], ax,
                                 [(i, (i + 1) % n) for i in range(n)])
        left = jax.lax.ppermute(v_loc[:halo], ax,
                                [(i, (i - 1) % n) for i in range(n)])
        idx = jax.lax.axis_index(ax)
        right = jnp.where(idx == 0, 0.0, right)      # no wrap at edges
        left = jnp.where(idx == n - 1, 0.0, left)
        v_ext = jnp.concatenate([right, v_loc, left], axis=0)
        y, ss = _local_call(t_loc, v_loc, v_ext, dwhi_loc, dwlo_loc,
                            up_hi, up_lo, a_loc, b_mat, w_dw=op.w_dw,
                            d_up=op.d_up, w_up=op.w_up, dup=dup,
                            interpret=interpret)
        return y, jax.lax.psum(jnp.sum(ss), ax)

    sm = jax.shard_map(
        _apply, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), P(), P(), P(ax), P()),
        out_specs=(P(ax), P()),
        check_vma=False)    # pallas_call shapes carry no vma annotations

    t_dev = jnp.asarray(t_local.reshape(ntd, 1))

    def apply(v_padded: jnp.ndarray):
        return sm(t_dev, v_padded, dw_hi, dw_lo, op.up_hi, op.up_lo,
                  op.diag_a, op.diag_b)

    return apply, P(ax)
