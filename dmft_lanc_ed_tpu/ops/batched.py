"""Batched small-sector diagonalization.

The reference scans sectors strictly sequentially (ED_DIAG.f90:58-278); at
nbath=9 that is ~121 dispatch+solve round trips, most over sectors with only
1e2-1e4 states — far too small to occupy the chip individually. Here sectors
whose padded dense factors share a shape bucket are *stacked* and solved by
one vmapped thick-restart Lanczos: every Krylov step is a single batched MXU
matmul over [B, DimDw_p, DimUp_p] vectors, so the scan cost collapses from
sum-of-dispatches to a handful of bucket solves.

Mechanics:
- each sector's :class:`~.dense.DenseSectorOp` is zero-padded on both hop
  axes to the bucket shape; padded rows form an exactly decoupled invariant
  subspace whose diagonal is shifted by +PAD_SHIFT (the same construction as
  the sharded path's communicator-shrink replacement,
  ``parallel.production.pad_dense_op``), and start vectors carry exact-zero
  pad components, so the physical spectrum is computed exactly;
- the stacked operator is a single pytree with a leading batch axis; the
  thick-restart basis builder (:func:`.lanczos._build_basis_rr`) is vmapped
  over it unchanged;
- restart control (Ritz extraction, residual tests) runs per element on
  host; the bucket iterates until every element converged. Elements that
  fail to converge inside the bucket budget are returned unsolved and fall
  back to the serial path (rare: clustered spectra).
"""
from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dense import (DenseSectorOp, matvec_dense, matvec_dense_fast,
                    matvec_dense_mixed)
from .lanczos import _build_basis_rr, _ritz, refine_eigenpairs

log = logging.getLogger("dmft_lanc_ed_tpu")

PAD_SHIFT = 1.0e3


def _pow2_at_least(n: int, floor: int = 16) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def bucket_key(op: DenseSectorOp) -> Tuple:
    """Shape-bucket key: padded hop dims + aux-term structure."""
    du_p = _pow2_at_least(op.dim_up)
    dd_p = _pow2_at_least(op.dim_dw)
    nd_t = 0 if op.nd_a is None else op.nd_a.shape[0]
    return (du_p, dd_p, op.dim_ph, nd_t)


def pad_dense_op_2d(op: DenseSectorOp, du_p: int, dd_p: int) -> DenseSectorOp:
    """Zero-pad both hop axes to (du_p, dd_p); pad diagonal += PAD_SHIFT."""
    du, dd = op.dim_up, op.dim_dw
    pu, pd = du_p - du, dd_p - dd
    if pu == 0 and pd == 0:
        return op
    kw = {}
    if op.nd_a is not None:
        kw.update(
            nd_a=jnp.pad(op.nd_a, ((0, 0), (0, pu), (0, pu))),
            nd_a32=jnp.pad(op.nd_a32, ((0, 0), (0, pu), (0, pu))),
            nd_b=jnp.pad(op.nd_b, ((0, 0), (0, pd), (0, pd))),
            nd_b32=jnp.pad(op.nd_b32, ((0, 0), (0, pd), (0, pd))))
    if op.ph_diag is not None:
        kw.update(ph_diag=op.ph_diag, eph_x=op.eph_x,
                  eph_el=jnp.pad(op.eph_el, ((0, pd), (0, pu))))
    diag = np.pad(np.asarray(op.diag), ((0, pd), (0, pu)))
    if pd:
        diag[dd:, :] += PAD_SHIFT
    if pu:
        diag[:dd, du:] += PAD_SHIFT
    return DenseSectorOp(
        diag=jnp.asarray(diag),
        hup=jnp.pad(op.hup, ((0, pu), (0, pu))),
        hup32=jnp.pad(op.hup32, ((0, pu), (0, pu))),
        hdw=jnp.pad(op.hdw, ((0, pd), (0, pd))),
        hdw32=jnp.pad(op.hdw32, ((0, pd), (0, pd))),
        nnz_count=op.nnz_count, **kw)


_OP_FIELDS = ("diag", "hup", "hdw", "hup32", "hdw32", "nd_a", "nd_b",
              "nd_a32", "nd_b32", "ph_diag", "eph_el", "eph_x")


def stack_ops(ops: Sequence[DenseSectorOp]) -> DenseSectorOp:
    """Stack same-shape ops into one pytree with a leading batch axis."""
    def st(f):
        vals = [getattr(o, f) for o in ops]
        return None if vals[0] is None else jnp.stack(vals)
    return DenseSectorOp(nnz_count=sum(o.nnz_count for o in ops),
                         **{f: st(f) for f in _OP_FIELDS})


def _slice_op(stacked: DenseSectorOp, b: int) -> DenseSectorOp:
    fields = {f: (None if getattr(stacked, f) is None
                  else getattr(stacked, f)[b]) for f in _OP_FIELDS}
    return DenseSectorOp(nnz_count=stacked.nnz_count, **fields)


_APPLY = {"f64": matvec_dense, "mixed": matvec_dense_mixed,
          "fast": matvec_dense_fast}


def _batched_apply(precision: str) -> Callable:
    base = _APPLY[precision]
    return jax.vmap(base)


def _pad_vec(v_flat: np.ndarray, op: DenseSectorOp, du_p: int, dd_p: int,
             dim_ph: int) -> np.ndarray:
    """Flat sector vector -> padded natural shape with exact-zero pad."""
    du, dd = op.dim_up, op.dim_dw
    if dim_ph > 1:
        v = v_flat.reshape(dim_ph, dd, du)
        return np.pad(v, ((0, 0), (0, dd_p - dd), (0, du_p - du)))
    v = v_flat.reshape(dd, du)
    return np.pad(v, ((0, dd_p - dd), (0, du_p - du)))


def _unpad_vec(v_nd: np.ndarray, op: DenseSectorOp) -> np.ndarray:
    du, dd = op.dim_up, op.dim_dw
    if v_nd.ndim == 3:
        return np.asarray(v_nd)[:, :dd, :du].reshape(-1)
    return np.asarray(v_nd)[:dd, :du].reshape(-1)


def lanczos_ground_state_bucket(
    ops: Sequence[DenseSectorOp],
    neigen: int,
    tol: float,
    precision: str = "f64",
    ncv: Optional[int] = None,
    max_restarts: int = 60,
    seed: int = 17,
    dtype=jnp.float64,
) -> List[Optional[Tuple[np.ndarray, np.ndarray]]]:
    """Solve a shape bucket of sectors in one vmapped thick-restart Lanczos.

    Returns per-sector (evals [k], evecs [k, dim] flat, unpadded) or None
    for elements that did not converge within the bucket budget.
    """
    b = len(ops)
    du_p, dd_p, dim_ph, _ = bucket_key(ops[0])
    padded = [pad_dense_op_2d(o, du_p, dd_p) for o in ops]
    stacked = stack_ops(padded)
    vshape = (dim_ph, dd_p, du_p) if dim_ph > 1 else (dd_p, du_p)
    dims = [o.dim for o in ops]
    max_dim = max(dims)
    neigen = min(neigen, min(dims))
    m = ncv or max(2 * neigen + 16, 32)
    m = min(m, min(dims))
    l_keep = min(max(2 * neigen, neigen + 4), max(m - 4, 1))
    apply_nd = _APPLY[precision]
    rng = np.random.default_rng(seed)

    # start vectors: random in the physical block, exact zero in the pad
    v0 = jnp.asarray(np.stack([
        _pad_vec(rng.standard_normal(o.dim), o, du_p, dd_p, dim_ph)
        for o in ops]), dtype)
    v0 = v0 / jnp.sqrt(jnp.sum(v0.reshape(b, -1) ** 2, axis=1)).reshape(
        (b,) + (1,) * len(vshape))

    def build(l_static, m_static):
        def one(op_b, prefix_b, theta_b, v_b):
            return _build_basis_rr(op_b, prefix_b, theta_b, v_b,
                                   m_static, l_static, apply_nd)
        return jax.vmap(one)

    from ..utils.observability import kernel_stats
    prefix = jnp.zeros((b, 0) + vshape, dtype)
    theta0 = jnp.zeros((b, 0), dtype)
    l = 0
    done: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for restart in range(max_restarts):
        res = build(l, m)(stacked, prefix, theta0, v0)
        kernel_stats.record(b * (m - l), stacked.nnz_count // max(b, 1))
        t_np = np.asarray(res.t_mat)
        beta_np = np.asarray(res.beta_last)
        basis = res.v_basis
        l_next = min(l_keep, m - 2)
        s_keep = np.empty((b, m, l_next))
        new_theta = np.empty((b, l_next))
        all_done = True
        for i in range(b):
            theta_i, s_i = _ritz(t_np[i], m)
            s_keep[i] = s_i[:, :l_next]
            new_theta[i] = theta_i[:l_next]
            if i in done:
                continue
            resid = np.abs(beta_np[i] * s_i[m - 1, :])
            n_conv = 0
            while (n_conv < m and
                   resid[n_conv] <= tol * max(abs(theta_i[n_conv]), 1.0)):
                n_conv += 1
            if n_conv >= neigen:
                s = jnp.asarray(s_i[:, :neigen])
                vecs = jnp.tensordot(s.T, basis[i], axes=1)
                vals = theta_i[:neigen]
                if precision != "f64":
                    vals, vecs = refine_eigenpairs(
                        _slice_op(stacked, i), matvec_dense, vecs)
                order = np.argsort(vals)
                flat = np.stack([_unpad_vec(np.asarray(vecs[k]), ops[i])
                                 for k in order])
                done[i] = (np.asarray(vals)[order], flat)
            else:
                all_done = False
        if all_done:
            break
        # thick restart for every element (converged ones ride along)
        l = l_next
        prefix = jnp.einsum("bml,bm...->bl...", jnp.asarray(s_keep), basis)
        theta0 = jnp.asarray(new_theta, dtype)
        v0 = res.v_next
        # exhausted chains restart from fresh random physical directions
        dead = np.asarray(beta_np) <= 0.0
        if dead.any():
            v0 = np.array(v0)            # writable host copy
            for i in np.nonzero(dead)[0]:
                vi = _pad_vec(rng.standard_normal(ops[i].dim), ops[i],
                              du_p, dd_p, dim_ph)
                v0[i] = vi / np.linalg.norm(vi)
            v0 = jnp.asarray(v0)
    else:
        log.warning("batched bucket (%d sectors, shape %sx%s): %d/%d "
                    "unconverged after %d restarts — serial fallback",
                    b, du_p, dd_p, b - len(done), b, max_restarts)
    return [done.get(i) for i in range(b)]
