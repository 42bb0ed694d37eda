"""Sector Hamiltonian matvec backends.

TPU-native replacement of the SpMV engine (spMatVec_main,
ED_HAMILTONIAN_SPARSE_HxV.f90:391-485). The sector vector is a dense array
``v[DimPh, DimDw, DimUp]`` (phonon blocks outermost, up index fastest — the
same linear order as the reference's ``i = iup + idw*DimUp + iph*DimUp*DimDw``).

The tensor-product structure turns the reference's scalar CSR loops into a
handful of array ops that XLA fuses into a few HBM-bandwidth-bound kernels:

- diagonal:  elementwise multiply
- up hops:   gather along the last axis with the ELL tables  [DimUp, K]
- dw hops:   gather along the middle axis                    [DimDw, K]
- non-local: per tensor-product term, two chained gathers (partial
  permutations), no DimEl x DimEl matrix ever materializes
- phonons:   block-diagonal broadcast + tridiagonal displacement coupling

All functions are pure and jit-compatible with static shapes; `vmap` over a
batch of vectors gives the blocked variants for free.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..hamiltonian import SectorHamiltonian


def _ell_apply_last(cols, vals, v):
    """y[..., i] = sum_k vals[i,k] * v[..., cols[i,k]] (up-hop factor)."""
    # v: [..., N]; cols/vals: [N, K]
    g = v[..., cols]                      # [..., N, K]
    return jnp.einsum("...nk,nk->...n", g, vals)


def _ell_apply_mid(cols, vals, v):
    """y[..., i, :] = sum_k vals[i,k] * v[..., cols[i,k], :] (dw-hop factor)."""
    g = v[..., cols, :]                   # [..., N, K, DimUp]
    return jnp.einsum("...nku,nk->...nu", g, vals)


def apply_h(h: SectorHamiltonian, v: jnp.ndarray) -> jnp.ndarray:
    """y = H v for one sector. v shaped [DimDw, DimUp] or [DimPh, DimDw, DimUp]."""
    has_ph = h.ph_diag is not None
    y = h.diag * v
    y = y + _ell_apply_last(h.up_cols, h.up_vals, v)
    y = y + _ell_apply_mid(h.dw_cols, h.dw_vals, v)
    if h.nd_up_src is not None:
        # sum_t B_t (x) A_t : tmp[.., jdw, iup] = A_val[iup] * v[.., jdw, A_src[iup]]
        def one_term(up_src, up_val, dw_src, dw_val):
            tmp = v[..., up_src] * up_val            # gather along up axis
            return tmp[..., dw_src, :] * dw_val[:, None]
        contrib = jax.vmap(one_term, in_axes=(0, 0, 0, 0), out_axes=0)(
            h.nd_up_src, h.nd_up_val, h.nd_dw_src, h.nd_dw_val)
        y = y + contrib.sum(axis=0)
    if has_ph:
        y = y + h.ph_diag[:, None, None] * v
        # e-ph: y[p] += X[p,q] * (eph_el * v[q])
        ev = h.eph_el[None] * v                      # [DimPh, DimDw, DimUp]
        y = y + jnp.einsum("pq,qdu->pdu", h.eph_x, ev)
    return y


@partial(jax.jit, static_argnames=())
def apply_h_jit(h: SectorHamiltonian, v: jnp.ndarray) -> jnp.ndarray:
    return apply_h(h, v)


def matvec_flat(h: SectorHamiltonian, v_flat: jnp.ndarray) -> jnp.ndarray:
    """Flat-vector interface (reference linear index order)."""
    if h.ph_diag is not None:
        v = v_flat.reshape(h.dim_ph, h.dim_dw, h.dim_up)
    else:
        v = v_flat.reshape(h.dim_dw, h.dim_up)
    return apply_h(h, v).reshape(-1)


def make_matvec(h: SectorHamiltonian):
    """Closure `mv(v_flat) -> H v_flat`, jitted once per sector shape."""
    @jax.jit
    def mv(v_flat):
        return matvec_flat(h, v_flat)
    return mv
