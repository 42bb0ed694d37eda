"""Fused multi-step Krylov chains for the band-sparse sector kernel.

Round-3 "chain-in-kernel" design: the per-call kernel (ops/blocksparse.py)
still pays one full HBM round-trip of the sector vector per Lanczos step
(~13 MB/step on the 854k bench sector). Here K steps run inside ONE
``pallas_call``: the chain state ping-pongs between the two planes of a
single VMEM scratch buffer, both banded factor slab stacks stay resident,
and the only HBM traffic of the whole chain is the one-time DMA of the
start vector (in) and the filtered vector (out). Per-step HBM -> 0; the
chain becomes MXU-bound.

Two kernels, sharing one panel-apply helper (bitwise-identical H):

- :func:`tridiag_chain` — K plain-Lanczos steps (the reference's
  ``lanczos_iteration_d`` 3-term recurrence, ED_GF_NORMAL.f90:633-637 /
  SF_SP_LINALG ``sp_lanc_tridiag``), emitting the (alpha, beta) tridiagonal.
  Each step is two passes over the row panels: pass 0 computes
  w = H v_k - beta_k v_{k-1} and the global <v_k, w>; pass 1 orthogonalizes
  against v_k and accumulates ||w'||. Normalization is LAZY: vectors are
  stored unnormalized and their inverse norms ride in SMEM, applied as
  scalars on read — no extra VMEM pass.

- :func:`cheb_chain` — K scaled-Chebyshev filter steps
  v_{k+1} = (2/e)(H - c) v_k - v_{k-1} (T_1 uses 1/e), single pass per
  step (no dots), with the same lazy-normalization trick keeping every
  stored amplitude at ||.|| ~ 1 so f32 never overflows. This produces the
  ground-state SEED vector without the second ("rebuild") Lanczos pass —
  the textbook two-pass vector reconstruction would need a third resident
  vector plane that does not fit VMEM; a Chebyshev filter bootstrapped from
  the tridiagonal's Ritz bounds delivers the same seed quality with the
  memory footprint of pass one.

:func:`ground_state_seed` glues them: tridiag chain -> host eigh of the
tridiagonal (Ritz bounds [theta_0, theta_max] + top-end residual safety
margin) -> Chebyshev filter damping [cut, b] -> normalized seed. The
two-stage solver (diag._blocksparse_ground_state) then tops off with the
mixed-precision Lanczos + f64 Rayleigh-Ritz polish — in the padded space
throughout (round-5 compile-key discipline; see ops/blocksparse.py #7).

Round-5 changes:
- every jitted entry point takes the :class:`~.blocksparse.BsPaddedOp`
  (padded-geometry jit keys shared across sectors — the cold-diag compile
  wall was one executable set PER SECTOR because the old signatures keyed
  on the op's natural-dim leaves);
- the zero-tile trim (blocksparse._fused_kernel) is NOT applied here: the
  trim's dynamic-loop temporaries pushed these 2-plane-resident kernels
  past the scoped-VMEM edge (16.0-16.3M vs the 15.8M limit, measured
  on-chip at the bench geometry) — see the `_hv_panel` docstring;
- the v1 (grid-per-panel) kernel variants are gone: round 4 measured the
  v2 one-grid-step-per-Lanczos-step structure strictly better.

VMEM budget: 2 f32 vector planes (8 MB on the 1024x1024-padded bench
sector) + both split-bf16 slab stacks (~5.3 MB) + temporaries. The dw
window contraction is tiled 128 columns at a time so cast temporaries stay
at one panel's footprint. :func:`chain_applicable` gates on the actual
numbers.

Mosaic rules honored (see .claude/skills/verify): x64 disabled around
every pallas_call; dynamic slice starts multiplied by 128 LAST; SMEM
outputs are full-array blocks indexed by program_id; dot precision only
DEFAULT/HIGHEST (the 3-pass split-bf16 product is built manually).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocksparse import (BsPaddedOp, BlockSparseSectorOp, _auto_interpret,
                          _dot3, _pop, from_padded, to_padded)

_HIGHEST = jax.lax.Precision.HIGHEST

# VMEM gate for the 2-resident-plane chain kernels (v5e ~16 MB/core).
# BUDGET gates applicability on the *resident* footprint; LIMIT is what the
# Mosaic scoped allocator may use — it must also cover the per-panel cast /
# concat temporaries (~1.5 MB above resident on the bench geometry; the
# round-4 bench compile measured 15.08 MB total, so 15 MB was 80 KB short).
CHAIN_VMEM_BUDGET = int(13.6 * 1024 * 1024)
CHAIN_VMEM_LIMIT = int(15.8 * 1024 * 1024)
# chain-length buckets (static kernel parameter -> one executable each)
_K_BUCKETS = (16, 32, 64, 96, 128, 192, 256)

# SMEM state slots
_DOT, _SS, _SPRV, _SCUR, _BETA, _ALPHA = range(6)


def _bucket_k(k: int) -> int:
    for b in _K_BUCKETS:
        if k <= b:
            return b
    raise ValueError(
        f"chain length {k} exceeds the largest fused-chain bucket "
        f"{_K_BUCKETS[-1]}; split into multiple kernel launches or raise "
        "_K_BUCKETS (each bucket is one compiled executable)")


def chain_applicable(op) -> bool:
    """True when two f32 vector planes + both resident slab stacks fit."""
    pop = _pop(op)
    ddp, dup = pop.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    resident = (2 * 4 * ddp * dup                      # ping-pong planes
                + 2 * 2 * ntu * pop.w_up * 128         # up slabs hi+lo
                + 2 * 2 * ntd * 128 * pop.w_dw         # dw slabs hi+lo
                + 4 * (ddp + dup) * pop.diag_a.shape[1])
    return resident <= CHAIN_VMEM_BUDGET


# --------------------------------------------------------------------------
# shared panel apply: y = (H_p u_cur)_i  on the permuted padded grid
# --------------------------------------------------------------------------
def _hv_panel(vbuf, cur, i, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
              a_ref, b_ref, *, d_dw: int, w_dw: int, ddp: int, d_up: int,
              w_up: int, dup: int, dots=_dot3):
    """Panel i of H_p @ u_cur (true factor values, f32 accumulation).

    Returns (y_panel [128, dup], u_cur panel [128, dup]). The dw window
    contraction is tiled 128 rows at a time so the bf16 cast temporaries
    never exceed one panel. All dynamic starts multiply by 128 LAST.

    UNTRIMMED by design (unlike blocksparse._fused_kernel): the zero-tile
    trim needs dynamic-bound loops whose temporaries pushed this
    2-plane-resident kernel past the scoped-VMEM edge (measured 16.0-16.3M
    vs the 15.8M limit at the bench geometry; `dynamic_slice` on values is
    not lowerable, so trimmed lane windows must be re-read and re-cast per
    tile). The per-call kernel — the headline, with only one resident
    plane — trims both sides; the chain's value is dispatch amortization,
    where the ~14% dw-MXU trim would be noise against the VMEM risk.
    (``dots``: the split-bf16 product; see :func:`_hv_panel_f32` for the
    full-f32-fidelity GF variant.)
    """
    base_t = jnp.minimum(jnp.maximum(i - d_dw, 0), (ddp - w_dw) // 128)
    v_blk = vbuf[cur, pl.ds(i * 128, 128), :]
    vb_hi = v_blk.astype(jnp.bfloat16)
    vb_lo = (v_blk - vb_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # separable diagonal: diag_panel = A[i*128:(i+1)*128] @ B
    diag_panel = jnp.dot(a_ref[pl.ds(i * 128, 128), :], b_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=_HIGHEST)
    acc = diag_panel * v_blk

    # dw hops: banded row slab x window of u_cur rows, tiled by 128
    for wt in range(w_dw // 128):
        wrow = vbuf[cur, pl.ds((base_t + wt) * 128, 128), :]
        w_hi = wrow.astype(jnp.bfloat16)
        w_lo = (wrow - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + dots(
            dwhi_ref[pl.ds(i * 128, 128), wt * 128:(wt + 1) * 128],
            dwlo_ref[pl.ds(i * 128, 128), wt * 128:(wt + 1) * 128],
            w_hi, w_lo)

    # up hops: per column panel, lane window of this row panel x column slab
    ntu = dup // 128
    up_parts = []
    for j in range(ntu):
        s = min(max((j - d_up) * 128, 0), dup - w_up)
        up_parts.append(dots(vb_hi[:, s:s + w_up], vb_lo[:, s:s + w_up],
                             uphi_ref[j], uplo_ref[j]))
    acc = acc + (up_parts[0] if ntu == 1
                 else jnp.concatenate(up_parts, axis=1))
    return acc, v_blk


def _chain_specs(pop: BsPaddedOp, ddp: int, dup: int):
    """Input specs shared by both chain kernels (v0 + resident factors)."""
    ntu = dup // 128
    rp = pop.diag_a.shape[1]
    return [
        pl.BlockSpec(memory_space=pl.ANY),                    # v0 (DMA'd)
        pl.BlockSpec((ddp, pop.w_dw), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),                # dw hi (2D)
        pl.BlockSpec((ddp, pop.w_dw), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),                # dw lo
        pl.BlockSpec((ntu, pop.w_up, 128), lambda *_: (0, 0, 0),
                     memory_space=pltpu.VMEM),                # up hi
        pl.BlockSpec((ntu, pop.w_up, 128), lambda *_: (0, 0, 0),
                     memory_space=pltpu.VMEM),                # up lo
        pl.BlockSpec((ddp, rp), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),                # diag A
        pl.BlockSpec((rp, dup), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),                # diag B
    ]


def _chain_inputs(pop: BsPaddedOp, v32p: jnp.ndarray):
    ddp, dup = pop.padded_shape
    ntd = ddp // 128
    return (v32p,
            pop.dw_hi.reshape(ntd * 128, pop.w_dw),
            pop.dw_lo.reshape(ntd * 128, pop.w_dw),
            pop.up_hi, pop.up_lo, pop.diag_a, pop.diag_b)


# --------------------------------------------------------------------------
# kernel 1: K-step Lanczos tridiagonalization
# (one grid step per Lanczos step; panels via in-kernel fori_loop — the
# round-4 "v2" structure, which measured ~20 us/step cheaper than a
# grid-per-panel layout)
# --------------------------------------------------------------------------
def _tridiag_kernel(v0_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
                    a_ref, b_ref, alphas_ref, betas_ref,
                    vbuf, st, sem, *, kk: int, d_dw: int, w_dw: int,
                    ddp: int, d_up: int, w_up: int, dup: int):
    k = pl.program_id(0)
    ntd = ddp // 128
    cur = jax.lax.rem(k, 2)
    prv = 1 - cur

    @pl.when(k == 0)
    def _():
        dma = pltpu.make_async_copy(v0_ref, vbuf.at[0], sem)
        dma.start()
        dma.wait()
        st[_DOT] = 0.0
        st[_SS] = 0.0
        st[_SPRV] = 0.0
        st[_SCUR] = 1.0
        st[_BETA] = 0.0

    coup = st[_BETA] * st[_SPRV]
    s_cur = st[_SCUR]

    def p0(i, _):
        hv, v_blk = _hv_panel(vbuf, cur, i, dwhi_ref, dwlo_ref, uphi_ref,
                              uplo_ref, a_ref, b_ref, d_dw=d_dw, w_dw=w_dw,
                              ddp=ddp, d_up=d_up, w_up=w_up, dup=dup)
        y = s_cur * hv
        st[_DOT] += jnp.sum(v_blk * y)

        @pl.when(k > 0)
        def _():
            vbuf[prv, pl.ds(i * 128, 128), :] = \
                y - coup * vbuf[prv, pl.ds(i * 128, 128), :]

        @pl.when(k == 0)
        def _():
            vbuf[prv, pl.ds(i * 128, 128), :] = y
        return 0

    jax.lax.fori_loop(0, ntd, p0, 0)
    alpha = s_cur * st[_DOT]
    alphas_ref[k, 0] = alpha
    st[_DOT] = 0.0
    co = alpha * s_cur

    def p1(i, _):
        w = vbuf[prv, pl.ds(i * 128, 128), :] \
            - co * vbuf[cur, pl.ds(i * 128, 128), :]
        vbuf[prv, pl.ds(i * 128, 128), :] = w
        st[_SS] += jnp.sum(w * w)
        return 0

    jax.lax.fori_loop(0, ntd, p1, 0)
    beta = jnp.sqrt(st[_SS])
    betas_ref[k, 0] = beta
    st[_SPRV] = st[_SCUR]
    st[_SCUR] = jnp.where(beta > 1e-30, 1.0 / beta, 0.0)
    st[_BETA] = beta
    st[_SS] = 0.0


@partial(jax.jit, static_argnames=("kk", "interpret"))
def _tridiag_call(pop: BsPaddedOp, v32p: jnp.ndarray, kk: int,
                  interpret: bool = False):
    with jax.enable_x64(False):
        ddp, dup = v32p.shape
        kern = partial(_tridiag_kernel, kk=kk, d_dw=pop.d_dw, w_dw=pop.w_dw,
                       ddp=ddp, d_up=pop.d_up, w_up=pop.w_up, dup=dup)
        return pl.pallas_call(
            kern,
            grid=(kk,),
            in_specs=_chain_specs(pop, ddp, dup),
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
            scratch_shapes=[
                pltpu.VMEM((2, ddp, dup), jnp.float32),
                pltpu.SMEM((8,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=CHAIN_VMEM_LIMIT),
            interpret=interpret,
        )(*_chain_inputs(pop, v32p))


def tridiag_call(op, v32p, kk: int, interpret: bool = False):
    return _tridiag_call(_pop(op), v32p, kk,
                         interpret=_auto_interpret(interpret))


def cheb_call(op, v32p, ce, kk: int, interpret: bool = False):
    return _cheb_call(_pop(op), v32p, ce, kk,
                      interpret=_auto_interpret(interpret))


def tridiag_chain(op, v32p: jnp.ndarray, m: int, interpret: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, float]:
    """m-step fused Lanczos tridiagonalization from a normalized padded v0.

    Returns (alphas[m], betas[m], beta_out) — (alphas, betas) in the
    lanczos_tridiag layout (betas[0]=0, betas[j] couples steps j-1 <-> j)
    and beta_out the coupling out of the last vector (the Ritz residual
    scale). One kernel launch (K bucketed up).
    """
    kk = _bucket_k(m)
    al, be = tridiag_call(op, v32p, kk, interpret=_auto_interpret(interpret))
    al = np.asarray(al).ravel()[:m].astype(np.float64)
    be_raw = np.asarray(be).ravel()[:m].astype(np.float64)
    betas = np.concatenate([[0.0], be_raw[:m - 1]])
    return al, betas, float(be_raw[m - 1])


# --------------------------------------------------------------------------
# kernel 2: K-step scaled Chebyshev filter
# --------------------------------------------------------------------------
def _cheb_kernel(v0_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
                 a_ref, b_ref, ce_ref, vout_ref, ssout_ref,
                 vbuf, st, sem, sem2, *, kk: int, d_dw: int, w_dw: int,
                 ddp: int, d_up: int, w_up: int, dup: int):
    k = pl.program_id(0)
    ntd = ddp // 128
    cur = jax.lax.rem(k, 2)
    prv = 1 - cur

    @pl.when(k == 0)
    def _():
        dma = pltpu.make_async_copy(v0_ref, vbuf.at[0], sem)
        dma.start()
        dma.wait()
        st[_SS] = 0.0
        st[_SPRV] = 0.0
        st[_SCUR] = 1.0

    c = ce_ref[0, 0]
    inv_e = ce_ref[1, 0]
    fac = jnp.where(k == 0, inv_e, 2.0 * inv_e) * st[_SCUR]
    ss_coef = st[_SCUR] * st[_SPRV]

    def p0(i, _):
        hv, v_blk = _hv_panel(vbuf, cur, i, dwhi_ref, dwlo_ref, uphi_ref,
                              uplo_ref, a_ref, b_ref, d_dw=d_dw, w_dw=w_dw,
                              ddp=ddp, d_up=d_up, w_up=w_up, dup=dup)
        r0 = fac * (hv - c * v_blk)

        @pl.when(k > 0)
        def _():
            # t_{k+1} = (2/e)(H-c)t_k - t_{k-1} with raw (unnormalized)
            # stored vectors u_k: the u_{k-1} coefficient is
            # 1/(beta_k beta_{k-1}) = s_cur * s_prv (module docstring)
            r = r0 - ss_coef * vbuf[prv, pl.ds(i * 128, 128), :]
            vbuf[prv, pl.ds(i * 128, 128), :] = r
            st[_SS] += jnp.sum(r * r)

        @pl.when(k == 0)
        def _():
            vbuf[prv, pl.ds(i * 128, 128), :] = r0
            st[_SS] += jnp.sum(r0 * r0)
        return 0

    jax.lax.fori_loop(0, ntd, p0, 0)
    nrm = jnp.sqrt(st[_SS])
    st[_SPRV] = st[_SCUR]
    st[_SCUR] = jnp.where(nrm > 1e-30, 1.0 / nrm, 0.0)
    st[_SS] = 0.0

    @pl.when(k == kk - 1)
    def _():
        ssout_ref[0, 0] = nrm
        dma2 = pltpu.make_async_copy(vbuf.at[prv], vout_ref, sem2)
        dma2.start()
        dma2.wait()


@partial(jax.jit, static_argnames=("kk", "interpret"))
def _cheb_call(pop: BsPaddedOp, v32p: jnp.ndarray, ce: jnp.ndarray,
               kk: int, interpret: bool = False):
    with jax.enable_x64(False):
        ddp, dup = v32p.shape
        kern = partial(_cheb_kernel, kk=kk, d_dw=pop.d_dw, w_dw=pop.w_dw,
                       ddp=ddp, d_up=pop.d_up, w_up=pop.w_up, dup=dup)
        return pl.pallas_call(
            kern,
            grid=(kk,),
            in_specs=_chain_specs(pop, ddp, dup) + [
                pl.BlockSpec((2, 1), lambda *_: (0, 0),
                             memory_space=pltpu.SMEM),        # (c, 1/e)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # v filtered
                pl.BlockSpec((1, 1), lambda *_: (0, 0),
                             memory_space=pltpu.SMEM),        # its norm
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ddp, dup), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, ddp, dup), jnp.float32),
                pltpu.SMEM((8,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=CHAIN_VMEM_LIMIT),
            interpret=interpret,
        )(*_chain_inputs(pop, v32p), ce)


def cheb_chain(op, v32p: jnp.ndarray, m: int, c: float, e: float,
               interpret: bool = False) -> jnp.ndarray:
    """m-step scaled Chebyshev filter T_m((H - c)/e) v, normalized output.

    Eigencomponents inside [c-e, c+e] are damped to <= 1; components below
    c-e are amplified by cosh(m acosh((c-lam)/e + ...)) — the ground state
    dominates the output after ~tens of steps.
    """
    kk = _bucket_k(m)
    ce = jnp.asarray(np.array([[c], [1.0 / e]], np.float32))
    v, nrm = cheb_call(op, v32p, ce, kk, interpret=_auto_interpret(interpret))
    return v / jnp.maximum(nrm[0, 0], 1e-30)


# --------------------------------------------------------------------------
# glue: fused-chain ground-state seed
# --------------------------------------------------------------------------
# Ritz ghost-cluster tolerance, as a fraction of the spectral span: the
# chain runs WITHOUT reorthogonalization in split-bf16 matvec precision, so
# converged eigenvalues re-appear as near-duplicate "ghosts" a few 1e-6
# relative above theta_0 (round-4 on-chip measurement: ghost at +2e-6 on
# the 854k sector whose physical gap is ~1e-1). Everything within this
# window of theta_0 is ONE target cluster: the filter cut must sit in the
# gap OUTSIDE it (a ghost mistaken for the first excited state collapses
# the filter window to nothing and the seed never converges), and the
# seed-quality overlap must sum over the whole cluster (the start vector's
# ground-state weight SPLITS across ghost copies).
_GHOST_TOL = 3e-5


def _ritz_bounds(op, v0, m_tri, interpret):
    """One fused tridiag chain -> (theta ascending, b_safe, cluster
    overlap |<v_start, span{ritz in theta_0 cluster}>|, cluster_tol)."""
    alphas, betas, beta_out = tridiag_chain(op, v0, m_tri,
                                            interpret=interpret)
    m_eff = m_tri
    for j in range(1, m_tri):
        if betas[j] <= 1e-20:          # invariant subspace exhausted
            m_eff = j
            beta_out = 0.0
            break
    t = np.diag(alphas[:m_eff]) + np.diag(betas[1:m_eff], 1) \
        + np.diag(betas[1:m_eff], -1)
    theta, s = np.linalg.eigh(t)
    span = max(float(theta[-1] - theta[0]), 1e-12)
    # the top Ritz value underestimates lambda_max; pad by its residual
    # (|beta_out * last row of top eigvec|) so the filter interval truly
    # covers the spectrum — components above b would be amplified
    resid_top = abs(beta_out * float(s[m_eff - 1, -1]))
    b_safe = float(theta[-1]) + 4.0 * resid_top + 1e-3 * span
    # start-vector weight on the theta_0 cluster (true degeneracies AND
    # Lanczos ghosts): sum of squared components over every Ritz pair
    # within _GHOST_TOL*span of theta_0
    cluster_tol = _GHOST_TOL * span
    cluster = theta <= float(theta[0]) + cluster_tol
    s00 = float(np.sqrt(np.sum(s[0, cluster] ** 2)))
    return theta, b_safe, s00, cluster_tol


# --------------------------------------------------------------------------
# GF continued-fraction chains in-kernel (full f32 fidelity)
# --------------------------------------------------------------------------
# The GF tridiagonalization (lanczos_tridiag: ED_GF_NORMAL.f90:633-637 /
# sp_lanc_tridiag) is exactly the chain the tridiag kernel computes — but
# continued fractions need the dense-mixed (~1e-7) matvec contract, and a
# two-part bf16 split carries only 16 mantissa bits however many passes are
# taken. This variant therefore keeps the factors as plain f32 slabs (same
# bytes as the hi+lo pair) and lets Mosaic's 6-pass HIGHEST dot deliver
# full f32 fidelity. ~2x the MXU passes of the ground-state chain; still
# banded (vs the dense path's full tiles) and per-step HBM = 0.

def _dotf(x32, a32):
    return jnp.dot(x32, a32, preferred_element_type=jnp.float32,
                   precision=_HIGHEST)


def gf_chain_applicable(op, m: int) -> bool:
    """VMEM gate for the f32-fidelity GF chain: 2 f32 planes + both f32
    slab stacks resident; chain length within one kernel launch."""
    pop = _pop(op)
    if m > _K_BUCKETS[-1] or pop.dw_f32 is None:
        return False
    ddp, dup = pop.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    resident = (2 * 4 * ddp * dup
                + 4 * ntd * 128 * pop.w_dw + 4 * ntu * pop.w_up * 128
                + 4 * (ddp + dup) * pop.diag_a.shape[1])
    return resident <= CHAIN_VMEM_BUDGET


def _hv_panel_f32(vbuf, cur, i, dw_ref, up_ref, a_ref, b_ref, *,
                  d_dw: int, w_dw: int, ddp: int, d_up: int, w_up: int,
                  dup: int):
    """Panel i of H_p @ u_cur at full f32 fidelity (6-pass HIGHEST dots
    over plain f32 banded slabs); same geometry as :func:`_hv_panel`
    (and untrimmed for the same scoped-VMEM reason)."""
    base_t = jnp.minimum(jnp.maximum(i - d_dw, 0), (ddp - w_dw) // 128)
    v_blk = vbuf[cur, pl.ds(i * 128, 128), :]
    diag_panel = jnp.dot(a_ref[pl.ds(i * 128, 128), :], b_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=_HIGHEST)
    acc = diag_panel * v_blk
    for wt in range(w_dw // 128):
        wrow = vbuf[cur, pl.ds((base_t + wt) * 128, 128), :]
        acc = acc + _dotf(
            dw_ref[pl.ds(i * 128, 128), wt * 128:(wt + 1) * 128], wrow)
    ntu = dup // 128
    up_parts = []
    for j in range(ntu):
        s = min(max((j - d_up) * 128, 0), dup - w_up)
        up_parts.append(_dotf(v_blk[:, s:s + w_up], up_ref[j]))
    acc = acc + (up_parts[0] if ntu == 1
                 else jnp.concatenate(up_parts, axis=1))
    return acc, v_blk


def _gf_tridiag_kernel(v0_ref, dw_ref, up_ref, a_ref, b_ref,
                       alphas_ref, betas_ref, vbuf, st, sem, *, kk: int,
                       d_dw: int, w_dw: int, ddp: int, d_up: int,
                       w_up: int, dup: int):
    """K Lanczos steps at f32 fidelity — body identical to
    `_tridiag_kernel` modulo the panel apply."""
    k = pl.program_id(0)
    ntd = ddp // 128
    cur = jax.lax.rem(k, 2)
    prv = 1 - cur

    @pl.when(k == 0)
    def _():
        dma = pltpu.make_async_copy(v0_ref, vbuf.at[0], sem)
        dma.start()
        dma.wait()
        st[_DOT] = 0.0
        st[_SS] = 0.0
        st[_SPRV] = 0.0
        st[_SCUR] = 1.0
        st[_BETA] = 0.0

    coup = st[_BETA] * st[_SPRV]
    s_cur = st[_SCUR]

    def p0(i, _):
        hv, v_blk = _hv_panel_f32(vbuf, cur, i, dw_ref, up_ref, a_ref,
                                  b_ref, d_dw=d_dw, w_dw=w_dw, ddp=ddp,
                                  d_up=d_up, w_up=w_up, dup=dup)
        y = s_cur * hv
        st[_DOT] += jnp.sum(v_blk * y)

        @pl.when(k > 0)
        def _():
            vbuf[prv, pl.ds(i * 128, 128), :] = \
                y - coup * vbuf[prv, pl.ds(i * 128, 128), :]

        @pl.when(k == 0)
        def _():
            vbuf[prv, pl.ds(i * 128, 128), :] = y
        return 0

    jax.lax.fori_loop(0, ntd, p0, 0)
    alpha = s_cur * st[_DOT]
    alphas_ref[k, 0] = alpha
    st[_DOT] = 0.0
    co = alpha * s_cur

    def p1(i, _):
        w = vbuf[prv, pl.ds(i * 128, 128), :] \
            - co * vbuf[cur, pl.ds(i * 128, 128), :]
        vbuf[prv, pl.ds(i * 128, 128), :] = w
        st[_SS] += jnp.sum(w * w)
        return 0

    jax.lax.fori_loop(0, ntd, p1, 0)
    beta = jnp.sqrt(st[_SS])
    betas_ref[k, 0] = beta
    st[_SPRV] = st[_SCUR]
    st[_SCUR] = jnp.where(beta > 1e-30, 1.0 / beta, 0.0)
    st[_BETA] = beta
    st[_SS] = 0.0


def _gf_tridiag_one(pop: BsPaddedOp, v32p: jnp.ndarray, kk: int,
                    interpret: bool):
    ddp, dup = v32p.shape
    ntd = ddp // 128
    ntu = dup // 128
    rp = pop.diag_a.shape[1]
    kern = partial(_gf_tridiag_kernel, kk=kk, d_dw=pop.d_dw, w_dw=pop.w_dw,
                   ddp=ddp, d_up=pop.d_up, w_up=pop.w_up, dup=dup)
    return pl.pallas_call(
        kern,
        grid=(kk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # v0 (DMA'd)
            pl.BlockSpec((ddp, pop.w_dw), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),            # dw f32 (2D)
            pl.BlockSpec((ntu, pop.w_up, 128), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # up f32
            pl.BlockSpec((ddp, rp), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),            # diag A
            pl.BlockSpec((rp, dup), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),            # diag B
        ],
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
        scratch_shapes=[
            pltpu.VMEM((2, ddp, dup), jnp.float32),
            pltpu.SMEM((8,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=CHAIN_VMEM_LIMIT),
        interpret=interpret,
    )(v32p, pop.dw_f32.reshape(ntd * 128, pop.w_dw), pop.up_f32,
      pop.diag_a, pop.diag_b)


@partial(jax.jit, static_argnames=("kk", "b", "interpret"))
def _gf_batch_call(pop: BsPaddedOp, chunk_p: jnp.ndarray, kk: int,
                   b: int, interpret: bool = False):
    """B independent GF chains in ONE XLA program (one dispatch through the
    tunnel, B sequential kernel launches on device). `chunk_p` is
    [bc, ddp, dup] f32 permuted padded (bc <= b); the zero-chain batch
    fill happens inside the jit. Keyed on the padded geometry only."""
    bc = chunk_p.shape[0]
    vps = [chunk_p[i] for i in range(bc)]
    vps += [jnp.zeros(pop.padded_shape, jnp.float32)] * (b - bc)
    with jax.enable_x64(False):
        als, bes = [], []
        for i in range(b):
            al, be = _gf_tridiag_one(pop, vps[i], kk, interpret)
            als.append(al[:, 0])
            bes.append(be[:, 0])
        return jnp.stack(als), jnp.stack(bes)


@partial(jax.jit, static_argnames=("ddp", "dup"))
def _to_padded_batch(perm_dw, perm_up, chunk_nd, ddp: int, dup: int):
    """[B, dd, du] natural -> [B, ddp, dup] permuted padded f32 (the one
    boundary program that still keys on natural dims — a cheap gather+pad,
    unlike the kernels)."""
    vp = chunk_nd[:, perm_dw][:, :, perm_up].astype(jnp.float32)
    dd, du = chunk_nd.shape[1], chunk_nd.shape[2]
    return jnp.pad(vp, ((0, 0), (0, ddp - dd), (0, dup - du)))


GF_CHAIN_BATCH = 8    # chains per jit (compile time grows with the unroll)


def gf_tridiag_batch(op: BlockSparseSectorOp, v_batch: jnp.ndarray, m: int,
                     interpret: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched GF tridiagonalization through the fused f32 chain kernel.

    v_batch: [B, dim] f64 flat natural-layout start vectors (normalized);
    returns (alphas [B, m], betas [B, m]) f64 in the lanczos_tridiag layout
    (betas[:, 0] = 0) — drop-in for `lanczos_tridiag_batched` where
    :func:`gf_chain_applicable` holds. Chains are run in chunks of
    GF_CHAIN_BATCH per dispatch; the last chunk is zero-filled to a power
    of two (dead chains, exactly-zero tridiagonals) so executables are
    per (bucket, pow2-B), not per batch size.
    """
    pop = op.pop
    ddp, dup = pop.padded_shape
    kk = _bucket_k(m)
    b_total = v_batch.shape[0]
    interp = _auto_interpret(interpret)
    al_all, be_all = [], []
    for i0 in range(0, b_total, GF_CHAIN_BATCH):
        chunk = v_batch[i0:i0 + GF_CHAIN_BATCH]
        bc = chunk.shape[0]
        # fixed batch size: dead chains cost ~ms of kernel time while a
        # fresh (geometry, B) pair costs seconds of remote compile
        bpad = GF_CHAIN_BATCH
        chunk_p = _to_padded_batch(
            op.perm_dw, op.perm_up,
            chunk.reshape(bc, op.dim_dw, op.dim_up), ddp, dup)
        al, be = _gf_batch_call(pop, chunk_p, kk, bpad, interpret=interp)
        al_all.append(np.asarray(al, np.float64)[:bc])
        be_all.append(np.asarray(be, np.float64)[:bc])
    al = np.concatenate(al_all)[:, :m]
    be_raw = np.concatenate(be_all)
    betas = np.concatenate(
        [np.zeros((b_total, 1)), be_raw[:, :m - 1]], axis=1)
    return al, betas


def ground_state_seed(op: BlockSparseSectorOp, m_tri: int = 96,
                      m_cheb: int = 128, seed: int = 17,
                      interpret: bool = False,
                      v0: Optional[jnp.ndarray] = None,
                      max_rounds: int = 3, eta_target: float = 3e-3,
                      return_padded: bool = False):
    """Ground-state seed via fused tridiag chains + Chebyshev filters.

    Iterates (tridiag chain -> Ritz bounds -> filter) until the current
    vector's overlap with the lowest Ritz direction reaches
    1 - eta_target^2 (or ``max_rounds``). The damping cut sits strictly
    inside the (theta_0, theta_1) Ritz gap so the first excited state is
    never amplified, and the upper bound b is taken from the FIRST round
    (a random start sees the top of the spectrum; filtered starts do not —
    re-estimating b from them would underestimate lambda_max and blow up
    the filter).

    Returns (theta_min estimate, normalized seed vector, eta): the seed in
    the natural [dim_dw, dim_up] f64 layout by default, or the permuted
    padded f32 layout when ``return_padded`` (the padded-space solver path
    — no natural-shape program is compiled then). eta is the
    (conservative, last-measured) estimated angle of the seed to the
    lowest Ritz direction — the two-stage solver uses it to decide whether
    the Lanczos top-off can be skipped. The pad subspace starts exactly
    zero and stays exactly zero (zero factor rows, to_padded zero-fill),
    so the PAD_SHIFT diagonal never enters the bounds.
    """
    if v0 is None:
        # host RNG + host to_padded: no per-sector-shape device executables
        rng = np.random.default_rng(seed)
        v0n = rng.standard_normal((op.dim_dw, op.dim_up))
        v0 = to_padded(op, v0n / np.linalg.norm(v0n))
    v = v0
    b_global = None
    theta = None
    eta = 1.0
    for _ in range(max_rounds):
        theta, b_safe, s00, cluster_tol = _ritz_bounds(op, v, m_tri,
                                                       interpret)
        eta = float(np.sqrt(max(1.0 - s00 * s00, 0.0)))
        b_global = b_safe if b_global is None else max(b_global, b_safe)
        if 1.0 - s00 * s00 <= eta_target * eta_target:
            break
        span = max(b_global - float(theta[0]), 1e-12)
        # first Ritz value OUTSIDE the theta_0 cluster (true degeneracies
        # and Lanczos ghosts collapse onto theta_0 — see _GHOST_TOL; the
        # filter targets the whole cluster subspace)
        distinct = theta[theta > theta[0] + cluster_tol]
        gap = float(distinct[0] - theta[0]) if distinct.size \
            else 0.02 * span
        cut = float(theta[0]) + 0.35 * gap
        c = 0.5 * (b_global + cut)
        e = max(0.5 * (b_global - cut), 1e-12 * span)
        v = cheb_chain(op, v, m_cheb, c, e, interpret=interpret)
    if return_padded:
        return float(theta[0]), v, eta
    vnat = from_padded(op, v, jnp.float64)
    vnat = vnat / jnp.linalg.norm(vnat)
    return float(theta[0]), vnat, eta
