"""Band-sparse fused Pallas TPU kernel for the sector matvec.

TPU-native re-design of the hot sector SpMV (reference hot loop:
spMatVec_main / spMatVec_mpi_main, ED_HAMILTONIAN_SPARSE_HxV.f90:391-485).
Round-3 design, driven by measured facts (experiments/kernel_probe*.py):

1. **Slope-timed truth.** The axon tunnel adds ~24 ms of fixed latency to
   every dispatch; with that removed, the dense XLA backends run the 854k
   bench sector at 96 us (fast/HIGH) / 161 us (mixed/HIGHEST) per matvec —
   MXU-pass-bound, not glue-bound.

2. **Manual split-bf16 3-pass matmuls.** Mosaic's dot lowering only offers
   DEFAULT (1-pass bf16, ~1e-2 error) and HIGHEST (6-pass); XLA's 3-pass
   HIGH is unavailable inside kernels. This kernel implements the 3-pass
   product manually: A ~ A_hi + A_lo (bf16 split, precomputed), v split
   per step, A@v ~ A_hi@v_hi + A_hi@v_lo + A_lo@v_hi — halving the MXU
   passes vs HIGHEST at the ~1.5e-5 relative-error contract the polish
   (ops/lanczos.refine_eigenpairs, self-tuning rounds) recovers from.

3. **RCM banding on both factors.** A reverse-Cuthill-McKee reordering of
   each hop graph (host scipy) concentrates the nnz into a band of a few
   128-tiles (measured: band 224 of 924 on the bench factor); both the dw
   (sublane-side) and up (lane-side) contractions use clipped banded slabs,
   skipping the all-zero tiles the dense path multiplies.

4. **Static zero-tile run trims (round 5).** 27.5% of the 128x128 tiles
   inside the uniform band windows are exactly zero (window-edge clamping
   plus local band variation — measured census, ROUND4_NOTES); the
   reference's CSR SpMV never multiplies a stored zero either
   (ED_SPARSE_MATRIX.f90:255-285). Harvesting them needs care: the
   dynamic-control-flow forms (SMEM tile lists + dynamic-bound fori, or
   per-tile lax.cond) all LOSE on chip — measured 82/76/60 us/mv vs the
   54 us untrimmed kernel (experiments/trim_ab.py: tiny [128,128] dots in
   dynamic loops stall the MXU pipeline; dynamic_slice on values is not
   lowerable so lanes re-read+re-cast per tile). What wins is the fully
   STATIC form: a no-grid kernel with python-unrolled panels whose
   per-panel contiguous RUNS of nonzero tiles are compile-time constants
   — every zero tile skipped with large static dots: **40.2 us/mv, 276
   Gnnz/s, 1.02x of the untrimmed-window kernel roofline** (the roofline
   denominator counts the zero tiles it no longer multiplies). The runs
   are stashed on the op OUTSIDE the pytree (``_trim_runs``) so they
   never enter a jit key: the bucketed chain/grid kernels are unaffected,
   and the runs kernel — compiled per sector — serves the per-call
   chain wrappers (bench, chain_step) where per-sector compiles are paid
   once against thousands of launches.

5. **Separable low-rank diagonal.** The sector diagonal is an exactly
   low-rank sum of up x dw occupation products (chemical potential, level
   energies, density-density interactions); an adaptive-cross (ACA)
   factorization on host (exact for exactly-low-rank matrices) turns the
   4.2 MB diagonal stream into two tiny factor matrices contracted on the
   MXU inside the kernel — diag_tile = A[i-panel] @ B, elementwise times v.

6. **Fused chain normalization.** The kernel takes a scalar ``scale``
   (SMEM) and emits per-panel sums of squares, so a normalized Lanczos
   chain step is exactly one kernel launch with no extra HBM pass.

7. **Compile-key discipline (round 5, the cold-diag fix).** Everything a
   jitted program touches lives in :class:`BsPaddedOp` — padded-space
   arrays plus the padded-space f64/f32 exact factors for the polish — so
   executables key on the PADDED geometry (ddp, dup, W, rank), which many
   sectors share, instead of on per-sector natural dims. The outer
   :class:`BlockSparseSectorOp` carries the natural-order factors and the
   RCM permutations for the boundary crossings and oracles only.

The permutation is a similarity transform: the whole Krylov chain runs in
the permuted, padded f32 space; vectors cross the boundary once per chain.
Pad rows/cols of the factors are zero and the pad diagonal is shifted
+PAD_SHIFT, so the pad subspace is exactly invariant and spectrally far
above the physics.

Gotchas (hard-won): Mosaic fails to legalize kernels when jax x64 mode is
on (every pallas_call runs under ``jax.enable_x64(False)``); dynamic slice
starts must be *provably* tile-aligned — multiply tile indices by 128 as
the last operation. Dynamic-bound ``fori_loop`` over SMEM tile lists and
dynamic lane-dimension slices both lower fine (probed on-chip, round 5).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hamiltonian import SectorHamiltonian

_HIGHEST = jax.lax.Precision.HIGHEST

# resident VMEM budget for applicability (v5e has ~16 MB/core; leave room
# for the streamed/double-buffered blocks and the compiler's scratch)
VMEM_RESIDENT_BUDGET = 10 * 1024 * 1024
VMEM_LIMIT = 14 * 1024 * 1024
PAD_SHIFT = 1.0e3   # pad-row diagonal shift (see parallel.production)
ACA_RANK_MAX = 24   # diagonal separability cap (physics: ~2 + norb^2)


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _factor_dense(cols: np.ndarray, vals: np.ndarray, n: int) -> np.ndarray:
    h = np.zeros((n, n))
    np.add.at(h, (np.repeat(np.arange(n), cols.shape[1]),
                  np.asarray(cols).ravel()),
              np.asarray(vals, np.float64).ravel())
    return h


def _rcm_perm(h: np.ndarray) -> np.ndarray:
    """Reverse-Cuthill-McKee ordering of a symmetric factor (host scipy)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    m = sp.csr_matrix(h)
    m.eliminate_zeros()
    return np.asarray(reverse_cuthill_mckee(m, symmetric_mode=True),
                      np.int64)


def _band(h: np.ndarray) -> int:
    i, j = np.nonzero(h)
    return int(np.abs(i - j).max()) if i.size else 0


def _split_bf16(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """a ~ hi + lo with both parts bf16 (the manual 3-pass decomposition)."""
    a32 = np.asarray(a, np.float32)
    hi = jnp.asarray(a32).astype(jnp.bfloat16)
    lo = (jnp.asarray(a32) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _aca(diag: np.ndarray, rmax: int = ACA_RANK_MAX,
         tol: float = 1e-12) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Adaptive cross approximation diag ~ sum_r a_r (x) b_r (exact for the
    exactly-low-rank sector diagonals; None if rank exceeds rmax)."""
    r = np.array(diag, np.float64)
    scale = np.abs(r).max() or 1.0
    a_list, b_list = [], []
    for _ in range(rmax):
        flat = np.abs(r).argmax()
        i, j = np.unravel_index(flat, r.shape)
        piv = r[i, j]
        if abs(piv) <= tol * scale:
            break
        a = r[:, j].copy()
        b = r[i, :] / piv
        a_list.append(a)
        b_list.append(b)
        r -= np.outer(a, b)
    if np.abs(r).max() > 10 * tol * scale:
        return None
    if not a_list:
        a_list, b_list = [np.zeros(diag.shape[0])], [np.zeros(diag.shape[1])]
    return np.stack(a_list, 1), np.stack(b_list, 0)   # [dd, R], [R, du]


def _banded_slabs(h_p: np.ndarray, n: int, np_: int, axis: int
                  ) -> Tuple[np.ndarray, int, int]:
    """Clipped banded slabs of a permuted factor, padded to np_.

    axis=0: row slabs [nt, 128, W] (panel i of rows x column window) —
    the dw form. axis=1: column slabs [nt, W, 128] — the up form.
    """
    nt = np_ // 128
    d = (_band(h_p) + 127) // 128
    w = min((2 * d + 1) * 128, np_)
    hp = np.zeros((np_, np_))
    hp[:n, :n] = h_p
    if axis == 0:
        slabs = np.zeros((nt, 128, w), np.float32)
        for i in range(nt):
            t = min(max((i - d) * 128, 0), np_ - w)
            slabs[i] = hp[i * 128:(i + 1) * 128, t:t + w]
    else:
        slabs = np.zeros((nt, w, 128), np.float32)
        for j in range(nt):
            t = min(max((j - d) * 128, 0), np_ - w)
            slabs[j] = hp[t:t + w, j * 128:(j + 1) * 128]
    return slabs, w, d


def _trim_runs(slabs: np.ndarray, axis: int) -> Tuple[Tuple, ...]:
    """Per-panel contiguous RUNS of nonzero window tiles (the static
    zero-tile trim).

    slabs: [nt, 128, W] (axis=0, dw row slabs) or [nt, W, 128] (axis=1,
    up column slabs). Returns a tuple (hashable, compile-time constant)
    of per-panel tuples of (r0, r1) half-open tile ranges covering every
    nonzero tile, ascending — trimmed accumulation visits the nonzero
    tiles in the untrimmed order, and the skipped terms are exact zeros.
    """
    nt = slabs.shape[0]
    w = slabs.shape[2] if axis == 0 else slabs.shape[1]
    ntw = w // 128
    out = []
    for p in range(nt):
        runs = []
        for wt in range(ntw):
            tile = (slabs[p, :, wt * 128:(wt + 1) * 128] if axis == 0
                    else slabs[p, wt * 128:(wt + 1) * 128, :])
            if np.any(tile != 0.0):
                if runs and runs[-1][1] == wt:
                    runs[-1] = (runs[-1][0], wt + 1)
                else:
                    runs.append((wt, wt + 1))
        out.append(tuple(runs))
    return tuple(out)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BsPaddedOp:
    """Padded-space half of the band-sparse operator — the ONLY pytree any
    jitted solver/kernel program takes, so executables key on the padded
    geometry (shared across sectors) instead of per-sector natural dims."""
    # fused-kernel fields (RCM-permuted, 128-padded)
    dw_hi: jnp.ndarray            # [ntd, 128, Wd] bf16 row slabs of Hdw
    dw_lo: jnp.ndarray
    up_hi: jnp.ndarray            # [ntu, Wu, 128] bf16 column slabs of Hup
    up_lo: jnp.ndarray
    diag_a: jnp.ndarray           # [ddp, R] f32 separable-diagonal factors
    diag_b: jnp.ndarray           # [R, dup] f32
    # padded-space exact factors (polish / top-off / oracle — f64 + f32)
    diag_p: jnp.ndarray           # [ddp, dup] f64 (pad rows/cols +PAD_SHIFT)
    hup_p: jnp.ndarray            # [dup, dup] f64 permuted padded
    hdw_p: jnp.ndarray            # [ddp, ddp] f64
    hup_p32: jnp.ndarray          # f32 copies (mixed top-off contract)
    hdw_p32: jnp.ndarray
    # GF chain-kernel path: plain f32 banded slabs (same geometry as the
    # split-bf16 pairs, same total bytes) consumed with Mosaic 6-pass
    # HIGHEST dots — full f32 fidelity inside the fused chain
    dw_f32: jnp.ndarray = None    # [ntd, 128, Wd] f32
    up_f32: jnp.ndarray = None    # [ntu, Wu, 128] f32
    # static geometry (per-bucket, shared across same-geometry sectors)
    w_dw: int = field(default=0, metadata=dict(static=True))
    d_dw: int = field(default=0, metadata=dict(static=True))
    w_up: int = field(default=0, metadata=dict(static=True))
    d_up: int = field(default=0, metadata=dict(static=True))

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return (self.dw_hi.shape[0] * 128, self.up_hi.shape[0] * 128)

    @property
    def dim(self) -> int:
        ddp, dup = self.padded_shape
        return ddp * dup


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockSparseSectorOp:
    """Sector operator for the band-sparse fused kernel.

    ``pop`` is the padded-space half (kernels + polish). The natural-order
    fields serve the boundary crossings (``to_padded``/``from_padded``),
    the GF/generic flat applies, and the f64 oracle.
    """
    pop: BsPaddedOp
    perm_dw: jnp.ndarray          # [dd] natural -> permuted gather indices
    perm_up: jnp.ndarray          # [du]
    iperm_dw: jnp.ndarray         # [dd] inverse
    iperm_up: jnp.ndarray         # [du]
    # exact path (natural order, f64)
    diag: jnp.ndarray             # [dd, du]
    hup: jnp.ndarray              # [du, du]
    hdw: jnp.ndarray              # [dd, dd]
    # mixed path (natural order, f32 factors for the GF/generic flat apply:
    # f32-true HIGHEST matmuls + f64 diagonal — the dense-backend contract)
    hup32: jnp.ndarray = None
    hdw32: jnp.ndarray = None
    # static metadata
    dim_dw: int = field(default=0, metadata=dict(static=True))
    dim_up: int = field(default=0, metadata=dict(static=True))
    nnz_count: int = field(default=0, metadata=dict(static=True))

    @property
    def dim(self) -> int:
        return self.dim_dw * self.dim_up

    @property
    def nnz(self) -> int:
        return self.nnz_count

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return self.pop.padded_shape

    # geometry passthroughs (tests / sharded path / bench introspect these)
    @property
    def w_dw(self) -> int:
        return self.pop.w_dw

    @property
    def d_dw(self) -> int:
        return self.pop.d_dw

    @property
    def w_up(self) -> int:
        return self.pop.w_up

    @property
    def d_up(self) -> int:
        return self.pop.d_up

    @property
    def dw_hi(self):
        return self.pop.dw_hi

    @property
    def dw_lo(self):
        return self.pop.dw_lo

    @property
    def up_hi(self):
        return self.pop.up_hi

    @property
    def up_lo(self):
        return self.pop.up_lo

    @property
    def diag_a(self):
        return self.pop.diag_a

    @property
    def diag_b(self):
        return self.pop.diag_b

    @property
    def dw_f32(self):
        return self.pop.dw_f32

    @property
    def up_f32(self):
        return self.pop.up_f32


def _pop(op) -> BsPaddedOp:
    """Accept either the outer sector op or the padded half."""
    return op.pop if isinstance(op, BlockSparseSectorOp) else op


def blocksparse_applicable(h: SectorHamiltonian) -> bool:
    """Pure-electron sectors without Jx/Jp whose resident blocks (f32 V +
    split-bf16 banded slabs, actual RCM band widths) fit the VMEM budget
    and whose diagonal is ACA-separable (it always is for density-density
    interactions)."""
    if h.ph_diag is not None or h.nd_up_src is not None:
        return False
    ddp, dup = _pad128(h.dim_dw), _pad128(h.dim_up)
    if 4 * ddp * dup > VMEM_RESIDENT_BUDGET:
        return False                      # resident V alone too large
    # actual banded-slab footprint (RCM + band measurement is ~ms on host)
    hup = _factor_dense(h.up_cols, h.up_vals, h.dim_up)
    hdw = _factor_dense(h.dw_cols, h.dw_vals, h.dim_dw)
    pu, pd = _rcm_perm(hup), _rcm_perm(hdw)
    hup_p = hup[pu][:, pu]
    hdw_p = hdw[pd][:, pd]
    w_up = min((2 * ((_band(hup_p) + 127) // 128) + 1) * 128, dup)
    w_dw = min((2 * ((_band(hdw_p) + 127) // 128) + 1) * 128, ddp)
    # resident: f32 V + split-bf16 up slabs; dw slabs stream per panel
    resident = 4 * ddp * dup + 2 * 2 * (dup // 128) * w_up * 128 \
        + 2 * 2 * 2 * 128 * w_dw
    if resident > VMEM_RESIDENT_BUDGET:
        return False
    return _aca(np.asarray(h.diag, np.float64)) is not None


def build_blocksparse_op(h: SectorHamiltonian) -> BlockSparseSectorOp:
    dd, du = h.dim_dw, h.dim_up
    ddp, dup = _pad128(dd), _pad128(du)
    hup = _factor_dense(h.up_cols, h.up_vals, du)
    hdw = _factor_dense(h.dw_cols, h.dw_vals, dd)
    diag = np.asarray(h.diag, np.float64)

    perm_up = _rcm_perm(hup)
    perm_dw = _rcm_perm(hdw)
    hup_p = hup[perm_up][:, perm_up]
    hdw_p = hdw[perm_dw][:, perm_dw]
    diag_p = diag[perm_dw][:, perm_up]

    dw_slabs, w_dw, d_dw = _banded_slabs(hdw_p, dd, ddp, axis=0)
    up_slabs, w_up, d_up = _banded_slabs(hup_p, du, dup, axis=1)
    dw_hi, dw_lo = _split_bf16(dw_slabs)
    up_hi, up_lo = _split_bf16(up_slabs)
    dw_runs = _trim_runs(dw_slabs, axis=0)
    up_runs = _trim_runs(up_slabs, axis=1)

    # separable diagonal over the padded grid, pad shift included as two
    # extra rank terms: PAD_SHIFT * (1_pad^dw (x) 1 + 1_phys^dw (x) 1_pad^up)
    ab = _aca(diag_p)
    if ab is None:
        raise ValueError("sector diagonal is not ACA-separable "
                         "(use the dense backend)")
    a, b = ab
    r = a.shape[1]
    rp = max(8, ((r + 2 + 7) // 8) * 8)
    diag_a = np.zeros((ddp, rp), np.float32)
    diag_b = np.zeros((rp, dup), np.float32)
    diag_a[:dd, :r] = a
    diag_b[:r, :du] = b
    diag_a[dd:, r] = PAD_SHIFT
    diag_b[r, :] = 1.0
    diag_a[:dd, r + 1] = PAD_SHIFT
    diag_b[r + 1, du:] = 1.0

    # padded-space exact factors (the polish/top-off run entirely in the
    # permuted padded space so their executables key on padded geometry)
    hup_pp = np.zeros((dup, dup))
    hup_pp[:du, :du] = hup_p
    hdw_pp = np.zeros((ddp, ddp))
    hdw_pp[:dd, :dd] = hdw_p
    diag_pp = np.zeros((ddp, dup))
    diag_pp[:dd, :du] = diag_p
    diag_pp[dd:, :] += PAD_SHIFT
    diag_pp[:dd, du:] += PAD_SHIFT

    inv_up = np.empty(du, np.int64)
    inv_up[perm_up] = np.arange(du)
    inv_dw = np.empty(dd, np.int64)
    inv_dw[perm_dw] = np.arange(dd)
    pop = BsPaddedOp(
        dw_hi=dw_hi, dw_lo=dw_lo, up_hi=up_hi, up_lo=up_lo,
        diag_a=jnp.asarray(diag_a), diag_b=jnp.asarray(diag_b),
        diag_p=jnp.asarray(diag_pp), hup_p=jnp.asarray(hup_pp),
        hdw_p=jnp.asarray(hdw_pp),
        hup_p32=jnp.asarray(hup_pp, jnp.float32),
        hdw_p32=jnp.asarray(hdw_pp, jnp.float32),
        dw_f32=jnp.asarray(dw_slabs), up_f32=jnp.asarray(up_slabs),
        w_dw=w_dw, d_dw=d_dw, w_up=w_up, d_up=d_up)
    # static zero-tile runs, stashed OUTSIDE the pytree: available at trace
    # time through the concrete object (per-call wrappers), invisible to
    # jit keys and dropped across jit boundaries (traced pytrees fall back
    # to the untrimmed grid kernel) — see module docstring #4
    object.__setattr__(pop, "_trim_runs", (dw_runs, up_runs))
    op_out = BlockSparseSectorOp(
        pop=pop,
        perm_dw=jnp.asarray(perm_dw), perm_up=jnp.asarray(perm_up),
        iperm_dw=jnp.asarray(inv_dw), iperm_up=jnp.asarray(inv_up),
        diag=jnp.asarray(diag), hup=jnp.asarray(hup), hdw=jnp.asarray(hdw),
        hup32=jnp.asarray(hup, jnp.float32),
        hdw32=jnp.asarray(hdw, jnp.float32),
        dim_dw=dd, dim_up=du, nnz_count=h.nnz)
    # host copies of the permutations: to_padded/from_padded run on HOST
    # so the per-sector boundary crossing costs one transfer, not a fresh
    # per-shape device executable (gather+pad) through the remote compiler
    object.__setattr__(op_out, "_perm_host",
                       (perm_dw, np.asarray(perm_up), inv_dw, inv_up))
    return op_out


# --------------------------------------------------------------------------
# the fused kernel
# --------------------------------------------------------------------------
def _dot3(xhi, xlo, ahi, alo):
    """3-pass split-bf16 product x @ a with f32 accumulation."""
    kw = dict(preferred_element_type=jnp.float32)
    return (jnp.dot(xhi, ahi, **kw) + jnp.dot(xlo, ahi, **kw)
            + jnp.dot(xhi, alo, **kw))


def _fused_kernel(scale_ref, v_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
                  a_ref, b_ref, out_ref, ss_ref, *, d_dw: int, w_dw: int,
                  ddp: int, d_up: int, w_up: int, dup: int):
    """Grid form (one program per row panel), untrimmed windows — the
    geometry-bucketed fallback; see :func:`_runs_kernel` for the trimmed
    production form."""
    i = pl.program_id(0)
    ntu = dup // 128
    # multiply by 128 LAST so Mosaic can statically prove the dynamic
    # starts are tile-aligned
    t = jnp.minimum(jnp.maximum(i - d_dw, 0), (ddp - w_dw) // 128) * 128

    v_blk = v_ref[pl.ds(i * 128, 128), :]
    vb_hi = v_blk.astype(jnp.bfloat16)
    vb_lo = (v_blk - vb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    vw = v_ref[pl.ds(t, w_dw), :]
    vw_hi = vw.astype(jnp.bfloat16)
    vw_lo = (vw - vw_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # separable diagonal: diag_panel = A[i-panel] @ B, elementwise times v
    diag_panel = jnp.dot(a_ref[pl.ds(i * 128, 128), :], b_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=_HIGHEST)
    acc = diag_panel * v_blk
    # dw hops: banded row slab against the resident-V row window
    acc = acc + _dot3(dwhi_ref[0], dwlo_ref[0], vw_hi, vw_lo)
    # up hops: per column panel, banded column slab against a lane window
    # of this row panel (static python loop -> unrolled, static slices)
    up_parts = []
    for j in range(ntu):
        s = min(max((j - d_up) * 128, 0), dup - w_up)
        up_parts.append(_dot3(vb_hi[:, s:s + w_up], vb_lo[:, s:s + w_up],
                              uphi_ref[j], uplo_ref[j]))
    acc = acc + (up_parts[0] if ntu == 1
                 else jnp.concatenate(up_parts, axis=1))
    acc = acc * scale_ref[0, 0]
    out_ref[:] = acc
    # ss is a full-array SMEM output (blocked SMEM specs are not lowerable)
    ss_ref[i, 0] = jnp.sum(acc * acc)


@partial(jax.jit, static_argnames=("interpret",))
def _matvec_padded_pop(pop: BsPaddedOp, v32p: jnp.ndarray,
                       scale: jnp.ndarray, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused matvec on the permuted padded f32 vector (grid form).

    Returns (scale * H_p v, per-panel sums of squares [ntd, 1]). Keyed on
    the padded geometry only (pop carries no natural-dim leaves)."""
    with jax.enable_x64(False):
        ddp, dup = v32p.shape
        ntd = ddp // 128
        kern = partial(_fused_kernel, d_dw=pop.d_dw, w_dw=pop.w_dw, ddp=ddp,
                       d_up=pop.d_up, w_up=pop.w_up, dup=dup)
        rp = pop.diag_a.shape[1]
        return pl.pallas_call(
            kern,
            grid=(ntd,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),        # scale
                pl.BlockSpec((ddp, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # V resident
                pl.BlockSpec((1, 128, pop.w_dw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),        # dw slab hi
                pl.BlockSpec((1, 128, pop.w_dw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),        # dw slab lo
                pl.BlockSpec((dup // 128, pop.w_up, 128),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),        # up slabs hi
                pl.BlockSpec((dup // 128, pop.w_up, 128),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),        # up slabs lo
                pl.BlockSpec((ddp, rp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # diag A
                pl.BlockSpec((rp, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # diag B
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
            interpret=interpret,
        )(scale.reshape(1, 1).astype(jnp.float32), v32p, pop.dw_hi,
          pop.dw_lo, pop.up_hi, pop.up_lo, pop.diag_a, pop.diag_b)


# --------------------------------------------------------------------------
# the static-runs kernel (no grid; python-unrolled panels; zero-tile trims
# as compile-time constants — the winning form, module docstring #4)
# --------------------------------------------------------------------------
RUNS_VMEM_LIMIT = int(15.8 * 1024 * 1024)
RUNS_VMEM_RESIDENT = int(13.6 * 1024 * 1024)


def _runs_kernel(scale_ref, v_ref, dwhi_ref, dwlo_ref, uphi_ref, uplo_ref,
                 a_ref, b_ref, out_ref, ss_ref, *, d_dw: int, w_dw: int,
                 ddp: int, d_up: int, w_up: int, dup: int,
                 dw_runs: Tuple, up_runs: Tuple):
    ntd, ntu = ddp // 128, dup // 128
    sc = scale_ref[0, 0]
    for i in range(ntd):
        t = min(max(i - d_dw, 0), (ddp - w_dw) // 128)
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
        acc = acc + (up_parts[0] if ntu == 1
                     else jnp.concatenate(up_parts, axis=1))
        acc = acc * sc
        out_ref[i * 128:(i + 1) * 128, :] = acc
        ss_ref[i, 0] = jnp.sum(acc * acc)


@partial(jax.jit, static_argnames=("dw_runs", "up_runs", "interpret"))
def _matvec_padded_runs(pop: BsPaddedOp, v32p: jnp.ndarray,
                        scale: jnp.ndarray, dw_runs: Tuple, up_runs: Tuple,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-runs fused matvec: 40.2 us/mv vs the grid form's 54.7 on the
    854k bench sector (276 Gnnz/s — experiments/trim_ab.py). Keys include
    the runs (per sector); use only through the concrete-op wrappers."""
    with jax.enable_x64(False):
        ddp, dup = v32p.shape
        ntd = ddp // 128
        kern = partial(_runs_kernel, d_dw=pop.d_dw, w_dw=pop.w_dw, ddp=ddp,
                       d_up=pop.d_up, w_up=pop.w_up, dup=dup,
                       dw_runs=dw_runs, up_runs=up_runs)
        vspec = [pl.BlockSpec(memory_space=pltpu.SMEM)] \
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        return pl.pallas_call(
            kern,
            in_specs=vspec,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ddp, dup), jnp.float32),
                jax.ShapeDtypeStruct((ntd, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=RUNS_VMEM_LIMIT),
            interpret=interpret,
        )(scale.reshape(1, 1).astype(jnp.float32), v32p,
          pop.dw_hi.reshape(ntd * 128, pop.w_dw),
          pop.dw_lo.reshape(ntd * 128, pop.w_dw),
          pop.up_hi, pop.up_lo, pop.diag_a, pop.diag_b)


def _runs_applicable(pop: BsPaddedOp) -> bool:
    """The no-grid form holds v, out, and BOTH slab stacks resident."""
    ddp, dup = pop.padded_shape
    ntd, ntu = ddp // 128, dup // 128
    resident = (2 * 4 * ddp * dup                      # v + out
                + 2 * 2 * ntd * 128 * pop.w_dw        # dw slabs hi+lo
                + 2 * 2 * ntu * pop.w_up * 128        # up slabs hi+lo
                + 4 * (ddp + dup) * pop.diag_a.shape[1])
    return resident <= RUNS_VMEM_RESIDENT


def _matvec_padded(op, v32p: jnp.ndarray, scale: jnp.ndarray,
                   interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch: static-runs kernel when the trim runs are reachable on
    the concrete op and the resident footprint fits; geometry-bucketed
    grid kernel otherwise (including whenever the op arrives as a traced
    pytree, where the out-of-pytree stash is absent by design)."""
    pop = _pop(op)
    runs = getattr(pop, "_trim_runs", None)
    if runs is not None and _runs_applicable(pop):
        return _matvec_padded_runs(pop, v32p, scale, runs[0], runs[1],
                                   interpret=interpret)
    return _matvec_padded_pop(pop, v32p, scale, interpret=interpret)


def _auto_interpret(interpret: bool) -> bool:
    """Compiled Pallas needs the TPU; on CPU (tests, dryruns) fall back to
    interpreter mode so the backend stays functional everywhere."""
    return interpret or jax.default_backend() == "cpu"


def matvec_bs_padded(op, v32p: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Unscaled fused matvec on the permuted padded f32 vector."""
    y, _ = _matvec_padded(op, v32p, jnp.float32(1.0),
                          interpret=_auto_interpret(interpret))
    return y


def chain_step(op, v32p: jnp.ndarray, inv_norm: jnp.ndarray,
               interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One normalized power-iteration step fused into a single kernel:
    y = (inv_norm * H_p) v, returning (y, rsqrt(|y|^2)) — feed the second
    output back as the next step's inv_norm."""
    y, ss = _matvec_padded(op, v32p, inv_norm,
                           interpret=_auto_interpret(interpret))
    return y, jax.lax.rsqrt(jnp.sum(ss) + 1e-30)


# --------------------------------------------------------------------------
# boundary helpers (natural <-> permuted padded)
# --------------------------------------------------------------------------
def _perm_host(op: BlockSparseSectorOp):
    stash = getattr(op, "_perm_host", None)
    if stash is None:
        stash = (np.asarray(op.perm_dw), np.asarray(op.perm_up),
                 np.asarray(op.iperm_dw), np.asarray(op.iperm_up))
        object.__setattr__(op, "_perm_host", stash)
    return stash


def to_padded(op: BlockSparseSectorOp, v: jnp.ndarray) -> jnp.ndarray:
    """Natural [dd, du] (any float dtype) -> permuted padded f32.

    Runs on HOST (numpy gather + pad, one transfer each way): each sector
    pair (dd, du) would otherwise compile its own tiny gather/pad device
    executables through the remote compiler — at a sector scan's ~tens of
    distinct shapes those seconds-each compiles add up (the round-4
    cold-diag wall's long tail)."""
    pd, pu, _, _ = _perm_host(op)
    ddp, dup = op.padded_shape
    vn = np.asarray(v)
    out = np.zeros((ddp, dup), np.float32)
    out[:op.dim_dw, :op.dim_up] = vn[pd][:, pu]
    return jnp.asarray(out)


def from_padded(op: BlockSparseSectorOp, v32p: jnp.ndarray,
                dtype=jnp.float64) -> jnp.ndarray:
    """Permuted padded (any float dtype) -> natural [dd, du] in `dtype`
    (host numpy; see :func:`to_padded`)."""
    _, _, ipd, ipu = _perm_host(op)
    vn = np.asarray(v32p)[:op.dim_dw, :op.dim_up]
    return jnp.asarray(vn[ipd][:, ipu].astype(np.dtype(dtype)))


# --------------------------------------------------------------------------
# padded-space exact/mixed applies (polish & top-off; keyed on pop only)
# --------------------------------------------------------------------------
def matvec_bs_exact_padded(pop, v: jnp.ndarray) -> jnp.ndarray:
    """f64-exact apply in the permuted padded space ([ddp, dup] in/out).
    The pad subspace is exactly invariant (zero factor rows; diag_p keeps
    zero pad components zero)."""
    pop = _pop(pop)
    return pop.diag_p * v + jnp.matmul(v, pop.hup_p, precision=_HIGHEST) \
        + jnp.matmul(pop.hdw_p, v, precision=_HIGHEST)


def matvec_bs_mixed_padded(pop, v: jnp.ndarray) -> jnp.ndarray:
    """f32-true (HIGHEST) matmuls + f64 diagonal in the padded space — the
    dense-backend mixed contract, for the Lanczos top-off."""
    pop = _pop(pop)
    v32 = v.astype(jnp.float32)
    y32 = jnp.matmul(v32, pop.hup_p32, precision=_HIGHEST) \
        + jnp.matmul(pop.hdw_p32, v32, precision=_HIGHEST)
    return pop.diag_p * v + y32.astype(v.dtype)


# --------------------------------------------------------------------------
# flat f64 interfaces (generic solver / accuracy-gate path; natural order)
# --------------------------------------------------------------------------
def matvec_bs_flat(op: BlockSparseSectorOp, v_flat: jnp.ndarray
                   ) -> jnp.ndarray:
    """Natural flat f64 matvec: f32-true (HIGHEST) XLA matmuls on the
    natural-order factors + f64 diagonal — the same ~1e-7 mixed-precision
    contract as the dense backend. This is the GF / generic-solver apply;
    the split-bf16 kernel (~1.5e-5/matvec, too coarse for continued
    fractions) serves the ground-state chains, whose Rayleigh-Ritz polish
    recovers f64."""
    v = v_flat.reshape(op.dim_dw, op.dim_up)
    v32 = v.astype(jnp.float32)
    y32 = jnp.matmul(v32, op.hup32, precision=_HIGHEST) \
        + jnp.matmul(op.hdw32, v32, precision=_HIGHEST)
    return (op.diag * v + y32.astype(v.dtype)).reshape(-1)


def matvec_bs_exact_flat(op: BlockSparseSectorOp, v_flat: jnp.ndarray
                         ) -> jnp.ndarray:
    """f64-exact apply over the natural-order factors (polish / oracle)."""
    v = v_flat.reshape(op.dim_dw, op.dim_up)
    y = op.diag * v + jnp.matmul(v, op.hup, precision=_HIGHEST) \
        + jnp.matmul(op.hdw, v, precision=_HIGHEST)
    return y.reshape(-1)
