"""Band-sparse fused Pallas TPU kernel for the sector matvec.

TPU-native re-design of the hot sector SpMV (reference hot loop:
spMatVec_main / spMatVec_mpi_main, ED_HAMILTONIAN_SPARSE_HxV.f90:391-485).
This is the round-3 answer to the round-2 findings:

1. **The f64 glue was the bottleneck, not the MXU.** Round-2 measured
   dense_mixed (6-pass f32 matmuls) at 0.441 ms/mv vs dense_fast (3-pass) at
   0.376 ms/mv on the 854k-state bench sector: only 65 us apart, so ~310 us
   of every "fast" backend was the *fixed* XLA glue around the matmuls — the
   emulated-f64 ``diag * v + y32.astype(f64)`` elementwise pass (f64 is
   software-emulated on the TPU VPU). This kernel therefore fuses the
   *entire* matvec — diagonal included — in f32, and the Krylov chain runs
   on padded f32 vectors with no per-step f64 ops at all. Ground-state
   eigenvalues are recovered to f64 by the Rayleigh-Ritz polish over the
   exact f64 factors (:func:`..ops.lanczos.refine_eigenpairs`), the
   mixed-precision contract the dense backend already established.

2. **Band-sparse factors cut the wasted MXU flops.** The hop factors are
   ultra-sparse (fill ~ Ns/DimUp ~ 1%). A reverse-Cuthill-McKee reordering
   of each factor's hop graph (host scipy, ~1 ms) concentrates the nnz into
   a band of a few 128-tiles (measured on the bench factor: band 224 of
   924). The dw-hop term then contracts only the banded window:

       Y[i*128:(i+1)*128, :]  =  scale * ( D_blk (*) V_blk
                                + Hdw_band[i] @ V[t_i : t_i+Wd, :]
                                + V_blk @ Hup_dense )

   one grid step per dw row-panel; V and Hup stay VMEM-resident so HBM sees
   one read of V and one write of Y per matvec. The up-hop term is kept
   dense in v1 (banding it needs lane-dim dynamic slices; the dw band
   already removes most of the waste for the row-panel form).

3. **Fused chain normalization.** The kernel takes a scalar ``scale``
   (SMEM) applied to the accumulator and emits per-panel sums of squares,
   so a normalized Lanczos chain step is exactly one kernel launch: the
   next step's scale is ``rsqrt(sum(ss))`` — no extra HBM pass to scale.

The permutation is a similarity transform: the operator's spectrum is
unchanged, and the whole Krylov chain runs in the permuted, padded f32
space; vectors cross the boundary (pad/permute) once per *chain*, not per
matvec. Padded rows/cols of the factors and diagonal are zero, so a vector
that starts with zero padding keeps it exactly (0*x == 0 in f32).

Gotcha (round 1, kept): Mosaic fails to legalize kernels when jax x64 mode
is on; every pallas_call here runs under ``jax.enable_x64(False)``.
"""
from __future__ import annotations

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
_HIGH = jax.lax.Precision.HIGH

# resident VMEM budget for applicability (v5e has ~16 MB/core; leave room
# for the streamed/double-buffered blocks and the compiler's scratch)
VMEM_RESIDENT_BUDGET = 10 * 1024 * 1024
VMEM_LIMIT = 14 * 1024 * 1024
PAD_SHIFT = 1.0e3   # pad-row diagonal shift (see parallel.production)


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


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockSparseSectorOp:
    """Sector operator for the band-sparse fused kernel.

    Fast path (f32, RCM-permuted, 128-padded): ``diag32p``, ``hup32p``
    (dense), ``dw_slabs`` (banded row slabs). Exact path (f64, natural
    order): ``diag``, ``hup``, ``hdw`` — used by the Rayleigh-Ritz polish
    and as the correctness oracle.
    """
    # fast path (permuted + padded, f32)
    diag32p: jnp.ndarray          # [ddp, dup]
    hup32p: jnp.ndarray           # [dup, dup] dense, permuted, padded
    dw_slabs: jnp.ndarray         # [ntd, 128, Wd] banded row slabs of Hdw
    perm_dw: jnp.ndarray          # [dd] natural -> permuted gather indices
    perm_up: jnp.ndarray          # [du]
    iperm_dw: jnp.ndarray         # [dd] inverse
    iperm_up: jnp.ndarray         # [du]
    # exact path (natural order, f64)
    diag: jnp.ndarray             # [dd, du]
    hup: jnp.ndarray              # [du, du]
    hdw: jnp.ndarray              # [dd, dd]
    # static metadata
    dim_dw: int = field(default=0, metadata=dict(static=True))
    dim_up: int = field(default=0, metadata=dict(static=True))
    w_dw: int = field(default=0, metadata=dict(static=True))
    d_dw: int = field(default=0, metadata=dict(static=True))
    nnz_count: int = field(default=0, metadata=dict(static=True))

    @property
    def dim(self) -> int:
        return self.dim_dw * self.dim_up

    @property
    def nnz(self) -> int:
        return self.nnz_count

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return (self.dw_slabs.shape[0] * 128, self.hup32p.shape[0])


def blocksparse_applicable(h: SectorHamiltonian) -> bool:
    """Pure-electron sectors without Jx/Jp whose resident blocks (V + dense
    Hup + banded Hdw slabs) fit the VMEM budget."""
    if h.ph_diag is not None or h.nd_up_src is not None:
        return False
    ddp, dup = _pad128(h.dim_dw), _pad128(h.dim_up)
    # worst case the band does not help: Wd = ddp
    resident = 4 * (ddp * dup + dup * dup)
    return resident <= VMEM_RESIDENT_BUDGET


def build_blocksparse_op(h: SectorHamiltonian) -> BlockSparseSectorOp:
    dd, du = h.dim_dw, h.dim_up
    ddp, dup = _pad128(dd), _pad128(du)
    ntd = ddp // 128
    hup = _factor_dense(h.up_cols, h.up_vals, du)
    hdw = _factor_dense(h.dw_cols, h.dw_vals, dd)
    diag = np.asarray(h.diag, np.float64)

    perm_up = _rcm_perm(hup)
    perm_dw = _rcm_perm(hdw)
    hup_p = hup[perm_up][:, perm_up]
    hdw_p = hdw[perm_dw][:, perm_dw]
    diag_p = diag[perm_dw][:, perm_up]

    # banded dw slabs: row panel i contracts Hdw_p rows [i*128,(i+1)*128)
    # against the clipped 128-aligned column window [t_i, t_i + Wd)
    d_dw = (_band(hdw_p) + 127) // 128
    w_dw = min((2 * d_dw + 1) * 128, ddp)
    hdw_pp = np.zeros((ddp, ddp))
    hdw_pp[:dd, :dd] = hdw_p
    slabs = np.zeros((ntd, 128, w_dw), np.float32)
    for i in range(ntd):
        t = min(max((i - d_dw) * 128, 0), ddp - w_dw)
        slabs[i] = hdw_pp[i * 128:(i + 1) * 128, t:t + w_dw]

    hup_pp = np.zeros((dup, dup), np.float32)
    hup_pp[:du, :du] = hup_p
    # pad diagonal shifted to +PAD_SHIFT: the pad subspace stays exactly
    # invariant (zero factor rows) AND its spectrum sits far above every
    # physical eigenvalue, so a random Lanczos restart with nonzero pad
    # components can never converge into it
    diag_pp = np.full((ddp, dup), PAD_SHIFT, np.float32)
    diag_pp[:dd, :du] = diag_p

    inv_up = np.empty(du, np.int64)
    inv_up[perm_up] = np.arange(du)
    inv_dw = np.empty(dd, np.int64)
    inv_dw[perm_dw] = np.arange(dd)
    return BlockSparseSectorOp(
        diag32p=jnp.asarray(diag_pp), hup32p=jnp.asarray(hup_pp),
        dw_slabs=jnp.asarray(slabs),
        perm_dw=jnp.asarray(perm_dw), perm_up=jnp.asarray(perm_up),
        iperm_dw=jnp.asarray(inv_dw), iperm_up=jnp.asarray(inv_up),
        diag=jnp.asarray(diag), hup=jnp.asarray(hup), hdw=jnp.asarray(hdw),
        dim_dw=dd, dim_up=du, w_dw=w_dw, d_dw=d_dw, nnz_count=h.nnz)


# --------------------------------------------------------------------------
# the fused kernel
# --------------------------------------------------------------------------
def _fused_kernel(scale_ref, v_ref, hup_ref, slab_ref, diag_ref,
                  out_ref, ss_ref, *, d_dw: int, w_dw: int, ddp: int,
                  precision):
    i = pl.program_id(0)
    # multiply by 128 LAST so Mosaic can statically prove the dynamic
    # sublane start is tile-aligned ("cannot statically prove that index
    # in dimension 0 is a multiple of 8" otherwise, measured on v5e)
    t = jnp.clip(i - d_dw, 0, (ddp - w_dw) // 128) * 128
    v_blk = v_ref[pl.ds(i * 128, 128), :]
    acc = diag_ref[:] * v_blk
    acc = acc + jnp.dot(slab_ref[0], v_ref[pl.ds(t, w_dw), :],
                        preferred_element_type=jnp.float32,
                        precision=precision)
    acc = acc + jnp.dot(v_blk, hup_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
    acc = acc * scale_ref[0, 0]
    out_ref[:] = acc
    # ss is a full-array SMEM output (blocked SMEM specs are not lowerable);
    # each grid step writes its own row
    ss_ref[i, 0] = jnp.sum(acc * acc)


@partial(jax.jit, static_argnames=("precision_name", "interpret"))
def _matvec_padded(op: BlockSparseSectorOp, v32p: jnp.ndarray,
                   scale: jnp.ndarray, precision_name: str = "high",
                   interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused matvec on the permuted padded f32 vector.

    Returns (scale * H_p v, per-panel sums of squares [ntd, 1]).
    """
    # Mosaic's dot lowering supports DEFAULT and HIGHEST only (HIGH raises
    # NotImplementedError, measured on the v5e). DEFAULT is 1-pass bf16
    # (~1e-3 matvec error — too coarse for Krylov chains); HIGHEST is the
    # 6-pass f32-true product the mixed-precision contract assumes.
    precision = (jax.lax.Precision.DEFAULT if precision_name == "default"
                 else _HIGHEST)
    with jax.enable_x64(False):
        ddp, dup = v32p.shape
        ntd = ddp // 128
        kern = partial(_fused_kernel, d_dw=op.d_dw, w_dw=op.w_dw, ddp=ddp,
                       precision=precision)
        return pl.pallas_call(
            kern,
            grid=(ntd,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),        # scale
                pl.BlockSpec((ddp, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # V resident
                pl.BlockSpec((dup, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),        # Hup resident
                pl.BlockSpec((1, 128, op.w_dw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),        # dw slab
                pl.BlockSpec((128, dup), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),        # diag panel
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
        )(scale.reshape(1, 1).astype(jnp.float32), v32p, op.hup32p,
          op.dw_slabs, op.diag32p)


def _auto_interpret(interpret: bool) -> bool:
    """Compiled Pallas needs the TPU; on CPU (tests, dryruns) fall back to
    interpreter mode so the backend stays functional everywhere."""
    return interpret or jax.default_backend() == "cpu"


def matvec_bs_padded(op: BlockSparseSectorOp, v32p: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Unscaled fused matvec on the permuted padded f32 vector."""
    y, _ = _matvec_padded(op, v32p, jnp.float32(1.0),
                          interpret=_auto_interpret(interpret))
    return y


def chain_step(op: BlockSparseSectorOp, v32p: jnp.ndarray,
               inv_norm: jnp.ndarray, interpret: bool = False
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
def to_padded(op: BlockSparseSectorOp, v: jnp.ndarray) -> jnp.ndarray:
    """Natural [dd, du] (any float dtype) -> permuted padded f32."""
    ddp, dup = op.padded_shape
    vp = v[op.perm_dw][:, op.perm_up].astype(jnp.float32)
    return jnp.pad(vp, ((0, ddp - op.dim_dw), (0, dup - op.dim_up)))


def from_padded(op: BlockSparseSectorOp, v32p: jnp.ndarray,
                dtype=jnp.float64) -> jnp.ndarray:
    """Permuted padded f32 -> natural [dd, du] in `dtype`."""
    v = v32p[:op.dim_dw, :op.dim_up]
    return v[op.iperm_dw][:, op.iperm_up].astype(dtype)


# --------------------------------------------------------------------------
# flat f64 interfaces (generic solver / accuracy-gate path)
# --------------------------------------------------------------------------
def matvec_bs_flat(op: BlockSparseSectorOp, v_flat: jnp.ndarray
                   ) -> jnp.ndarray:
    """Natural flat f64 matvec through the kernel (mixed-precision contract;
    per-call boundary cost — use the padded chain for hot loops)."""
    v = v_flat.reshape(op.dim_dw, op.dim_up)
    y = matvec_bs_padded(op, to_padded(op, v))
    return from_padded(op, y, v_flat.dtype).reshape(-1)


def matvec_bs_exact_flat(op: BlockSparseSectorOp, v_flat: jnp.ndarray
                         ) -> jnp.ndarray:
    """f64-exact apply over the natural-order factors (polish / oracle)."""
    v = v_flat.reshape(op.dim_dw, op.dim_up)
    y = op.diag * v + jnp.matmul(v, op.hup, precision=_HIGHEST) \
        + jnp.matmul(op.hdw, v, precision=_HIGHEST)
    return y.reshape(-1)
