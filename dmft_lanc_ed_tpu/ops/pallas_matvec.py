"""Fused Pallas TPU kernel for the sector matvec (dense-factor fast path).

TPU-native re-design of the hot SpMV (ED_HAMILTONIAN_SPARSE_HxV.f90:391-485).
Round 1 established that any gather-based formulation is pinned at the ~96
GB/s TPU gather wall and that a run-length slab-AXPY kernel is loop-overhead
bound (median run length 1-4 rows). The structural answer is the dense
tensor-product form (see :mod:`.dense`): the one-spin hop factors are tiny
dense matrices, so the matvec is two MXU matmuls. This kernel fuses them —

    Y32[i, :] = Vt[i, :] @ Hup  +  Hdw[i, :] @ V        (one pass over V)

with a 1-D grid over dw row-tiles; V and Hup stay VMEM-resident across the
grid so HBM sees one read of V + Hdw and one write of Y per matvec. The f64
diagonal term ``diag * v`` and the cast/pad glue run in XLA around the
kernel (bandwidth-bound VPU work that XLA fuses on its own).

Precision: Mosaic has no f64, so the kernel computes the hop terms in f32
(HIGHEST precision matmuls ~ f32-true products). Combined with the f64
diagonal the matvec carries ~1e-7 relative error — the mixed-precision
contract; the ground-state path recovers f64 eigenvalues via
:func:`..ops.lanczos.refine_eigenpairs` using this op's exact f64 factors
(``matvec_pallas_exact_flat``).

Gotcha (hard-won, round 1): Mosaic fails to legalize kernels when jax x64
mode is enabled; every pallas_call here runs under ``jax.enable_x64(False)``
with f32/int32-only tracing.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hamiltonian import SectorHamiltonian
from .dense import densify

_HIGHEST = jax.lax.Precision.HIGHEST

TILE = 256                      # dw rows per grid step
VMEM_BUDGET = 12 * 1024 * 1024  # resident bytes cap for applicability


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PallasSectorOp:
    """Sector operator for the fused kernel. Carries the padded f32 factors
    for the kernel and the exact f64 factors for the polish path."""
    diag: jnp.ndarray      # [dd, du] f64
    hup: jnp.ndarray       # [du, du] f64 (exact, polish path)
    hdw: jnp.ndarray       # [dd, dd] f64
    hup32: jnp.ndarray     # [dup, dup] f32, zero-padded to 128 multiples
    hdw32: jnp.ndarray     # [ddp, ddp] f32
    dim_dw: int = field(default=0, metadata=dict(static=True))
    dim_up: int = field(default=0, metadata=dict(static=True))
    nnz_count: int = field(default=0, metadata=dict(static=True))

    @property
    def dim(self) -> int:
        return self.dim_dw * self.dim_up

    @property
    def nnz(self) -> int:
        return self.nnz_count


def pallas_applicable(h: SectorHamiltonian) -> bool:
    """The fused kernel covers pure-electron sectors without Jx/Jp terms
    whose resident blocks fit the VMEM budget."""
    if h.ph_diag is not None or h.nd_up_src is not None:
        return False
    ddp, dup = _pad128(h.dim_dw), _pad128(h.dim_up)
    resident = 4 * (ddp * dup + dup * dup) + 4 * TILE * (ddp + 2 * dup)
    return resident <= VMEM_BUDGET


def build_pallas_dense_op(h: SectorHamiltonian) -> PallasSectorOp:
    dop = densify(h)
    dd, du = dop.dim_dw, dop.dim_up
    ddp, dup = _pad128(dd), _pad128(du)
    hup32 = jnp.pad(dop.hup32, ((0, dup - du), (0, dup - du)))
    hdw32 = jnp.pad(dop.hdw32, ((0, ddp - dd), (0, ddp - dd)))
    return PallasSectorOp(diag=dop.diag, hup=dop.hup, hdw=dop.hdw,
                          hup32=hup32, hdw32=hdw32,
                          dim_dw=dd, dim_up=du, nnz_count=dop.nnz)


def _fused_kernel(v_full_ref, hup_ref, hdw_tile_ref, v_tile_ref, out_ref):
    out_ref[:] = (
        jnp.dot(v_tile_ref[:], hup_ref[:],
                preferred_element_type=jnp.float32, precision=_HIGHEST)
        + jnp.dot(hdw_tile_ref[:], v_full_ref[:],
                  preferred_element_type=jnp.float32, precision=_HIGHEST))


@partial(jax.jit, static_argnames=("interpret",))
def _hop_terms32(hup32: jnp.ndarray, hdw32: jnp.ndarray, v32p: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Y32 = V @ Hup + Hdw @ V on the padded f32 arrays (one fused kernel)."""
    with jax.enable_x64(False):
        ddp, dup = v32p.shape
        tile = TILE if ddp % TILE == 0 else 128   # ddp is a 128 multiple
        return pl.pallas_call(
            _fused_kernel,
            grid=(ddp // tile,),
            in_specs=[
                pl.BlockSpec((ddp, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),          # V resident
                pl.BlockSpec((dup, dup), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),          # Hup resident
                pl.BlockSpec((tile, ddp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),          # Hdw row tile
                pl.BlockSpec((tile, dup), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),          # V row tile
            ],
            out_specs=pl.BlockSpec((tile, dup), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ddp, dup), jnp.float32),
            interpret=interpret,
        )(v32p, hup32, hdw32, v32p)


def matvec_pallas(op: PallasSectorOp, v: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """One matvec on the natural-shape [dd, du] vector (any float dtype)."""
    dd, du = op.dim_dw, op.dim_up
    ddp, dup = op.hdw32.shape[0], op.hup32.shape[0]
    v32p = jnp.pad(v.astype(jnp.float32), ((0, ddp - dd), (0, dup - du)))
    y32 = _hop_terms32(op.hup32, op.hdw32, v32p, interpret=interpret)[:dd, :du]
    return op.diag * v + y32.astype(v.dtype)


def matvec_pallas_flat(op: PallasSectorOp, v_flat: jnp.ndarray) -> jnp.ndarray:
    return matvec_pallas(op, v_flat.reshape(op.dim_dw, op.dim_up)).reshape(-1)


def matvec_pallas_exact_flat(op: PallasSectorOp, v_flat: jnp.ndarray
                             ) -> jnp.ndarray:
    """f64-exact apply over the same factors (polish / oracle path)."""
    v = v_flat.reshape(op.dim_dw, op.dim_up)
    y = op.diag * v + jnp.matmul(v, op.hup, precision=_HIGHEST) \
        + jnp.matmul(op.hdw, v, precision=_HIGHEST)
    return y.reshape(-1)
