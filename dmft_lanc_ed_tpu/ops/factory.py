"""Sector-operator factory: one signature, multiple backends.

The reference binds `spHtimesV_p` to stored/direct variants at sector setup
(ED_HAMILTONIAN.f90:139-166); here `make_sector_op` returns (op_pytree,
apply_fn) chosen by cfg.ed_backend / cfg.ed_sparse_h:

- "ell" (stored)  : tensor-product ELL factors, row-gather matvec
- "direct"        : matrix-free, connectivity from bit ops on device
- "auto"          : honors ed_sparse_h (True -> stored, False -> direct),
                    falling back to stored where direct isn't wired
                    (orbital-resolved sectors)
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from ..bath import Bath
from ..config import EDConfig
from ..hamiltonian import build_sector_hamiltonian
from ..sectors import Sector
from .direct import build_direct_op, matvec_direct_flat
from .matvec import matvec_flat


def direct_supported(cfg: EDConfig) -> bool:
    return cfg.ed_total_ud


def make_sector_op(cfg: EDConfig, sec: Sector, hloc: np.ndarray, bath: Bath,
                   h_basis: Optional[np.ndarray] = None
                   ) -> Tuple[object, Callable]:
    backend = cfg.ed_backend
    if backend == "auto":
        backend = "ell" if cfg.ed_sparse_h else "direct"
    if backend == "direct" and not direct_supported(cfg):
        backend = "ell"
    if backend == "direct":
        op = build_direct_op(cfg, sec, hloc, bath, h_basis=h_basis)
        return op, matvec_direct_flat
    op = build_sector_hamiltonian(cfg, sec, hloc, bath, h_basis=h_basis)
    return op, matvec_flat
