"""Device-mesh utilities.

The reference's MPI communicator handling (ED_VARS_GLOBAL ed_set_MpiComm,
communicator shrink in ED_HAMILTONIAN.f90:66-94) maps to a 1-D
`jax.sharding.Mesh` over the "dw" axis plus shape padding: instead of
shrinking the communicator when DimDw < nranks, the sector arrays are
zero-padded to a multiple of the mesh size (padded rows are exact zeros and
do not perturb matvec, norms, or dot products).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dw") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n."""
    return ((n + m - 1) // m) * m
