"""Bethe-lattice DOS utilities (DMFT_Tools dens_bethe analogue)."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def dens_bethe(e: np.ndarray, half_bandwidth: float) -> np.ndarray:
    """Semicircular DOS rho(e) = 2/(pi D) sqrt(1 - (e/D)^2)."""
    x = np.clip(e / half_bandwidth, -1.0, 1.0)
    return 2.0 / (np.pi * half_bandwidth) * np.sqrt(np.maximum(1 - x * x, 0.0))


def bethe_bands(norb: int, wband, h0=None, n_energies: int = 500
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Discretized Bethe bands (Ebands, Dbands, H0) as in edn_hm_bethe.f90:75-79.

    Dbands includes the integration measure de so sum(Dbands) ~= 1.
    """
    wband = np.broadcast_to(np.atleast_1d(np.asarray(wband, float)), (norb,))
    h0 = np.zeros(norb) if h0 is None else np.broadcast_to(
        np.atleast_1d(np.asarray(h0, float)), (norb,))
    ebands = np.zeros((norb, n_energies))
    dbands = np.zeros((norb, n_energies))
    for a in range(norb):
        e = np.linspace(-wband[a], wband[a], n_energies)
        de = e[1] - e[0]
        ebands[a] = e
        dbands[a] = dens_bethe(e, wband[a]) * de
    return ebands, dbands, h0


def dens_flat(e: np.ndarray, half_bandwidth: float) -> np.ndarray:
    """Flat (box) DOS on [-W, W] (SciFortran dens_flat; AFO driver
    dos_model='flat')."""
    e = np.asarray(e, dtype=np.float64)
    return np.where(np.abs(e) <= half_bandwidth,
                    1.0 / (2.0 * half_bandwidth), 0.0)
