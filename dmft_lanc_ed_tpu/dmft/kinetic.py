"""Lattice kinetic energy (dmft_kinetic_energy analogue, DOS form).

E_kin = T sum_n sum_e D(e) e G(e, iw_n) with proper high-frequency tail
correction via the model function G_tail = 1/(iw - e - Re Sigma_inf):
    E_kin = 2/beta sum_n sum_e D(e) e Re[G - G_tail] + sum_e D(e) e f(e*)
(factor 2 = spin degeneracy when nspin == 1).
"""
from __future__ import annotations

import numpy as np


def kinetic_energy_dos(ebands: np.ndarray, dbands: np.ndarray,
                       h0: np.ndarray, sigma_mats: np.ndarray,
                       wm: np.ndarray, beta: float, xmu: float = 0.0
                       ) -> float:
    nspin, _, norb, _, L = sigma_mats.shape
    spin_deg = 2.0 / nspin
    ekin = 0.0
    z = 1j * wm
    for s in range(nspin):
        for a in range(norb):
            io = a + s * norb if ebands.shape[0] > norb else a
            e = ebands[io]
            d = dbands[io]
            sig = sigma_mats[s, s, a, a]
            sig_inf = sig[-1].real
            g = 1.0 / (z[:, None] + xmu - h0[io] - e[None, :] - sig[:, None])
            gt = 1.0 / (z[:, None] + xmu - h0[io] - e[None, :] - sig_inf)
            summand = (e[None, :] * (g - gt).real * d[None, :]).sum()
            ekin += spin_deg * (2.0 / beta) * summand
            # tail: exact free sum with shifted levels
            estar = e + h0[io] + sig_inf - xmu
            fermi = 1.0 / (1.0 + np.exp(np.clip(beta * estar, -500, 500)))
            ekin += spin_deg * (e * fermi * d).sum()
    return float(ekin)
