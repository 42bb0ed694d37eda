"""Tight-binding H(k) builders for the driver models.

Small lattice-layer helpers replacing the DMFT_Tools TB_* routines the
reference drivers use (edn_hm_2b_square.f90, edn_bhz_2d.f90).
"""
from __future__ import annotations


import numpy as np


def kgrid_2d(nk: int) -> np.ndarray:
    """[nk*nk, 2] uniform BZ grid in (-pi, pi]."""
    k1 = 2.0 * np.pi * (np.arange(nk) / nk) - np.pi
    kx, ky = np.meshgrid(k1, k1, indexing="ij")
    return np.stack([kx.ravel(), ky.ravel()], axis=1)


def hk_square(nk: int, norb: int, t=0.25, eps0=None) -> np.ndarray:
    """Orbital-diagonal square-lattice dispersion -2t(cos kx + cos ky).

    Returns [Nk, norb, norb] (spin-degenerate; embed per spin as needed).
    """
    ks = kgrid_2d(nk)
    t = np.broadcast_to(np.atleast_1d(t), (norb,))
    eps0 = np.zeros(norb) if eps0 is None else np.asarray(eps0)
    disp = -2.0 * t[None, :] * (np.cos(ks[:, 0:1]) + np.cos(ks[:, 1:2]))
    hk = np.zeros((len(ks), norb, norb), dtype=np.complex128)
    idx = np.arange(norb)
    hk[:, idx, idx] = disp + eps0[None, :]
    return hk


def hk_bhz_2d(nk: int, m0: float = 1.0, lam: float = 0.3, t: float = 0.5
              ) -> np.ndarray:
    """BHZ model, [Nk, 4, 4] in the (spin x orbital) basis
    [up-orb1, up-orb2, dw-orb1, dw-orb2] (edn_bhz_2d.f90 conventions):

      h_up(k) = [M - 2t(cos kx + cos ky)] Gamma5
                + lam sin(kx) Gamma1 + lam sin(ky) Gamma2
      h_dw(k) = h_up(-k)^*
    with Gamma5 = sigma_z (orbital), Gamma1/2 the hybridization matrices.
    """
    ks = kgrid_2d(nk)
    sz = np.diag([1.0, -1.0])
    sx = np.array([[0, 1], [1, 0]], dtype=np.complex128)
    sy = np.array([[0, -1j], [1j, 0]])
    hk = np.zeros((len(ks), 4, 4), dtype=np.complex128)
    for i, (kx, ky) in enumerate(ks):
        mk = m0 - 2.0 * t * (2.0 - np.cos(kx) - np.cos(ky))
        hup = mk * sz + lam * np.sin(kx) * sx + lam * np.sin(ky) * sy
        hdw = (mk * sz + lam * np.sin(-kx) * sx
               + lam * np.sin(-ky) * sy).conj()
        hk[i, :2, :2] = hup
        hk[i, 2:, 2:] = hdw
    return hk


def hloc_from_hk(hk: np.ndarray, nspin: int, norb: int) -> np.ndarray:
    """Local Hamiltonian = BZ average, reshaped to [nspin,nspin,norb,norb]."""
    h = hk.mean(axis=0)
    h = np.where(np.abs(h) < 1e-12, 0.0, h)
    if not np.allclose(h.imag, 0.0, atol=1e-10):
        raise ValueError("Hloc has imaginary parts — unsupported (real ED)")
    nso = nspin * norb
    assert h.shape == (nso, nso)
    return h.real.reshape(nspin, norb, nspin, norb).transpose(0, 2, 1, 3)
