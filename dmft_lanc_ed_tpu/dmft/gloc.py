"""Local lattice Green's function (dmft_gloc_matsubara/realaxis analogue).

Two flavors, both vmapped/jitted device kernels:
- :func:`gloc_dos` — DOS integration for orbital-diagonal dispersions
  (Ebands/Dbands form used by the Bethe/square drivers)
- :func:`gloc_hk`  — k-sum of [(z + mu) - H(k) - Sigma(z)]^-1 for full
  multi-orbital Hamiltonians (BHZ & co). The [L, Nk] inverse batch is the
  MXU-heavy path; it is fully batched instead of the reference's double loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gloc_dos(ebands: np.ndarray, dbands: np.ndarray, h0: np.ndarray,
             sigma: np.ndarray, z: np.ndarray, xmu: float = 0.0
             ) -> np.ndarray:
    """G_loc for orbital-diagonal dispersion.

    ebands/dbands: [Nso, Le]; sigma: [nspin,nspin,norb,norb,L]; z: [L].
    Returns [nspin,nspin,norb,norb,L] with diagonal entries filled.
    """
    nspin, _, norb, _, L = sigma.shape
    out = np.zeros_like(sigma)
    zj = jnp.asarray(z)
    for s in range(nspin):
        for a in range(norb):
            io = a + s * norb if ebands.shape[0] > norb else a
            e = jnp.asarray(ebands[io])
            d = jnp.asarray(dbands[io])
            sig = jnp.asarray(sigma[s, s, a, a])
            zeta = zj + xmu - h0[io] - sig                 # [L]
            g = (d[None, :] / (zeta[:, None] - e[None, :])).sum(-1)
            out[s, s, a, a] = np.asarray(g)
    return out


@jax.jit
def _gloc_hk_kernel(hk, zeta_mat):
    """hk: [Nk, Nso, Nso]; zeta_mat: [L, Nso, Nso] -> gloc [L, Nso, Nso]."""
    def per_freq(zm):
        ginv = zm[None, :, :] - hk                          # [Nk, Nso, Nso]
        return jnp.linalg.inv(ginv).mean(axis=0)
    return jax.lax.map(per_freq, zeta_mat)


def gloc_hk(hk: np.ndarray, sigma: np.ndarray, z: np.ndarray,
            xmu: float = 0.0) -> np.ndarray:
    """G_loc = 1/Nk sum_k [(z+mu) I - H(k) - Sigma]^-1.

    hk: [Nk, Nso, Nso] (Nso = nspin*norb); sigma in reference layout.
    """
    nspin, _, norb, _, L = sigma.shape
    nso = nspin * norb
    sig_so = sigma.transpose(0, 2, 1, 3, 4).reshape(nso, nso, L)
    eye = np.eye(nso)
    zeta = ((z + xmu)[:, None, None] * eye[None]
            - sig_so.transpose(2, 0, 1))                     # [L, nso, nso]
    g_so = np.asarray(_gloc_hk_kernel(jnp.asarray(hk), jnp.asarray(zeta)))
    g = g_so.transpose(1, 2, 0).reshape(nspin, norb, nspin, norb, L)
    return g.transpose(0, 2, 1, 3, 4)


def gloc_dos_bipartite(ebands: np.ndarray, dbands: np.ndarray,
                       h0: np.ndarray, sigma: np.ndarray, z: np.ndarray,
                       xmu: float = 0.0) -> np.ndarray:
    """G_loc on a bipartite lattice with two sublattices A/B for
    orbital-diagonal dispersion (the AFO/AFM two-site geometry,
    edn_hm_2bands_dos_2sites_ineq_AFO.f90 He_b construction: hopping only
    connects sublattices, so the [2, 2] sublattice block at energy eps is
    [[zeta_A, eps], [eps, zeta_B]] and

        G_A(z) = int deps D(eps) zeta_B / (zeta_A zeta_B - eps^2)

    (and A<->B). sigma: [2, nspin, nspin, norb, norb, L]; returns the same
    shape with the diagonal entries filled.
    """
    nspin, _, norb = sigma.shape[1:4]
    out = np.zeros_like(sigma)
    zj = jnp.asarray(z)
    for s in range(nspin):
        for a in range(norb):
            io = a + s * norb if ebands.shape[0] > norb else a
            e = jnp.asarray(ebands[io])
            d = jnp.asarray(dbands[io])
            za = zj + xmu - h0[io] - jnp.asarray(sigma[0, s, s, a, a])
            zb = zj + xmu - h0[io] - jnp.asarray(sigma[1, s, s, a, a])
            den = za[:, None] * zb[:, None] - (e ** 2)[None, :]   # [L, Le]
            out[0, s, s, a, a] = np.asarray(
                (d[None, :] * zb[:, None] / den).sum(-1))
            out[1, s, s, a, a] = np.asarray(
                (d[None, :] * za[:, None] / den).sum(-1))
    return out
