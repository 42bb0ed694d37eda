"""Chi^2 bath fitting.

TPU-native re-design of ED_FIT_CHI2.f90 + ED_FIT_CHI2/fitgf_*.f90: the
reference hand-derives dDelta/d(eps,V) gradients and runs a Fortran77 CG;
here the Anderson functions are pure JAX, so the exact gradient of

    chi2(theta) = (1/Ldelta) sum_n |F(iw_n) - F_And(iw_n; theta)|^cg_pow / W_n

comes from `jax.grad`, and the minimizer is L-BFGS-B driven by a jitted
value-and-grad. Weight W_n = 1, n, or w_n per cg_weight
(ED_FIT_CHI2.f90:406-418); cg_scheme selects the fitted function: "delta"
fits Delta(z), "weiss" fits G0and(z) (ED_INPUT_VARS cg_scheme).

Fit granularity matches the reference dispatch (ED_FIT_CHI2.f90:88-99):
- normal : independent (spin, orbital) fits over (e_k, V_k)       [2 Nbath]
- hybrid : per-spin joint fit over (e_k, V_{a k})                 [(1+Norb) Nbath]
- replica: joint fit over (V_p, lambda_{p m}) with all orbital
  components entering chi2 (fitgf_replica)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize as _scipy_minimize

from .bath import Bath, pack_bath, unpack_bath
from .bath_functions import delta_bath, g0and_bath
from .config import EDConfig
from .solver import matsubara_grid


def _cabs_pow(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """|x|^p for complex x, differentiable at 0 for even p."""
    a2 = x.real ** 2 + x.imag ** 2
    return a2 if p == 2 else a2 ** (p / 2.0)


def _fit_weight(cfg: EDConfig, wm: np.ndarray) -> np.ndarray:
    if cfg.cg_weight == 2:
        return np.arange(1, len(wm) + 1, dtype=np.float64)
    if cfg.cg_weight == 3:
        return wm.copy()
    return np.ones(len(wm))


def _target_fn(cfg: EDConfig):
    """Function (bath, hloc, z) -> fitted quantity, per cg_scheme."""
    if cfg.cg_scheme == "delta":
        return lambda bath, hloc, z, h_basis: delta_bath(cfg, bath, z, h_basis)
    return lambda bath, hloc, z, h_basis: g0and_bath(cfg, hloc, bath, z,
                                                     h_basis)


def chi2_fitgf(cfg: EDConfig, target: np.ndarray, bath_array: np.ndarray,
               hloc: np.ndarray, ispin: Optional[int] = None,
               h_basis: Optional[np.ndarray] = None) -> np.ndarray:
    """Fit the bath to the Weiss field / hybridization (ed_chi2_fitgf).

    target: [nspin, nspin, norb, norb, Lmats] Weiss or Delta on the
    fermionic Matsubara grid. Returns the updated packed bath array.
    """
    wm_full = matsubara_grid(cfg)
    lfit = min(cfg.lfit, target.shape[-1], len(wm_full))
    wm = wm_full[:lfit]
    z = jnp.asarray(1j * wm)
    wgt = jnp.asarray(_fit_weight(cfg, wm))
    spins = [ispin] if ispin is not None else list(range(cfg.nspin))

    nsym = h_basis.shape[0] if h_basis is not None else None
    bath = unpack_bath(cfg, bath_array, nsym=nsym)
    fn = _target_fn(cfg)
    hloc_j = jnp.asarray(hloc)
    h_basis_j = jnp.asarray(h_basis) if h_basis is not None else None

    if cfg.bath_type == "normal":
        e = np.asarray(bath.e).copy()
        v = np.asarray(bath.v).copy()
        for s in spins:
            for a in range(cfg.norb):
                tgt = jnp.asarray(target[s, s, a, a, :lfit])

                def chi2(theta, s=s, a=a, tgt=tgt):
                    ek = theta[:cfg.nbath]
                    vk = theta[cfg.nbath:]
                    d = (vk[None, :] ** 2
                         / (z[:, None] - ek[None, :])).sum(-1)
                    if cfg.cg_scheme == "weiss":
                        d = 1.0 / (z + cfg.xmu - hloc_j[s, s, a, a] - d)
                    r = _cabs_pow(tgt - d, cfg.cg_pow)
                    return (r / wgt).sum() / lfit

                theta0 = np.concatenate([e[s, a], v[s, a]])
                theta = _minimize(cfg, chi2, theta0)
                e[s, a] = theta[:cfg.nbath]
                v[s, a] = np.abs(theta[cfg.nbath:])
        new_bath = Bath(e=jnp.asarray(e), v=jnp.asarray(v))

    elif cfg.bath_type == "hybrid":
        e = np.asarray(bath.e).copy()
        v = np.asarray(bath.v).copy()
        nb, no = cfg.nbath, cfg.norb
        for s in spins:
            tgt = jnp.asarray(target[s, s, :, :, :lfit])

            def chi2(theta, s=s, tgt=tgt):
                ek = theta[:nb]
                vk = theta[nb:].reshape(no, nb)
                denom = 1.0 / (z[:, None] - ek[None, :])       # [L, nb]
                d = jnp.einsum("ak,bk,lk->abl", vk, vk, denom)
                if cfg.cg_scheme == "weiss":
                    zmat = (z + cfg.xmu)[None, None, :] \
                        * jnp.eye(no, dtype=jnp.complex128)[:, :, None]
                    ig0 = zmat - hloc_j[s, s][:, :, None] - d
                    d = jnp.linalg.inv(ig0.transpose(2, 0, 1)).transpose(1, 2, 0)
                r = _cabs_pow(tgt - d, cfg.cg_pow)
                return (r / wgt[None, None, :]).sum() / lfit

            theta0 = np.concatenate([e[s, 0], v[s].reshape(-1)])
            theta = _minimize(cfg, chi2, theta0)
            e[s, 0] = theta[:nb]
            v[s] = np.abs(theta[nb:].reshape(no, nb))
        new_bath = Bath(e=jnp.asarray(e), v=jnp.asarray(v))

    else:  # replica
        nb = cfg.nbath
        lam0 = np.asarray(bath.lam)
        v0 = np.asarray(bath.v_rep)
        nsym = lam0.shape[1]
        tgt = jnp.asarray(target[..., :lfit])

        def chi2(theta):
            v_r = theta[:nb * cfg.nspin].reshape(nb, cfg.nspin)
            lam = theta[nb * cfg.nspin:].reshape(nb, nsym)
            b = Bath(lam=lam, v_rep=v_r)
            d = fn(b, hloc_j, z, h_basis_j)
            r = _cabs_pow(tgt - d, cfg.cg_pow)
            return (r / wgt).sum() / lfit

        theta0 = np.concatenate([v0.reshape(-1), lam0.reshape(-1)])
        theta = _minimize(cfg, chi2, theta0)
        v_r = np.abs(theta[:nb * cfg.nspin].reshape(nb, cfg.nspin))
        lam = theta[nb * cfg.nspin:].reshape(nb, nsym)
        new_bath = Bath(lam=jnp.asarray(lam), v_rep=jnp.asarray(v_r))

    if ispin is not None and cfg.nspin == 2 and cfg.bath_type != "replica":
        # keep the un-fitted spin from the input bath
        pass
    return pack_bath(cfg, new_bath)


def _minimize(cfg: EDConfig, chi2_fn, theta0: np.ndarray) -> np.ndarray:
    """Quasi-Newton descent on the chi2 (replaces fmin_cg/fmin_cgminimize).

    Reference dials honored (ED_FIT_CHI2.f90:84-141):
    - cg_method: 0 -> L-BFGS-B (the default, supersedes the NR CG),
                 1 -> scipy nonlinear CG (the fmin_cgminimize analogue)
    - cg_grad:   0 -> exact gradient via jax autodiff (the reference's
                 hand-derived analytic dDelta/dtheta chain rule comes for
                 free), 1 -> numerical finite-difference gradient
    """
    numeric = cfg.cg_grad != 0
    if numeric:
        f = jax.jit(lambda t: chi2_fn(jnp.asarray(t)))
        fun = lambda t: float(f(jnp.asarray(t)))
        jac = None
    else:
        vg = jax.jit(jax.value_and_grad(
            lambda t: chi2_fn(jnp.asarray(t))))

        def fun(t):
            val, grad = vg(jnp.asarray(t))
            return float(val), np.asarray(grad, dtype=np.float64)
        jac = True

    if cfg.cg_method == 1:
        res = _scipy_minimize(fun, theta0, jac=jac, method="CG",
                              options={"maxiter": cfg.cg_niter,
                                       "gtol": cfg.cg_ftol})
    else:
        res = _scipy_minimize(fun, theta0, jac=jac, method="L-BFGS-B",
                              options={"maxiter": cfg.cg_niter,
                                       "ftol": cfg.cg_ftol * 1e-3,
                                       "gtol": 1e-12})
    return np.asarray(res.x)


def replica_chi2_fitgf(cfg: EDConfig, target: np.ndarray,
                       bath_array: np.ndarray, hloc: np.ndarray,
                       h_basis: np.ndarray) -> np.ndarray:
    """Convenience alias matching the reference's fitgf_replica entry."""
    return chi2_fitgf(cfg, target, bath_array, hloc, h_basis=h_basis)
