"""Probe the Pallas constructs the fused-chain kernel needs.

Constructs under test (CPU interpret mode first, then compiled on TPU):
  1. VMEM scratch persisting across grid steps (ping-pong chain state)
  2. SMEM scalar scratch accumulated across grid steps
  3. async DMA from an HBM (ANY) input into VMEM scratch
  4. dynamic leading-dim index into a 3D scratch: vbuf[cur, pl.ds(...), :]
  5. SMEM (K, 1) output written once per outer grid step
  6. final DMA from scratch slice to an ANY-space output

The probe implements a K-step normalized power chain y <- A y / |A y| on a
small matrix, entirely in one pallas_call, and checks it against plain JAX.

Usage: python experiments/chain_probe.py [tpu]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if "tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

N = 256          # matrix dim (2 row panels of 128)
NT = N // 128
K = 7            # chain steps


def _kernel(v0_ref, a_ref, norms_ref, vout_ref, vbuf, st, sem, sem2):
    k = pl.program_id(0)
    i = pl.program_id(1)
    cur = jax.lax.rem(k, 2)
    prv = 1 - cur

    @pl.when((k == 0) & (i == 0))
    def _():
        dma = pltpu.make_async_copy(v0_ref, vbuf.at[0], sem)
        dma.start()
        dma.wait()
        st[0] = 0.0      # ss accumulator
        st[1] = 1.0      # inv-norm of current stored vector

    # y_i = s_cur * (A u_cur)_i   (panel i of the product)
    win = vbuf[cur]                               # [N, 128] whole vector
    a_blk = a_ref[pl.ds(i * 128, 128), :]         # [128, N]
    y = st[1] * jnp.dot(a_blk, win, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    vbuf[prv, pl.ds(i * 128, 128), :] = y
    st[0] += jnp.sum(y * y)

    @pl.when(i == NT - 1)
    def _():
        nrm = jnp.sqrt(st[0])
        norms_ref[k, 0] = nrm
        st[1] = 1.0 / nrm
        st[0] = 0.0

    @pl.when((k == K - 1) & (i == NT - 1))
    def _():
        dma2 = pltpu.make_async_copy(vbuf.at[prv], vout_ref, sem2)
        dma2.start()
        dma2.wait()


@partial(jax.jit, static_argnames=("interpret",))
def chain(v0, a, interpret):
    with jax.enable_x64(False):
        return pl.pallas_call(
            _kernel,
            grid=(K, NT),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),        # v0 (DMA'd)
                pl.BlockSpec((N, N), lambda k, i: (0, 0),
                             memory_space=pltpu.VMEM),    # A resident
            ],
            out_specs=[
                pl.BlockSpec((K, 1), lambda k, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K, 1), jnp.float32),
                jax.ShapeDtypeStruct((N, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, N, 128), jnp.float32),
                pltpu.SMEM((4,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(v0, a)


def main():
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    a = a + a.T
    v0 = rng.standard_normal((N, 128)).astype(np.float32)
    v0 /= np.linalg.norm(v0)

    norms, vout = chain(jnp.asarray(v0), jnp.asarray(a), interpret)
    norms = np.asarray(norms).ravel()

    # reference chain in plain numpy (f32)
    v = v0.copy()
    ref_norms = []
    for _ in range(K):
        w = (a @ v).astype(np.float32)
        n = np.linalg.norm(w).astype(np.float32)
        ref_norms.append(n)
        v = w / n
    ref_norms = np.array(ref_norms)
    # kernel's final vout is the UNnormalized last w
    vref = v * ref_norms[-1]

    print("norms kernel:", norms)
    print("norms ref:   ", ref_norms)
    err_n = np.abs(norms - ref_norms).max() / ref_norms.max()
    err_v = np.abs(np.asarray(vout).ravel() - vref.ravel()).max() / \
        np.abs(vref).max()
    print(f"max rel err: norms {err_n:.2e}, vout {err_v:.2e}")
    assert err_n < 1e-5 and err_v < 1e-4, "MISMATCH"
    print("PROBE OK on", jax.default_backend())


if __name__ == "__main__":
    main()
