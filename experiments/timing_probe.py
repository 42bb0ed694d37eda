"""Probe: does block_until_ready actually block on this axon version?

Round-4 bench regression: the ELL chain and the stream probe measured
constant ~0.1 ms wall regardless of chain length (below the ~24 ms tunnel
dispatch floor), while the dense chains measured sane values. This probe
times the same three program families with (a) block_until_ready and
(b) a forced device->host copy (np.asarray of a 1-element slice), to
determine whether the runtime's readiness signal is lying for some
program shapes.
"""
import time
import sys

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

print("device:", jax.devices()[0], file=sys.stderr)


def timeit(fn, sync, reps=3):
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


sync_block = lambda out: jax.block_until_ready(out)
sync_host = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

# 1. stream recurrence (the bench's bandwidth probe)
n = 2 ** 27 // 8
x = jnp.arange(n, dtype=jnp.float64)
y = jnp.ones(n, dtype=jnp.float64)


def make_stream(chain):
    @jax.jit
    def run(x, y):
        def step(carry, _):
            x, y = carry
            z = 0.5 * x + 0.4999999 * y
            return (y, z), None
        (xf, yf), _ = jax.lax.scan(step, (x, y), None, length=chain)
        return yf
    return run


for c in (10, 60):
    r = make_stream(c)
    jax.block_until_ready(r(x, y))
    tb = timeit(lambda: r(x, y), sync_block)
    th = timeit(lambda: r(x, y), sync_host)
    print(f"stream chain={c:3d}: block={tb*1e3:9.3f} ms   host={th*1e3:9.3f} ms",
          file=sys.stderr)

# 2. gather chain (the ELL formulation, small array)
m = 4096
g = jax.random.randint(jax.random.PRNGKey(0), (m, 8), 0, m)
vals = jax.random.normal(jax.random.PRNGKey(1), (m, 8), jnp.float64)
v = jnp.ones((m,), jnp.float64)


def make_gather(chain):
    @jax.jit
    def run(v):
        def step(v, _):
            w = jnp.sum(vals * v[g], axis=1)
            return w / jnp.linalg.norm(w), None
        out, _ = jax.lax.scan(step, v, None, length=chain)
        return out
    return run


for c in (50, 400):
    r = make_gather(c)
    jax.block_until_ready(r(v))
    tb = timeit(lambda: r(v), sync_block)
    th = timeit(lambda: r(v), sync_host)
    print(f"gather chain={c:3d}: block={tb*1e3:9.3f} ms   host={th*1e3:9.3f} ms",
          file=sys.stderr)

# 3. matmul chain (the dense formulation, known-good timing)
a = jax.random.normal(jax.random.PRNGKey(2), (1024, 1024), jnp.float32)
w0 = jax.random.normal(jax.random.PRNGKey(3), (1024, 1024), jnp.float32)


def make_mm(chain):
    @jax.jit
    def run(w):
        def step(w, _):
            u = jnp.dot(a, w, preferred_element_type=jnp.float32)
            return u / jnp.linalg.norm(u), None
        out, _ = jax.lax.scan(step, w, None, length=chain)
        return out
    return run


for c in (50, 400):
    r = make_mm(c)
    jax.block_until_ready(r(w0))
    tb = timeit(lambda: r(w0), sync_block)
    th = timeit(lambda: r(w0), sync_host)
    print(f"matmul chain={c:3d}: block={tb*1e3:9.3f} ms   host={th*1e3:9.3f} ms",
          file=sys.stderr)
