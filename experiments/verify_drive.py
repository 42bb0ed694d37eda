"""Short TPU verification drive (the /verify recipe, round-3 edition)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

print("importing package...", flush=True)
import dmft_lanc_ed_tpu as ed
from dmft_lanc_ed_tpu.ops import lanczos_ground_state
from dmft_lanc_ed_tpu.ops.matvec import matvec_flat

print("backend:", jax.devices()[0], flush=True)
t0 = time.time()
cfg = ed.read_input(None, norb=1, nbath=4, uloc=(2.0,))
bath = ed.init_bath(cfg)
sec = ed.SectorTable(cfg).sector(ed.qn(2, 2))
h = ed.build_sector_hamiltonian(cfg, sec, np.zeros((1, 1, 1, 1)), bath)
print(f"sector built ({time.time()-t0:.1f}s)", flush=True)
dense = ed.dense_hamiltonian(h)
print("host oracle done", flush=True)
t0 = time.time()
evals, evecs = lanczos_ground_state(h, matvec_flat, sec.dim, neigen=1)
err = abs(evals[0] - np.linalg.eigvalsh(dense)[0])
print(f"TPU library drive: Egs={evals[0]:.12f} err={err:.2e} "
      f"({time.time()-t0:.1f}s)", flush=True)
assert err < 1e-10

from dmft_lanc_ed_tpu.ops.blocksparse import (build_blocksparse_op,
                                              chain_step, from_padded,
                                              matvec_bs_padded, to_padded)
import jax.numpy as jnp

op = build_blocksparse_op(h)
v = jnp.asarray(
    np.random.default_rng(0).standard_normal((sec.dim_dw, sec.dim_up)))
y_ref = np.asarray(dense @ np.asarray(v).reshape(-1)).reshape(
    np.asarray(v).shape)
t0 = time.time()
yk = np.asarray(from_padded(op, matvec_bs_padded(op, to_padded(op, v))))
print(f"compiled blocksparse kernel on TPU: err={np.abs(yk-y_ref).max():.2e}"
      f" ({time.time()-t0:.1f}s)", flush=True)
y1, r1 = chain_step(op, to_padded(op, v / np.linalg.norm(np.asarray(v))),
                    jnp.float32(1.0))
print(f"fused chain step on TPU: rsqrt={float(r1):.6f} "
      f"vs 1/|y|={1.0/float(jnp.linalg.norm(y1)):.6f}", flush=True)
print("VERIFY DRIVE OK", flush=True)
