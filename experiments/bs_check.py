"""Quick correctness drive of the block-sparse fused kernel (CPU interpret)."""
import sys

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dmft_lanc_ed_tpu.bath import init_bath
from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.hamiltonian import build_sector_hamiltonian
from dmft_lanc_ed_tpu.ops.blocksparse import (
    blocksparse_applicable, build_blocksparse_op, chain_step, from_padded,
    matvec_bs_exact_flat, matvec_bs_padded, to_padded)
from dmft_lanc_ed_tpu.ops.dense import densify, matvec_dense_flat
from dmft_lanc_ed_tpu.sectors import SectorTable, qn

cfg = EDConfig(norb=1, nbath=6, uloc=(2.0,), ed_dtype="float64")
table = SectorTable(cfg)
sec = table.sector(qn(3, 4))
bath = init_bath(cfg)
hloc = np.zeros((1, 1, 1, 1))
h = build_sector_hamiltonian(cfg, sec, hloc, bath)
print("dims:", sec.dim_dw, sec.dim_up, "applicable:", blocksparse_applicable(h))
op = build_blocksparse_op(h)
dop = densify(h)
print("w_dw:", op.w_dw, "d_dw:", op.d_dw, "padded:", op.padded_shape)

rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((sec.dim_dw, sec.dim_up)))
v = v / jnp.linalg.norm(v)

y_ref = matvec_dense_flat(dop, v.reshape(-1)).reshape(v.shape)
y_ex = matvec_bs_exact_flat(op, v.reshape(-1)).reshape(v.shape)
print("exact vs dense:", float(jnp.abs(y_ex - y_ref).max()))

# interpret-mode kernel
import dmft_lanc_ed_tpu.ops.blocksparse as bs
vp = to_padded(op, v)
yp = matvec_bs_padded(op, vp, interpret=True)
y_k = from_padded(op, yp)
print("kernel vs dense:", float(jnp.abs(y_k - y_ref).max()))
# padding stays zero
pad_norm = float(jnp.abs(yp[sec.dim_dw:, :]).max()) + \
    float(jnp.abs(yp[:, sec.dim_up:]).max())
print("pad residue:", pad_norm)

# fused chain step: y = inv*H v, rsqrt(|y|^2)
y1, r1 = chain_step(op, vp, jnp.float32(1.0), interpret=True)
print("chain norm check:", float(r1), 1.0 / float(jnp.linalg.norm(y1)))
