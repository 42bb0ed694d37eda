from .mesh import make_mesh, pad_to_multiple
from .matvec import shard_hamiltonian, sharded_matvec, ShardedLanczos
