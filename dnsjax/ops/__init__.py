from dnsjax.ops.hashgrid import HashGridSpec, init_hash_table, hash_encode  # noqa: F401
from dnsjax.ops.oneblob import oneblob_encode  # noqa: F401
from dnsjax.ops.mlp import init_mlp, mlp_apply  # noqa: F401
