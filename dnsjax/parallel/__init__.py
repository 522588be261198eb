from dnsjax.parallel.mesh import make_map_fn_dp, ray_mesh  # noqa: F401
from dnsjax.parallel.tp import (  # noqa: F401
    dp_tp_mesh,
    hash_encode_tp,
    make_map_fn_dp_tp,
)
