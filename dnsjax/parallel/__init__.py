from dnsjax.parallel.mesh import make_map_fn_dp, ray_mesh  # noqa: F401
