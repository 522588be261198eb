from dnsjax.geometry.se3 import (  # noqa: F401
    quat_to_rotation,
    rotation_to_quat,
    camera_from_tensor,
    tensor_from_camera,
    invert_se3,
    compose_c2w,
)
from dnsjax.geometry.rays import (  # noqa: F401
    pixel_dirs,
    rays_from_uv,
    all_rays,
    ray_box_far,
    project_points,
)
