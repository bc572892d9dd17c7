from .camera import (  # noqa: F401
    FTHETA,
    RECTILINEAR,
    Camera,
    camera_from_json,
    camera_to_json,
    create_rescaled_camera,
    make_camera,
    pixel_to_camera,
    pixel_to_rig_direction,
    pixel_to_rig_near_infinity,
    ray_midpoint,
    rotation_from_angle_axis,
    angle_axis_from_rotation,
    sees,
    world_to_pixel,
)
from .rig import Rig, load_rig, save_rig, stack_cameras  # noqa: F401
