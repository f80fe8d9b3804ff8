from segs_slam_tpu.core.camera import (
    Camera,
    focal2fov,
    fov2focal,
    projection_matrix,
    world_to_view,
)
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.core import se3

__all__ = [
    "Camera",
    "Keyframe",
    "focal2fov",
    "fov2focal",
    "projection_matrix",
    "world_to_view",
    "se3",
]
