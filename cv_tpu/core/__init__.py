"""Core geometric types: Lie algebra, poses, projective points."""

from . import lie, projective
from .pose import (
    CameraToCamera,
    CameraToWorld,
    Isometry3,
    WorldToCamera,
    WorldToWorld,
    camera_to_camera_residual,
    world_to_camera_residual,
)

__all__ = [
    "lie",
    "projective",
    "Isometry3",
    "WorldToCamera",
    "CameraToWorld",
    "CameraToCamera",
    "WorldToWorld",
    "world_to_camera_residual",
    "camera_to_camera_residual",
]
