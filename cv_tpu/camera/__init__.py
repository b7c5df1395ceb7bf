"""Camera models: pinhole intrinsics with optional K1 distortion."""

from .pinhole import (
    CameraIntrinsics,
    CameraIntrinsicsK1Distortion,
    CameraSpecification,
)

__all__ = [
    "CameraIntrinsics",
    "CameraIntrinsicsK1Distortion",
    "CameraSpecification",
]
