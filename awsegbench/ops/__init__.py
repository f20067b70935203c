"""On-device image ops replacing the reference's cv2/scipy CPU calls."""

from .filters import (
    box_filter,
    gaussian_blur_cv,
    gaussian_filter_scipy,
    laplacian,
    local_contrast,
    rgb_to_gray_cv,
    separable_filter,
)
from .resize import resize_bilinear, resize_nearest, upsample_like

__all__ = [
    "gaussian_blur_cv", "gaussian_filter_scipy", "box_filter", "laplacian",
    "local_contrast", "rgb_to_gray_cv", "separable_filter",
    "resize_bilinear", "resize_nearest", "upsample_like",
]
