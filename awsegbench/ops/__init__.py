"""On-device image ops + Pallas TPU kernels replacing the reference's
cv2/scipy CPU calls and its hot device ops."""

from .attention import sr_attention, sr_attention_reference
from .filters import (
    box_filter,
    depthwise_conv3x3,
    gaussian_blur_cv,
    gaussian_filter_scipy,
    laplacian,
    local_contrast,
    rgb_to_gray_cv,
    separable_filter,
)
from .depthkernels_train import depth_stage1_fused_train
from .headkernels import seg_head_fused
from .headkernels_train import seg_head_fused_train
from .resize import resize_bilinear, resize_nearest, upsample_like
from .upconv import upsample_conv3x3

__all__ = [
    "gaussian_blur_cv", "gaussian_filter_scipy", "box_filter", "laplacian",
    "local_contrast", "rgb_to_gray_cv", "separable_filter",
    "depthwise_conv3x3",
    "resize_bilinear", "resize_nearest", "upsample_like",
    "upsample_conv3x3", "seg_head_fused",
    "seg_head_fused_train", "depth_stage1_fused_train",
    "sr_attention", "sr_attention_reference",
]
