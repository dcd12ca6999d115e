"""TPU-native differentiable spatial ops.

Every sampling grid in the layout2img model family is an axis-aligned box
transform, so bilinear sampling is *separable*: a 2-D warp factors into two
1-D interpolation-matrix products `W_y @ img @ W_x^T`. Unlike the reference's
CUDA gather kernels (`F.grid_sample`, `torchvision.ops.RoIAlign` — see
reference `utils/bilinear.py`, `model/rcnn_discriminator_app.py:32-33`),
these formulations run on the TPU MXU as small batched matmuls with fully
static shapes.
"""

from layout2img_tpu.ops.interp import (
    resize_bilinear,
    resize_nearest,
    masks_to_layout,
    sample_matrix_1d,
)
from layout2img_tpu.ops.bbox import bbox_mask, xywh_to_xyxy
from layout2img_tpu.ops.roi import roi_align, dual_scale_roi_align
from layout2img_tpu.ops.relation import box_relational_embedding

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "masks_to_layout",
    "sample_matrix_1d",
    "bbox_mask",
    "xywh_to_xyxy",
    "roi_align",
    "dual_scale_roi_align",
    "box_relational_embedding",
]
