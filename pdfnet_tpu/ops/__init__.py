"""Kernel layer: jittable tensor ops backing the models.

Each op has a pure-XLA implementation (reference-grade, parity-tested against
recorded PyTorch outputs); performance-critical ones additionally have Pallas
TPU kernels selected via the ``impl`` argument.
"""

from pdfnet_tpu.ops.gather import gather_feat, gather_pixels  # noqa: F401
from pdfnet_tpu.ops.grouping import group_points, group_points_level2  # noqa: F401
from pdfnet_tpu.ops.chebconv import cheb_basis, cheb_conv  # noqa: F401
from pdfnet_tpu.ops.heatmap import clamped_sigmoid, heatmap_nms, heatmap_topk, decode_centers  # noqa: F401
from pdfnet_tpu.ops.geometry import (  # noqa: F401
    backproject_depth,
    depth_normals,
    orthographic_project,
    perspective_project,
    uv_root_to_3d,
)
from pdfnet_tpu.ops.fps import farthest_point_sampling  # noqa: F401
from pdfnet_tpu.ops.resize import resize_bilinear_align_corners, upsample2x_nearest  # noqa: F401
from pdfnet_tpu.ops.crop_resize import crop_and_resize  # noqa: F401
