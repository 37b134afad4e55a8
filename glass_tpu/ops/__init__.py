from . import boxes
from .iou_rotated import (
    pairwise_intersection_rotated,
    pairwise_iou_rotated,
    pairwise_ioa_rotated,
)
from .nms_rotated import nms_rotated_mask, batched_nms_rotated_mask
from .roi_align_rotated import (
    roi_align_rotated,
    roi_align_rotated_batched,
    multilevel_roi_align_rotated,
)
from .min_area_rect import min_area_rect, polygons_to_rotated_boxes
