from watsor_tpu.ops.boxes import decode_boxes, encode_boxes, iou_matrix, box_area
from watsor_tpu.ops.anchors import ssd_anchors, AnchorSpec
from watsor_tpu.ops.nms import batched_class_aware_nms
from watsor_tpu.ops.preprocess import normalize_images, resize_bilinear_mxu, preprocess_batch

__all__ = [
    "decode_boxes", "encode_boxes", "iou_matrix", "box_area",
    "ssd_anchors", "AnchorSpec",
    "batched_class_aware_nms",
    "normalize_images", "resize_bilinear_mxu", "preprocess_batch",
]
