from watsor_tpu.config.loader import parse, validate, normalize, SECRETS_YAML
from watsor_tpu.config.coco import COCO_CLASSES, CocoClass, get_coco_class

__all__ = [
    "parse", "validate", "normalize", "SECRETS_YAML",
    "COCO_CLASSES", "CocoClass", "get_coco_class",
]
