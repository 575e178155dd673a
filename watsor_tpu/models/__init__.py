from watsor_tpu.models.ssd import SSD, SSDConfig, build_detector
from watsor_tpu.models.mobilenet_v2 import MobileNetV2Backbone

__all__ = ["SSD", "SSDConfig", "build_detector", "MobileNetV2Backbone"]
