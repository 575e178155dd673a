from watsor_tpu.detection.backend import DetectorBackend, JaxDetectorBackend
from watsor_tpu.detection.detector import ObjectDetector, create_object_detectors

__all__ = ["DetectorBackend", "JaxDetectorBackend",
           "ObjectDetector", "create_object_detectors"]
