from watsor_tpu.testing.shapes import Artist, ShapeDetectorBackend, ShapeCounter, SHAPE_LABELS

__all__ = ["Artist", "ShapeDetectorBackend", "ShapeCounter", "SHAPE_LABELS"]
