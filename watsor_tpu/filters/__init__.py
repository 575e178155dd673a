from watsor_tpu.filters.static import ConfidenceFilter, AreaFilter
from watsor_tpu.filters.mask import MaskFilter, ZoneMask, get_alpha_channel
from watsor_tpu.filters.track import TrackFilter
from watsor_tpu.filters.sieve import DetectionSieve

__all__ = ["ConfidenceFilter", "AreaFilter", "MaskFilter", "ZoneMask",
           "get_alpha_channel", "TrackFilter", "DetectionSieve"]
