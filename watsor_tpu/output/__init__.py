from watsor_tpu.output.effects import (DrawEffect, DrawEffectWithContours,
                                       BlendEffect, CopyHeaderEffect,
                                       CopyImageEffect)
from watsor_tpu.output.visual import VisualEffects
from watsor_tpu.output.snapshot import Snapshot

__all__ = ["DrawEffect", "DrawEffectWithContours", "BlendEffect",
           "CopyHeaderEffect", "CopyImageEffect", "VisualEffects", "Snapshot"]
