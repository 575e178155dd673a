"""watsor-tpu: a TPU-native real-time multi-camera object-detection framework.

A ground-up rebuild of the capabilities of asmirnou/watsor (reference at
/root/reference) designed for JAX/XLA/Pallas on TPU: per-camera decoders feed
a single pinned host frame arena; frames from many cameras are batched into
one jit-compiled detection step (SSD-MobileNet forward, anchor decoding and
class-aware NMS as fused TPU ops); confidence/area/zone-mask filtering runs
vectorized on device; outputs (MQTT/HomeAssistant, MJPEG/MPEG-TS HTTP,
snapshots, recording) match the reference's public surface.
"""

__version__ = "0.1.0"
