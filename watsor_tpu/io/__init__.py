from watsor_tpu.io.native import available as native_available, NativeUnavailable

__all__ = ["native_available", "NativeUnavailable"]
