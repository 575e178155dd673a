"""Device-side image preprocessing: resize + normalize as MXU work.

The reference resizes every frame per-camera on the host with cv2
(/root/reference/watsor/detection/edge_tpu.py:35) before handing it to the
native runtime. TPU-first, the whole camera batch ships to HBM as uint8 and
the resize runs as two matmuls per axis (separable bilinear interpolation
expressed as dense [out, in] interpolation matrices) so it lands on the MXU
and fuses with the uint8→bf16 normalize that feeds the first conv.

The interpolation matrices depend only on (in_size, out_size); they are
built once on the host and closed over by the jitted step.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] bilinear interpolation weights (align_corners
    False / half-pixel centers, matching cv2.INTER_LINEAR)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == out_size:
        np.fill_diagonal(m, 1.0)
        return m
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), in_size - 1)
        hi_c = min(max(lo + 1, 0), in_size - 1)
        m[o, lo_c] += 1.0 - frac
        m[o, hi_c] += frac
    return m


def resize_bilinear_mxu(images, out_h: int, out_w: int, dtype=jnp.float32):
    """Batched separable bilinear resize via two dense contractions.

    images: [B, H, W, C] (any float/uint dtype) -> [B, out_h, out_w, C].
    """
    B, H, W, C = images.shape
    if (H, W) == (out_h, out_w):
        return images.astype(dtype)
    Ly = jnp.asarray(_interp_matrix(H, out_h), dtype)        # [out_h, H]
    Lx = jnp.asarray(_interp_matrix(W, out_w), dtype)        # [out_w, W]
    x = images.astype(dtype)
    # contract H: [B,H,W,C] x [out_h,H] -> [B,W,C,out_h]
    x = jnp.einsum('bhwc,oh->bowc', x, Ly,
                   preferred_element_type=jnp.float32).astype(dtype)
    x = jnp.einsum('bowc,pw->bopc', x, Lx,
                   preferred_element_type=jnp.float32).astype(dtype)
    return x


def normalize_images(images, dtype=jnp.bfloat16):
    """uint8 [0,255] -> dtype in [-1, 1] (the TF SSD-MobileNet convention,
    same normalization as the reference's UFF path at
    /root/reference/watsor/detection/tensorrt_gpu.py:180)."""
    return (images.astype(dtype) * (2.0 / 255.0) - 1.0).astype(dtype)


@partial(jax.jit, static_argnames=('out_h', 'out_w', 'dtype'))
def preprocess_batch(images_u8, out_h: int, out_w: int, dtype=jnp.bfloat16):
    """Fused resize + normalize: uint8 [B,H,W,3] -> dtype [B,out_h,out_w,3]
    in [-1, 1]. XLA fuses the scale/shift into the resize contraction."""
    x = resize_bilinear_mxu(images_u8, out_h, out_w, dtype=jnp.float32)
    return (x * (2.0 / 255.0) - 1.0).astype(dtype)
