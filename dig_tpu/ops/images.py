"""On-device image normalization for uint8 batch transport.

The reference normalizes on the host inside the torchvision transform
stack (mean=std=0.5 over [0,1]; dataset/dataset_lmdb.py resize+ToTensor+
Normalize) and ships float32 to the GPU.  Here the host ships raw
**uint8** HWC batches — 4x less host->device traffic, the usual PCIe/DMA
bottleneck — and the conversion runs as the first (fused, free) op of the
jitted step.  The expression matches the host-side
`transforms.resize_normalize` float math exactly, so uint8 transport is
bit-identical to host-side normalization.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_model_images(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> float32 in [-1, 1]; float input passes through
    (already normalized on the host, e.g. hand-built test batches)."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return x
