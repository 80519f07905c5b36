"""Random patch masking for masked-image-modeling pre-training.

Parity target: `RandomMaskingGenerator` (reference: masking_generator.py:12-46)
— an exact-count boolean mask over the (grid_h x grid_w) patch grid, one
independent mask per view.  Two implementations are provided:

* a host-side numpy generator (drop-in for the data pipeline), batched —
  the per-sample Python loop of the reference becomes one vectorized
  argsort, and
* `random_mask_batch`, a jittable on-device version for fused pipelines
  (uses `jax.random.permutation` semantics via argsort of uniforms, which
  keeps shapes static for XLA).
"""

from __future__ import annotations

import numpy as np


class RandomMaskingGenerator:
    """Exact-count random masking over a patch grid.

    Returns float masks of shape ``[num_patches]`` (single view) or
    ``[num_view, num_patches]`` matching the reference's stacking behavior.
    """

    def __init__(self, input_size, mask_ratio, num_view: int = 1, rng=None):
        if not isinstance(input_size, tuple):
            input_size = (input_size,) * 2
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.num_mask = int(mask_ratio * self.num_patches)
        self.num_view = num_view
        self.rng = rng if rng is not None else np.random.default_rng()

    def __repr__(self):
        return "Mask: total patches {}, mask patches {}".format(
            self.num_patches, self.num_mask
        )

    def __call__(self):
        masks = self.batch(1)[0]
        if self.num_view == 1:
            return masks[0]
        return masks

    def batch(self, n: int) -> np.ndarray:
        """Vectorized: ``[n, num_view, num_patches]`` float32 masks."""
        scores = self.rng.random((n, self.num_view, self.num_patches))
        # The `num_mask` smallest scores per row are masked: exact count.
        kth = np.argsort(scores, axis=-1)
        masks = np.zeros((n, self.num_view, self.num_patches), dtype=np.float32)
        np.put_along_axis(masks, kth[..., : self.num_mask], 1.0, axis=-1)
        return masks


def random_mask_batch(key, batch: int, num_patches: int, num_mask: int, num_view: int = 1):
    """Jittable exact-count random mask: ``[batch, num_view, num_patches]`` bool.

    Static shapes (XLA-friendly): rank each patch by a uniform draw and mask
    the ``num_mask`` lowest ranks.
    """
    import jax
    import jax.numpy as jnp

    u = jax.random.uniform(key, (batch, num_view, num_patches))
    ranks = jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)
    return ranks < num_mask
