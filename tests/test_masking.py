import numpy as np

from dig_tpu.data.masking import RandomMaskingGenerator, random_mask_batch


def test_exact_mask_count():
    gen = RandomMaskingGenerator((8, 32), mask_ratio=0.7, num_view=2)
    m = gen()
    assert m.shape == (2, 256)
    assert (m.sum(axis=-1) == int(0.7 * 256)).all()


def test_batch_masks_independent():
    gen = RandomMaskingGenerator((8, 32), 0.5, num_view=1, rng=np.random.default_rng(0))
    m = gen.batch(64)
    assert m.shape == (64, 1, 256)
    assert (m.sum(-1) == 128).all()
    # masks should differ between samples
    assert not np.all(m[0] == m[1])


def test_device_mask():
    import jax

    key = jax.random.PRNGKey(0)
    m = random_mask_batch(key, 4, 256, 179, num_view=2)
    assert m.shape == (4, 2, 256)
    assert (np.asarray(m).sum(-1) == 179).all()
