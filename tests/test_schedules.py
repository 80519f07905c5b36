import numpy as np

from dig_tpu.utils.schedules import (
    contrast_weight_schedule,
    cosine_schedule,
    moco_momentum_schedule,
)


def test_cosine_schedule_shape_and_endpoints():
    s = cosine_schedule(1e-3, 1e-5, epochs=10, steps_per_epoch=100, warmup_steps=50)
    assert len(s) == 1000
    assert s[0] == 0.0
    assert np.isclose(s[49], 1e-3)
    assert s[-1] >= 1e-5 and s[-1] < 2e-5


def test_cosine_schedule_warmup_epochs():
    s = cosine_schedule(0.5, 0.0, epochs=4, steps_per_epoch=10, warmup_epochs=2)
    assert len(s) == 40
    assert np.isclose(s[19], 0.5)
    assert np.all(np.diff(s[:20]) >= 0)
    assert np.all(np.diff(s[20:]) <= 0)


def test_moco_momentum_matches_reference_formula():
    import math

    epochs, spe, m0 = 10, 7, 0.99
    sched = moco_momentum_schedule(m0, epochs, spe, use_cosine=True)
    # reference: engine computes per step m(epoch + step/iters)
    for epoch in range(epochs):
        for step in range(spe):
            e = epoch + step / spe
            expect = 1.0 - 0.5 * (1.0 + math.cos(math.pi * e / epochs)) * (1.0 - m0)
            assert np.isclose(sched[epoch * spe + step], expect, atol=1e-6)


def test_contrast_weight_ramp():
    w = contrast_weight_schedule(0.1, epochs=3, steps_per_epoch=10, start_epoch=1, warmup_steps=5)
    assert np.all(w[:10] == 0.0)
    assert w[10] == 0.0 and np.isclose(w[14], 0.1)
    assert np.all(w[15:] == np.float32(0.1))
