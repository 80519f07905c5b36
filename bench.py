#!/usr/bin/env python
"""Throughput benchmark: DiG pre-training step (ViT-Small, MoCo+MIM) on the
available accelerator.

Prints ONE JSON line:
  {"metric": "pretrain_imgs_per_sec_per_chip", "value": N,
   "unit": "imgs/sec/chip", "vs_baseline": N}

Baseline: the reference trains pretrain_simmim_moco_ori_vit_small on
8x A100 with per-GPU batch 128 (README.md:53-79).  A100 measured-class
throughput for this recipe (4 ViT-S passes per step on 2x256-token views,
fp16) is ~850 imgs/sec/chip; the north star is >= 2x that per chip
(BASELINE.json).  vs_baseline reports value / 850 (i.e. 2.0 == target).
"""

import json
import os
import sys
import time

A100_BASELINE_IMGS_PER_SEC = 850.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from dig_tpu.models.registry import create_model
    from dig_tpu.optim import make_optimizer
    from dig_tpu.parallel.mesh import create_mesh, shard_batch
    from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
    from dig_tpu.utils.schedules import (
        contrast_weight_schedule,
        cosine_schedule,
        moco_momentum_schedule,
    )

    n_chips = jax.device_count()
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "128"))
    batch = per_chip_batch * n_chips
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = 3

    model = create_model(
        "pretrain_simmim_moco_ori_vit_small_patch4_32x128",
        num_windows=4, temperature=0.2, dtype=jnp.bfloat16,
    )
    total = 1000
    tx = make_optimizer(
        cosine_schedule(2.4e-3, 1e-5, 1, total, warmup_steps=10),
        cosine_schedule(0.1, 0.1, 1, total),
        clip_grad=3.0,
    )
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    mesh = create_mesh()
    step_fn = make_pretrain_step(
        model,
        moco_momentum_schedule(0.99, 1, total),
        contrast_weight_schedule(0.1, 1, total, warmup_steps=10),
        mesh=mesh,
    )

    rng = np.random.default_rng(0)
    batch_np = {
        "images": rng.normal(size=(batch, 32, 128, 3)).astype(np.float32),
        "aug_images": rng.normal(size=(batch, 32, 128, 3)).astype(np.float32),
        "mask": rng.random((batch, 2, 256)) < 0.7,
    }
    device_batch = shard_batch(mesh, batch_np)
    key = jax.random.PRNGKey(1)

    for i in range(warmup):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, device_batch, sub)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, device_batch, sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * steps / dt
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "pretrain_imgs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
