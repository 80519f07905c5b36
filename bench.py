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

Modes (env BENCH_MODE): "pretrain" (default), "eval" — greedy-decode
inference throughput of the ViT-S recognizer (the reference's eval is an
uncached O(T) decoder recompute; ~400 imgs/sec/A100 measured-class) —
"finetune" — the supervised teacher-forced recognition train step
(reference recipe: batch 256/chip, ViT-S + tf_decoder, README.md:91-117) —
or "input" — HOST input-pipeline throughput (decode + host-side aug
through DataLoader, no TPU), per-core, against the device's measured
consumption rate; quantifies when --device_aug/--device_abi_aug become
mandatory to keep the chip fed (see README "Feeding the chip").
"""

import json
import os
import sys
import time

# persistent XLA compile cache: first-compile latency through remote-compile
# relays is high and variable (50-270 s measured); reruns should not pay it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dig_tpu_xla"))

A100_BASELINE_IMGS_PER_SEC = 850.0
A100_EVAL_BASELINE_IMGS_PER_SEC = 400.0
# derived, not measured: the finetune step is ~3.5 ViT-fwd-equivalents
# per image (1 fwd + 2 bwd + ~15% decoder) vs the pretrain step's 8
# (2-view student fwd+bwd + 2-view momentum key fwd), so the same
# A100-class hardware runs it at roughly 850 * 8 / 3.5
A100_FINETUNE_BASELINE_IMGS_PER_SEC = 1900.0

# peak dense bf16 matmul throughput per chip, by device_kind substring
# (public spec sheets; override with BENCH_PEAK_TFLOPS)
PEAK_TFLOPS = [
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v5", 459.0),
    ("v4", 275.0), ("v6e", 918.0), ("v6", 918.0), ("v3", 123.0),
    ("v2", 45.0),
]


def device_peak_tflops():
    import jax

    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = jax.devices()[0].device_kind.lower()
    for sub, tf in PEAK_TFLOPS:
        if sub in kind:
            if sub in ("v5", "v6"):
                # bare-generation fallback: a v5e variant whose kind
                # string lacks 'lite'/'e' would silently get the v5p
                # peak and understate MFU ~2.3x — make it auditable
                print(f"note: ambiguous device_kind {kind!r}; assuming "
                      f"{tf} TF/s peak (override with BENCH_PEAK_TFLOPS)",
                      file=sys.stderr)
            return tf
    return None


def program_flops(jitted, *args, **kwargs):
    """FLOPs of one execution from XLA's own cost analysis (regenerable,
    no hand math).  Returns None when the backend doesn't report it."""
    try:
        an = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an["flops"])
    except Exception:
        return None


def eval_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dig_tpu.models.rec_model import build_rec_model
    from dig_tpu.train.finetune import make_eval_step

    n_chips = jax.device_count()
    batch = int(os.environ.get("BENCH_BATCH", "512")) * n_chips
    steps = int(os.environ.get("BENCH_STEPS", "25"))
    model = build_rec_model(os.environ.get("BENCH_MODEL",
                                           "vit_small_patch4_32x128"),
                            "tf_decoder", dtype=jnp.bfloat16)
    rngk = jax.random.PRNGKey(0)
    images = jnp.zeros((batch, 32, 128, 3), jnp.float32)
    targets = jnp.zeros((batch, 25), jnp.int32)
    lens = jnp.ones((batch,), jnp.int32)
    variables = model.init(rngk, images[:2], targets[:2], lens[:2], True)
    # eos=-1: fixed-length decode — stable/conservative on random weights
    # (real checkpoints early-exit on EOS and run ~1.5-2x faster)
    eval_fn = make_eval_step(model, beam_width=0, eos=-1)
    batch_d = {"images": images, "targets": targets, "lengths": lens}

    ids, loss = eval_fn(variables["params"], batch_d)
    float(np.asarray(loss).sum())
    times = []
    prev = ids
    for i in range(steps):
        # every call must differ in VALUE: the remote relay memoizes
        # value-identical dispatches (chain prev ids + a step-unique eps);
        # per-step host fetches + median de-noise relay hiccups
        batch_d = dict(batch_d)
        batch_d["images"] = (
            batch_d["images"]
            + (prev[0, 0] * 0).astype(jnp.float32)
            + jnp.float32((i + 1) * 1e-6)
        )
        t0 = time.perf_counter()
        ids, loss = eval_fn(variables["params"], batch_d)
        float(np.asarray(loss).sum())
        times.append(time.perf_counter() - t0)
        prev = ids
    dt = sorted(times)[len(times) // 2]
    per_chip = batch / dt / n_chips
    print(json.dumps({
        "metric": "eval_greedy_imgs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / A100_EVAL_BASELINE_IMGS_PER_SEC, 3),
    }))


def finetune_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dig_tpu.models.rec_model import build_rec_model
    from dig_tpu.optim import make_optimizer
    from dig_tpu.parallel.mesh import create_mesh, shard_batch
    from dig_tpu.train.finetune import init_finetune_state, make_finetune_step
    from dig_tpu.utils.schedules import cosine_schedule

    n_chips = jax.device_count()
    batch = int(os.environ.get("BENCH_BATCH", "256")) * n_chips
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = 3

    # regularization matches the reference finetune recipe's defaults
    # (run_class_finetuning.py:69-73: drop 0.0, attn_drop 0.0, drop_path
    # 0.1) — attn_drop > 0 would force the unfused attention path + a
    # [B,H,T,T] dropout mask per layer that the real recipe never pays
    model = build_rec_model(os.environ.get("BENCH_MODEL",
                                           "vit_small_patch4_32x128"),
                            "tf_decoder", dtype=jnp.bfloat16, drop_rate=0.0,
                            attn_drop_rate=0.0, drop_path_rate=0.1)
    total = 1000
    tx = make_optimizer(
        cosine_schedule(1e-4 * batch / 256, 1e-6, 1, total, warmup_steps=10),
        cosine_schedule(0.05, 0.05, 1, total),
        clip_grad=None,
    )
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0))
    mesh = create_mesh()
    step_fn = make_finetune_step(model, smoothing=0.1, mesh=mesh)

    rng = np.random.default_rng(0)
    # codec convention (utils/charset.py::encode): chars, EOS at len-1,
    # PADDING after; `lengths` counts the EOS
    lens = rng.integers(3, 12, size=(batch,))
    targets = rng.integers(0, 94, size=(batch, 25))
    targets[np.arange(25)[None, :] >= lens[:, None]] = 95
    targets[np.arange(batch), lens - 1] = 94
    batch_np = {
        "images": rng.normal(size=(batch, 32, 128, 3)).astype(np.float32),
        "targets": targets.astype(np.int32),
        "lengths": lens.astype(np.int32),
    }
    device_batch = shard_batch(mesh, batch_np)
    key = jax.random.PRNGKey(1)

    for i in range(warmup):
        key, sub = jax.random.split(key)
        state, metrics, _ = step_fn(state, device_batch, sub)
    float(metrics["loss"])  # completion barrier (see main())

    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics, _ = step_fn(state, device_batch, sub)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in benchmark"

    per_chip = batch * steps / dt / n_chips
    result = {
        "metric": "finetune_imgs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / A100_FINETUNE_BASELINE_IMGS_PER_SEC, 3),
        "step_ms": round(dt / steps * 1e3, 2),
    }
    flops = program_flops(step_fn, state, device_batch, key)
    peak = device_peak_tflops()
    if flops and peak:
        result["mfu"] = round(flops / (dt / steps) / n_chips / (peak * 1e12), 4)
        result["step_tflops"] = round(flops / 1e12, 3)
    print(json.dumps(result))


def input_bench():
    """Host input-pipeline throughput: imgs/sec through DataLoader for the
    three host-work profiles, measured on synthetic 32x100 JPEGs (or an
    existing LMDB via BENCH_DATA).  No TPU involved.  `value` is the
    binding case (pretrain 2-view SeqCLR aug); `vs_baseline` divides by the
    device's measured pretrain consumption (945 imgs/s/chip, BENCH_r03) —
    <1.0 means this host starves the chip unless aug moves on-device."""
    import tempfile

    import cv2
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dig_tpu.data.dataset import build_dataset, build_pretraining_dataset
    from dig_tpu.data.pipeline import DataLoader
    from dig_tpu.data.samplers import ShardedSampler

    DEVICE_PRETRAIN_IMGS_PER_SEC = 945.0  # BENCH_r03 (v5e, batch 128)

    n_samples = int(os.environ.get("BENCH_INPUT_SAMPLES", "2048"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    workers = int(os.environ.get("BENCH_WORKERS", str(os.cpu_count() or 1)))

    data = os.environ.get("BENCH_DATA")
    tmp = None
    if not data:
        from dig_tpu.data.lmdb_store import LmdbWriter

        tmp = tempfile.TemporaryDirectory()
        data = os.path.join(tmp.name, "db")
        rng = np.random.default_rng(0)
        with LmdbWriter(data) as w:
            for i in range(1, n_samples + 1):
                img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
                cv2.putText(img, "sample", (2, 24),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
                ok, buf = cv2.imencode(".jpg", img)
                assert ok
                w.put(b"image-%09d" % i, buf.tobytes())
                w.put(b"label-%09d" % i, b"sample")
            w.put(b"num-samples", str(n_samples).encode())

    def rate(dataset, n_workers=None, worker_type="thread") -> float:
        sampler = ShardedSampler(len(dataset), rank=0, world=1, seed=0)
        loader = DataLoader(dataset, sampler, batch_size=batch,
                            num_workers=n_workers or workers,
                            worker_type=worker_type)
        n_img = 0
        it = iter(loader)
        next(it)  # warm thread pool + cv2
        t0 = time.perf_counter()
        for b in it:
            first = b[0] if isinstance(b, (tuple, list)) else next(iter(b.values()))
            n_img += len(first)
        return n_img / (time.perf_counter() - t0)

    rng = np.random.default_rng(0)
    pre = rate(build_pretraining_dataset(data, rng=rng))  # 2-view SeqCLR aug
    ft_abi = rate(build_dataset(data, is_train=True, use_aug=True,
                                use_abi_aug=True, rng=rng))
    ft_plain = rate(build_dataset(data, is_train=True, rng=rng))

    # BENCH_INPUT_SWEEP=1: imgs/sec for the binding case (pretrain 2-view
    # aug) over num_workers x {thread,process} — the worker-scaling data
    # behind README "Feeding the chip".  On a single-core host the sweep
    # measures overhead, not scaling (every config shares one core).
    sweep = {}
    if os.environ.get("BENCH_INPUT_SWEEP"):
        for wt in ("thread", "process"):
            for nw in (1, 2, 4, 8):
                ds = build_pretraining_dataset(data, rng=np.random.default_rng(0))
                sweep[f"{wt}_{nw}"] = round(rate(ds, nw, wt), 2)
    if tmp:
        tmp.cleanup()

    cores = os.cpu_count() or 1
    print(json.dumps({
        "metric": "input_host_imgs_per_sec",
        "value": round(pre, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(pre / DEVICE_PRETRAIN_IMGS_PER_SEC, 3),
        "host_cores": cores,
        "workers": workers,
        "pretrain_seqclr_aug": round(pre, 2),
        "finetune_abi_aug": round(ft_abi, 2),
        "finetune_plain": round(ft_plain, 2),
        "per_core": {
            "pretrain_seqclr_aug": round(pre / cores, 2),
            "finetune_abi_aug": round(ft_abi / cores, 2),
            "finetune_plain": round(ft_plain / cores, 2),
        },
        "device_demand_pretrain": DEVICE_PRETRAIN_IMGS_PER_SEC,
        **({"worker_sweep": sweep} if sweep else {}),
    }))


def _pretrain_breakdown(model, state, step_fn, batch, key, wall_step_s):
    """Per-pass device timings (ms), regenerating the README/ROOFLINE step
    budget: student forward, momentum-key forward, pure device step time
    from a chained 5-step scan (no host dispatch), the backward+update
    residual, and the host-dispatch residual.  Memoization-safe over the
    axon relay: every program chains a drifting scalar through its inputs
    and outputs and a host scalar fetch is the completion barrier."""
    import jax
    import jax.numpy as jnp

    images, aug, mask = batch["images"], batch["aug_images"], batch["mask"]
    all_images = jnp.concatenate([images, aug], axis=0)
    m = mask.at[:, 1].set(False)  # only_mim_on_ori_img default
    flat_mask = m.transpose(1, 0, 2).reshape(-1, m.shape[-1])
    rngk = jax.random.PRNGKey(2)

    n_scan = 5

    def timeit_scanned(fn, *args, iters=3):
        """Per-iteration device time of `fn(*args, s) -> s`, amortizing the
        per-call relay dispatch over an n_scan-deep in-program loop."""

        @jax.jit
        def scanned(s, *a):
            return jax.lax.fori_loop(0, n_scan, lambda i, s: fn(s, *a), s)

        s = jnp.float32(0.0)
        s = scanned(s, *args)
        float(s)  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            s = scanned(s, *args)
            float(s)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / n_scan

    def student_fwd(s, params):
        out = model.apply({"params": params}, all_images + s * 1e-20,
                          flat_mask, False, rngs={"dropout": rngk},
                          method=model.forward_student)
        return s + 1e-6 + out["q1"].ravel()[0].astype(jnp.float32) * 1e-20

    def key_fwd(s, ema):
        k1, _ = model.apply({"params": ema}, all_images + s * 1e-20,
                            flat_mask, True, method=model.forward_key)
        return s + 1e-6 + k1.ravel()[0].astype(jnp.float32) * 1e-20

    raw = step_fn.raw

    @jax.jit
    def scan_steps(st, b, k):
        def body(i, st):
            st2, _ = raw(st, b, jax.random.fold_in(k, i))
            return st2

        st = jax.lax.fori_loop(0, n_scan - 1, body, st)
        st, metrics = raw(st, b, jax.random.fold_in(k, n_scan - 1))
        return st, metrics["loss"]

    fwd_ms = timeit_scanned(student_fwd, state.params) * 1e3
    kfwd_ms = timeit_scanned(key_fwd, state.ema_params) * 1e3

    st = state
    st, loss = scan_steps(st, batch, jax.random.fold_in(key, 0))
    float(loss)  # compile + warm
    ts = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        st, loss = scan_steps(st, batch, jax.random.fold_in(key, i))
        float(loss)
        ts.append(time.perf_counter() - t0)
    device_step_ms = sorted(ts)[len(ts) // 2] / n_scan * 1e3

    return {
        "student_fwd": round(fwd_ms, 2),
        "key_fwd": round(kfwd_ms, 2),
        "step_device": round(device_step_ms, 2),
        "bwd_opt": round(device_step_ms - fwd_ms - kfwd_ms, 2),
        "dispatch": round(max(wall_step_s * 1e3 - device_step_ms, 0.0), 2),
    }


def main():
    if os.environ.get("BENCH_MODE") == "eval":
        return eval_bench()
    if os.environ.get("BENCH_MODE") == "finetune":
        return finetune_bench()
    if os.environ.get("BENCH_MODE") == "input":
        return input_bench()
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
        os.environ.get("BENCH_MODEL",
                       "pretrain_simmim_moco_ori_vit_small_patch4_32x128"),
        num_windows=4, temperature=0.2, dtype=jnp.bfloat16,
    )
    total = 1000
    tx = make_optimizer(
        cosine_schedule(2.4e-3, 1e-5, 1, total, warmup_steps=10),
        cosine_schedule(0.1, 0.1, 1, total),
        clip_grad=None,
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
    # fetch to host: a device->host copy of a value that depends on every
    # prior step is the only reliable completion barrier over remote relays
    float(metrics["loss"])

    # pipelined window (state-chained steps defeat relay memoization and
    # keep host dispatch overlapped with device compute)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, device_batch, sub)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in benchmark"

    per_chip = batch * steps / dt / n_chips
    result = {
        "metric": "pretrain_imgs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_IMGS_PER_SEC, 3),
        "step_ms": round(dt / steps * 1e3, 2),
    }

    # MFU from XLA's own per-step flop count + the chip's spec-sheet peak
    flops = program_flops(step_fn, state, device_batch, key)
    peak = device_peak_tflops()
    if flops and peak:
        result["mfu"] = round(flops / (dt / steps) / n_chips / (peak * 1e12), 4)
        result["step_tflops"] = round(flops / 1e12, 3)

    if os.environ.get("BENCH_BREAKDOWN", "1") != "0":
        result["breakdown_ms"] = _pretrain_breakdown(
            model, state, step_fn, device_batch, key, dt / steps)
    print(json.dumps(result))


def wait_for_backend(deadline_s: float = 600.0, probe_timeout_s: float = 280.0):
    # probe timeout must cover a cold first-compile over the relay
    # (50-270 s measured) — a killed probe caches nothing
    """Ride out a transient accelerator-relay outage before initializing
    JAX in-process (a dead backend poisons the whole process, so the probe
    runs as a subprocess).  Gives up after `deadline_s` and proceeds — the
    in-process attempt then reports the real error.  Tune/disable with
    BENCH_WAIT_RELAY_S (0 disables)."""
    import subprocess

    deadline_s = float(os.environ.get("BENCH_WAIT_RELAY_S", deadline_s))
    if deadline_s <= 0:
        return
    probe = ("import jax, jax.numpy as jnp;"
             "print(float(jax.jit(lambda x:(x@x).sum())(jnp.ones((8,8)))))")
    start = time.time()
    while True:
        remaining = deadline_s - (time.time() - start)
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=max(min(probe_timeout_s, remaining), 10.0),
                capture_output=True,
                env={**os.environ,
                     "JAX_COMPILATION_CACHE_DIR":
                         os.environ["JAX_COMPILATION_CACHE_DIR"]},
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return
        waited = time.time() - start
        if waited >= deadline_s:
            print(f"note: backend probe still failing after {waited:.0f}s; "
                  "proceeding anyway", file=sys.stderr)
            return
        print(f"note: backend unreachable ({waited:.0f}s/{deadline_s:.0f}s); "
              "retrying in 60s", file=sys.stderr)
        time.sleep(60)


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") != "input":  # input mode is host-only
        wait_for_backend()
    main()
