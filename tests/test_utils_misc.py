"""Coverage for the config parser, logging sinks, profiling helpers and
single-process dist fallback."""

import json
import os

import numpy as np
import pytest


def test_config_cli_roundtrip():
    from dig_tpu.config import PretrainConfig, parse_config

    cfg = parse_config(PretrainConfig, [
        "--batch_size", "64", "--epochs", "3", "--mask_ratio", "0.6",
        "--no_only_mim_on_ori_img", "--use_moco_m_cos",
        "--opt_betas", "0.9", "0.95",
        "--image_alone_path", "/a", "/b",
        "--unknown_flag", "whatever",
    ])
    assert cfg.batch_size == 64 and cfg.epochs == 3
    assert abs(cfg.mask_ratio - 0.6) < 1e-9
    assert cfg.only_mim_on_ori_img is False
    assert cfg.use_moco_m_cos is True
    assert cfg.opt_betas == (0.9, 0.95)
    assert cfg.image_alone_path == ["/a", "/b"]
    cfg.finalize(num_devices=8)
    assert abs(cfg.absolute_lr - cfg.lr * 64 * 8 / 256) < 1e-12


def test_finetune_config_lr_scaling():
    from dig_tpu.config import FinetuneConfig

    cfg = FinetuneConfig(batch_size=256, update_freq=2)
    cfg.finalize(num_devices=1)
    assert abs(cfg.absolute_lr - cfg.lr * 2.0) < 1e-12


def test_config_json_serializable():
    from dig_tpu.config import FinetuneConfig, config_to_json

    s = config_to_json(FinetuneConfig())
    assert json.loads(s)["decoder_name"] == "tf_decoder"


def test_jsonl_and_tee(tmp_path):
    from dig_tpu.utils.logging import JsonlLogger, ScreenTee

    jl = JsonlLogger(str(tmp_path))
    jl.write(epoch=0, loss=1.5)
    jl.write(epoch=1, loss=1.2)
    lines = open(tmp_path / "log.txt").read().strip().split("\n")
    assert json.loads(lines[1])["epoch"] == 1

    import sys

    tee = ScreenTee(str(tmp_path)).install()
    try:
        print("hello-tee")
    finally:
        sys.stdout = tee.terminal
    assert "hello-tee" in open(tmp_path / "screen.txt").read()


def test_metric_logger_meters():
    from dig_tpu.utils.metric_logger import MetricLogger, SmoothedValue

    logger = MetricLogger()
    for i in range(10):
        logger.update(loss=float(i))
    assert logger.meters["loss"].global_avg == 4.5
    assert logger.meters["loss"].max == 9.0
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 9.0):
        sv.update(v)
    assert sv.median == 2.0


def test_step_timer_and_memory_stats():
    import jax.numpy as jnp

    from dig_tpu.utils.profiling import StepTimer, device_memory_stats

    t = StepTimer()
    t.start()
    x = jnp.ones((8, 8)) * 2
    dt = t.stop(block_on=x)
    assert dt >= 0.0 and t.avg >= 0.0
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_dist_single_process_fallback(monkeypatch):
    from dig_tpu.parallel.dist import barrier, init_distributed_mode

    for var in ("WORLD_SIZE", "RANK", "OMPI_COMM_WORLD_SIZE", "SLURM_NTASKS"):
        monkeypatch.delenv(var, raising=False)
    info = init_distributed_mode()
    assert info["world_size"] == 1 and info["rank"] == 0
    barrier()  # no-op on one process


def test_fast_device_get_mixed_dtypes():
    import jax.numpy as jnp

    from dig_tpu.utils.checkpoint import fast_device_get

    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": jnp.arange(5, dtype=jnp.int32),
        "c": {"d": jnp.ones((2, 2), jnp.bfloat16) * 3},
        "s": 7,  # non-array leaf passes through
    }
    host = fast_device_get(tree)
    assert np.array_equal(host["a"], np.arange(12, dtype=np.float32).reshape(3, 4))
    assert np.array_equal(host["b"], np.arange(5, dtype=np.int32))
    assert float(np.asarray(host["c"]["d"], np.float32).sum()) == 12.0
    assert host["s"] == 7


def test_exact_gelu_tristate_flag():
    from dig_tpu.config import FinetuneConfig, parse_config

    assert parse_config(FinetuneConfig, []).exact_gelu is None
    assert parse_config(FinetuneConfig, ["--exact_gelu", "true"]).exact_gelu is True
    assert parse_config(FinetuneConfig, ["--exact_gelu", "false"]).exact_gelu is False


def test_resolve_exact_gelu_auto_on_for_torch_checkpoints():
    """The converted-eval path must run erf-GELU without env vars: an
    unset flag auto-enables exact GELU whenever --finetune/--resume is a
    torch .pth/.pt (run_finetune.py wires this through resolve_exact_gelu
    before any model code is traced)."""
    from dig_tpu.ops.activations import resolve_exact_gelu

    assert resolve_exact_gelu(None, ("DiG_finetuned.pth", "")) is True
    assert resolve_exact_gelu(None, ("", "ckpt.pt")) is True
    assert resolve_exact_gelu(None, ("out/checkpoint-9", "")) is False
    assert resolve_exact_gelu(None, ("", "")) is False
    # explicit flag always wins, in both directions
    assert resolve_exact_gelu(False, ("DiG_finetuned.pth", "")) is False
    assert resolve_exact_gelu(True, ("", "")) is True


def test_resolve_exact_gelu_env_var_precedence(monkeypatch):
    """DIG_TPU_EXACT_GELU (the documented env knob, activations.py:30)
    must keep working through the CLI: it beats path auto-detection but
    loses to an explicit --exact_gelu flag."""
    from dig_tpu.ops.activations import resolve_exact_gelu

    monkeypatch.setenv("DIG_TPU_EXACT_GELU", "1")
    assert resolve_exact_gelu(None, ("out/checkpoint-9", "")) is True
    assert resolve_exact_gelu(None, ("", "")) is True
    assert resolve_exact_gelu(False, ("", "")) is False  # flag wins
    monkeypatch.delenv("DIG_TPU_EXACT_GELU")
    assert resolve_exact_gelu(None, ("out/checkpoint-9", "")) is False


def test_set_exact_gelu_switch():
    import jax.numpy as jnp
    import numpy as np

    from dig_tpu.ops import activations

    old = activations.EXACT
    try:
        x = jnp.asarray(np.linspace(-3, 3, 64, dtype=np.float32))
        activations.set_exact(True)
        exact = np.asarray(activations.gelu(x))
        activations.set_exact(False)
        approx = np.asarray(activations.gelu(x))
        # the two forms differ but only at the ~1e-3 level
        d = np.abs(exact - approx).max()
        assert 0 < d < 5e-3
    finally:
        activations.EXACT = old


def test_remote_checkpoint_roundtrip_memory_fs():
    """gs://-style checkpoint save/restore/auto-resume routes through
    fsspec (validated on the in-memory filesystem; on a pod the same path
    carries gs:// — SURVEY.md §2.9 moxing/S3 -> GCS)."""
    import numpy as np
    import pytest

    fsspec = pytest.importorskip("fsspec")
    import jax.numpy as jnp

    from dig_tpu.train.state import TrainState
    from dig_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    import optax

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    base = "memory://ckpt_test/run1"
    path = save_checkpoint(base, 3, state, extra={"epoch": 3})
    assert path == base + "/checkpoint-3"
    assert latest_checkpoint(base) == path

    payload = restore_checkpoint(path)
    np.testing.assert_array_equal(payload["params"]["w"],
                                  np.arange(6, dtype=np.float32).reshape(2, 3))
    assert payload["step"] == 0 and payload["extra"] == {"epoch": 3}
    # missing remote dir -> None, like the local scan
    assert latest_checkpoint("memory://ckpt_test/does_not_exist") is None


def test_auto_resume_skips_partial_and_falls_back(tmp_path):
    """A save killed mid-write (no meta.json commit marker, or corrupt
    arrays) must not shadow older intact checkpoints: latest_checkpoint
    ignores marker-less dirs and auto_resume falls back newest-first past
    corrupt ones instead of silently starting fresh."""
    import jax.numpy as jnp
    import optax

    from dig_tpu.train.state import TrainState
    from dig_tpu.utils.checkpoint import (
        auto_resume,
        latest_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state = TrainState.create(params, optax.sgd(0.1))
    good = save_checkpoint(str(tmp_path), 2, state, extra={"epoch": 2})

    # partial checkpoint: dir exists, arrays written, NO meta.json yet
    partial = tmp_path / "checkpoint-5"
    partial.mkdir()
    (partial / "arrays.npz").write_bytes(b"truncated")
    assert latest_checkpoint(str(tmp_path)) == good

    # corrupt but "complete" checkpoint (meta present, arrays garbage):
    # restore fails -> fall back to checkpoint-2, not to a fresh state
    (partial / "treedef.pkl").write_bytes(b"garbage")
    (partial / "meta.json").write_text('{"step": 5}')
    fresh = TrainState.create(
        {"w": jnp.zeros(4, jnp.float32)}, optax.sgd(0.1))
    resumed, extra = auto_resume(str(tmp_path), fresh)
    assert extra == {"epoch": 2}
    np.testing.assert_array_equal(np.asarray(resumed.params["w"]),
                                  np.arange(4, dtype=np.float32))


def test_auto_resume_multihost_unanimity(tmp_path, monkeypatch):
    """A candidate restored by only SOME hosts is skipped by all (one
    host resuming while another starts fresh would deadlock the first
    collective); the next-older checkpoint is adopted unanimously."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils

    from dig_tpu.train.state import TrainState
    from dig_tpu.utils import checkpoint as ckpt

    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state = TrainState.create(params, optax.sgd(0.1))
    ckpt.save_checkpoint(str(tmp_path), 1, state, extra={"epoch": 1})
    ckpt.save_checkpoint(str(tmp_path), 2, state, extra={"epoch": 2})

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    def fake_allgather(x):
        arr = np.asarray(x)
        if arr.dtype == np.int32 and arr.shape == (1,):
            # restore-success vote: this host succeeded, the "other"
            # host failed on checkpoint-2, succeeded on checkpoint-1
            fake_allgather.calls += 1
            other = 0 if fake_allgather.calls == 1 else arr[0]
            return np.stack([arr, np.asarray([other], np.int32)])
        return np.stack([arr, arr])  # listing hash: agreement

    fake_allgather.calls = 0
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    fresh = TrainState.create({"w": jnp.zeros(4, jnp.float32)}, optax.sgd(0.1))
    resumed, extra = ckpt.auto_resume(str(tmp_path), fresh)
    assert extra == {"epoch": 1}
    assert fake_allgather.calls == 2


def test_prune_checkpoints(tmp_path):
    """--keep_ckpt_max retention: oldest numeric checkpoints removed, the
    newest N plus every non-numeric tag (best, mid-epoch) kept; 0 = keep
    all (the reference never deletes)."""
    import os

    from dig_tpu.utils.checkpoint import prune_checkpoints

    base = str(tmp_path)
    for name in ["checkpoint-0", "checkpoint-1", "checkpoint-2",
                 "checkpoint-3", "checkpoint-10", "checkpoint-best",
                 "checkpoint-3_100", "tb"]:
        os.makedirs(os.path.join(base, name))

    assert prune_checkpoints(base, 0) == []
    pruned = prune_checkpoints(base, 2)
    assert pruned == ["checkpoint-0", "checkpoint-1", "checkpoint-2"]
    left = sorted(os.listdir(base))
    assert left == ["checkpoint-10", "checkpoint-3", "checkpoint-3_100",
                    "checkpoint-best", "tb"]
    # keep >= count is a no-op
    assert prune_checkpoints(base, 5) == []


def test_reference_flag_translation():
    """Verbatim reference CLI spellings map onto the equivalent fields
    (run_class_finetuning.py:350-355 decoder_type branch, :75
    use_seq_cls_token, :171 use_cls -> use_mean_pooling=False;
    run_mae_pretraining_moco.py:186 moco_m_cos store_true)."""
    from dig_tpu.config import (FinetuneConfig, PretrainConfig,
                                parse_config)

    cfg = parse_config(FinetuneConfig, ["--decoder_type", "attention"])
    assert cfg.model_kind == "attn"
    cfg = parse_config(FinetuneConfig, ["--decoder_type=tf_decoder"])
    assert cfg.model_kind == "rec"
    cfg = parse_config(FinetuneConfig, ["--use_seq_cls_token", "True"])
    assert cfg.model_kind == "seq_cls"
    cfg = parse_config(FinetuneConfig, ["--use_seq_cls_token", "False"])
    assert cfg.model_kind == "rec"
    # bare flag (no value) reads as intent to enable, not a silent no-op
    cfg = parse_config(FinetuneConfig, ["--use_seq_cls_token"])
    assert cfg.model_kind == "seq_cls"
    cfg = parse_config(FinetuneConfig, ["--use_cls"])
    assert cfg.use_mean_pooling is False
    # a later explicit flag still wins over the translated one
    cfg = parse_config(FinetuneConfig,
                       ["--decoder_type", "attention", "--model_kind", "rec"])
    assert cfg.model_kind == "rec"
    # pretrain: --moco_m_cos is the reference's store_true spelling
    cfg = parse_config(PretrainConfig, ["--moco_m_cos"])
    assert cfg.use_moco_m_cos is True
    # finetune-only aliases don't fire (or break) on the pretrain config
    cfg = parse_config(PretrainConfig, ["--decoder_type", "attention"])
    assert not hasattr(cfg, "model_kind")


def test_nonzero_rank_gates(tmp_path, monkeypatch):
    """On a non-zero host, save_checkpoint returns the (unwritten) path
    and prune_checkpoints is a no-op — only host 0 touches shared storage
    (≙ the reference's save_on_master gate, utils/utils.py:363-373)."""
    import os

    import jax
    import optax
    import jax.numpy as jnp

    from dig_tpu.train.state import TrainState
    from dig_tpu.utils import checkpoint as ckpt

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    state = TrainState.create({"w": jnp.zeros((2,))}, optax.sgd(0.1))
    path = ckpt.save_checkpoint(str(tmp_path), 5, state, extra={})
    assert path == os.path.join(str(tmp_path), "checkpoint-5")
    assert not os.path.exists(path)

    for name in ["checkpoint-0", "checkpoint-1", "checkpoint-2"]:
        os.makedirs(os.path.join(str(tmp_path), name))
    assert ckpt.prune_checkpoints(str(tmp_path), 1) == []
    assert sorted(os.listdir(tmp_path)) == [
        "checkpoint-0", "checkpoint-1", "checkpoint-2"]


def test_auto_resume_cross_host_guard(tmp_path, monkeypatch):
    """auto_resume fails fast when hosts resolve different latest
    checkpoints (non-shared output_dir) instead of silently diverging."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from dig_tpu.utils import checkpoint as ckpt

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # agreement (both hosts resolved the same — here: no checkpoint at
    # all) proceeds to the normal empty-dir return
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda x: np.stack([x, x]))
    assert ckpt.auto_resume(str(tmp_path), state=object())[1] is None

    # disagreement (rows differ) must raise, naming the local path
    def _diverged(x):
        other = np.asarray(x).copy()
        other[0] ^= 0xFF
        return np.stack([x, other])

    monkeypatch.setattr(multihost_utils, "process_allgather", _diverged)
    import pytest

    with pytest.raises(RuntimeError, match="hosts disagree"):
        ckpt.auto_resume(str(tmp_path), state=object())


def test_step_trace_window(tmp_path):
    """--profile_steps plumbing: the window opens at start, closes after n
    ticks, writes a TensorBoard-viewable trace, and close() is idempotent
    (the atexit hook must not double-stop)."""
    import jax
    import jax.numpy as jnp

    from dig_tpu.utils.profiling import StepTraceWindow

    logdir = str(tmp_path / "profile")
    win = StepTraceWindow(logdir, n=2, start=1)
    f = jax.jit(lambda x: x * 2)
    for _ in range(5):
        f(jnp.ones((4,))).block_until_ready()
        win.tick()
    assert not win.active
    win.close()  # idempotent
    import glob as g

    assert g.glob(os.path.join(logdir, "**", "*.trace.json*"),
                  recursive=True) or g.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)

    # disabled window never starts a trace
    win2 = StepTraceWindow(str(tmp_path / "off"), n=0)
    win2.tick()
    assert not win2.active and not os.path.exists(str(tmp_path / "off"))
