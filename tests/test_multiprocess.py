"""Real multi-process distributed training test.

Launches TWO OS processes that rendezvous through
`jax.distributed.initialize` (CPU backend, 2 forced host devices each →
a 4-device global mesh split across processes) and drives the actual
multi-host pre-training CLI end-to-end: per-host loader shards,
`make_array_from_process_local_data` batch assembly, a jitted SPMD step
over the global mesh, rank-0-only checkpointing.

This is the closest a single machine gets to a pod: unlike the 8-CPU
virtual mesh used elsewhere in the suite, `jax.process_count() == 2`
here for real, so every multi-host code path (rank discovery in
dig_tpu/parallel/dist.py, the process-local branch of
dig_tpu/parallel/mesh.py::shard_batch, the host-0 write gate in
utils/checkpoint.py::save_checkpoint) executes rather than being
skipped.  ≙ the reference's multi-machine launcher
run_mae_pretraining_moco_multiMachine.py:542-552, which it could never
test either without N machines.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from dig_tpu.data.lmdb_store import LmdbWriter

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# Gloo's rendezvous KV exchange has a fixed 30 s internal deadline; on a
# loaded 1-CPU box (e.g. the full suite running alongside) the two ranks
# can miss it.  Pure infra flake — retry the whole launch once.
_INFRA_FLAKE = "Gloo context initialization failed"


def _run_two_ranks(boot, cli_args, out):
    for attempt in range(2):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2",
                MASTER_ADDR="127.0.0.1",
                MASTER_PORT=str(port),
                WORLD_SIZE="2",
                RANK=str(rank),
                JAX_COMPILATION_CACHE_DIR="/tmp/jaxcache_cpu_mp",
            )
            env.pop("JAX_NUM_CPU_DEVICES", None)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", boot, *cli_args,
                 "--output_dir", out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        outputs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outputs.append(stdout)
        if (attempt == 0
                and any(p.returncode != 0 for p in procs)
                and any(_INFRA_FLAKE in o for o in outputs)):
            continue
        for rank, p in enumerate(procs):
            assert p.returncode == 0, \
                f"rank {rank} failed:\n{outputs[rank][-4000:]}"
        return outputs


@pytest.fixture(scope="module")
def tiny_lmdb(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("mp") / "lmdb")
    rng = np.random.default_rng(0)
    with LmdbWriter(path) as w:
        for i in range(1, 17):
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            w.put(b"image-%09d" % i, buf.tobytes())
            w.put(b"label-%09d" % i, b"word")
        w.put(b"num-samples", b"16")
    return path


# A site hook pins JAX_PLATFORMS=axon at interpreter startup, so the env
# var alone cannot select the CPU backend — force it in-process via
# jax.config BEFORE jax.distributed.initialize, then run the real CLI
# main (same bootstrap trick as __graft_entry__.dryrun_multichip).
_BOOT = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "from dig_tpu.config import PretrainConfig, parse_config; "
    "from dig_tpu.cli.run_pretrain_multihost import main; "
    "main(parse_config(PretrainConfig))"
)

# The finetune CLI has no separate multihost launcher (one main serves
# both); rendezvous via the same env conventions before calling it.
_BOOT_FT = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "from dig_tpu.parallel.dist import init_distributed_mode; "
    "from dig_tpu.utils.logging import setup_print_for_distributed; "
    "init_distributed_mode(); setup_print_for_distributed(); "
    "from dig_tpu.config import FinetuneConfig, parse_config; "
    "from dig_tpu.cli.run_finetune import main; "
    "main(parse_config(FinetuneConfig))"
)


def test_two_process_pretrain(tiny_lmdb, tmp_path):
    out = str(tmp_path / "out")
    outputs = _run_two_ranks(
        _BOOT,
        ["--model", "pretrain_simmim_moco_ori_vit_micro_patch4_32x128",
         "--image_alone_path", tiny_lmdb,
         "--batch_size", "1",            # per device → global batch 4
         "--epochs", "1",
         "--warmup_steps", "2",
         "--moco_mlp_dim", "32", "--moco_dim", "16",
         "--num_windows", "4", "--num_workers", "0",
         "--save_ckpt_freq", "1", "--eval_freq", "0",
         "--dtype", "float32"],
        out)

    # both ranks saw the 2-process world and the 4-device global mesh
    assert "rank 0/2, 2 local devices" in outputs[0]
    assert "rank 1/2, 2 local devices" in outputs[1]
    assert "devices: 4" in outputs[0]
    # each host shards the dataset: 16 imgs / (2 local batch × 2 hosts)
    assert "4 steps/epoch" in outputs[0]
    # non-zero ranks print nothing after setup_print_for_distributed
    assert "Averaged stats" in outputs[0]
    assert "Averaged stats" not in outputs[1]
    # rank 0 (and only rank 0) wrote the checkpoint
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))
    # training produced a finite loss on the shared global batch: parse
    # the step log's "loss: <cur> (<avg>)" meter, not the config dump
    import re

    losses = re.findall(r"\bloss: ([0-9.]+) \(", outputs[0])
    assert losses, outputs[0][-2000:]
    assert all(np.isfinite(float(x)) for x in losses)


def test_two_process_finetune_with_dist_eval(tiny_lmdb, tmp_path):
    """2-process finetune: covers the host-local pred_ids word-accuracy
    metric in the train loop, shard_batch-assembled eval batches, and
    the --dist_eval cross-host metric reduction (the paths a pretrain
    run never touches)."""
    out = str(tmp_path / "out")
    outputs = _run_two_ranks(
        _BOOT_FT,
        ["--model", "vit_micro_patch4_32x128",
         "--decoder_name", "small_tf_decoder",
         "--data_path", tiny_lmdb,
         "--eval_data_path", tiny_lmdb,
         "--dist_eval",
         "--batch_size", "1",            # per device → global batch 4
         "--epochs", "1",
         "--warmup_epochs", "0", "--num_workers", "0",
         "--save_ckpt_freq", "1", "--eval_freq", "0",
         "--dtype", "float32"],
        out)

    # the logged step metrics include the host-local word accuracy
    assert "class_acc" in outputs[0]
    # dist_eval reduced across hosts: the printed total is the FULL set
    # even though each host decoded only its 8-image shard
    import re

    m = re.search(r"\* \S+: (\d+) images, Acc", outputs[0])
    assert m, outputs[0][-2000:]
    assert int(m.group(1)) == 16
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))
    assert "Averaged stats" not in outputs[1]
