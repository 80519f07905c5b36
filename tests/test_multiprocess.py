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


def _run_n_ranks(n_ranks, boot, cli_args, out, local_devices=2):
    for attempt in range(2):
        port = _free_port()
        procs = []
        for rank in range(n_ranks):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS=("--xla_force_host_platform_device_count="
                           f"{local_devices}"),
                MASTER_ADDR="127.0.0.1",
                MASTER_PORT=str(port),
                WORLD_SIZE=str(n_ranks),
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


def _run_two_ranks(boot, cli_args, out):
    return _run_n_ranks(2, boot, cli_args, out)


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


def test_four_process_preemption_consensus(tiny_lmdb, tmp_path):
    """4-host rendezvous + the preemption consensus at >2 hosts: SIGTERM
    ONE non-zero rank mid-run; `sync_should_stop` must fan the stop out
    to every host at the next poll boundary so the collective save and
    the rank-0 write gate line up (utils/preemption.py:46-76), every
    rank exits 0, a mid-run checkpoint exists, and a fresh 4-process
    launch auto-resumes from it and completes."""
    import signal
    import threading
    import time

    out = str(tmp_path / "out")
    epochs = 40
    args = ["--model", "pretrain_simmim_moco_ori_vit_micro_patch4_32x128",
            "--image_alone_path", tiny_lmdb,
            "--batch_size", "1",            # 1 device/host -> global batch 4
            "--epochs", str(epochs),
            "--warmup_steps", "2",
            "--moco_mlp_dim", "32", "--moco_dim", "16",
            "--num_windows", "4", "--num_workers", "0",
            "--save_ckpt_freq", "1000",     # only preemption/final saves
            "--eval_freq", "0",
            "--dtype", "float32",
            "--output_dir", out]

    def launch():
        port = _free_port()
        procs = []
        for rank in range(4):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
                MASTER_ADDR="127.0.0.1",
                MASTER_PORT=str(port),
                WORLD_SIZE="4",
                RANK=str(rank),
                JAX_COMPILATION_CACHE_DIR="/tmp/jaxcache_cpu_mp",
            )
            env.pop("JAX_NUM_CPU_DEVICES", None)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _BOOT, *args],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        return procs

    for attempt in range(3):
        procs = launch()
        # Drain ranks 1-3 concurrently from the start: an unread stdout
        # pipe fills at 64 KiB and BLOCKS that rank mid-step, which the
        # hardcoded 30 s gloo collective timeout then converts into a
        # fleet-wide crash.  Rank 0 is the only chatty rank (MetricLogger
        # prints are rank-0-gated), so IT is the one we stream for epoch
        # progress and must never leave unread.
        others = {}
        threads = []
        for i in (1, 2, 3):
            t = threading.Thread(
                target=lambda i=i: others.__setitem__(
                    i, procs[i].stdout.read()))
            t.start()
            threads.append(t)
        try:
            # stream rank 0's stdout until training is demonstrably
            # mid-run, then SIGTERM rank 2 ONLY (neither the streamed
            # rank nor the checkpoint-writing rank 0 — the cross-host
            # consensus is what must fan the stop out)
            seen = []
            deadline = time.time() + 900
            while time.time() < deadline:
                line = procs[0].stdout.readline()
                if not line:
                    break
                seen.append(line)
                if "Epoch: [2]" in line:
                    break
            else:
                pytest.fail("rank 0 never reached epoch 2")
            flake = not any("Epoch: [2]" in l for l in seen)
            if flake and attempt < 2:
                # cold-compile rendezvous flake: on a 1-core host the 4
                # ranks' first compiles serialize, the earliest rank's
                # first collective outlives gloo's 30 s window, and the
                # coordination service kills the fleet.  Each attempt
                # leaves the (shared) XLA cache warmer, so retry.
                for p in procs:
                    p.kill()
                for t in threads:
                    t.join(timeout=30)
                continue
            assert not flake, "".join(seen)[-4000:]
            procs[2].send_signal(signal.SIGTERM)
            rest0 = procs[0].stdout.read()
            deadline = time.time() + 1200
            for p in procs:
                p.wait(timeout=max(1.0, deadline - time.time()))
            for t in threads:
                t.join(timeout=30)
        except Exception:
            for p in procs:
                p.kill()
            raise
        outputs = ["".join(seen) + rest0, others[1], others[2], others[3]]
        for rank, p in enumerate(procs):
            assert p.returncode == 0, \
                f"rank {rank} rc={p.returncode}:\n{(outputs[rank] or '')[-4000:]}"
        break

    # the signaled rank announced the catch; rank 0 wrote the consensus
    # checkpoint even though IT never received a signal
    assert "[preemption] caught SIGTERM" in outputs[2]
    assert "[preemption] checkpointed" in outputs[0]
    cks = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert cks, os.listdir(out)
    preempt_epoch = max(int(d.split("-")[1]) for d in cks)
    assert preempt_epoch < epochs - 1  # mid-run, not a completed schedule

    # fresh 4-process launch: auto-resume from the consensus checkpoint
    # and run the remaining epochs to completion
    outputs = _run_n_ranks(4, _BOOT, args[:-2], out, local_devices=1)
    assert f"checkpoint-{epochs - 1}" in os.listdir(out)
    assert "Averaged stats" in outputs[0]
    resumed = [l for l in outputs[0].splitlines() if "resum" in l.lower()]
    assert resumed, outputs[0][-3000:]
