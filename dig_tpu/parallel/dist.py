"""Multi-host initialization and host-level utilities.

Replaces the reference's NCCL rendezvous stack
(`init_distributed_mode`, utils/utils.py:375-407: env:// / tcp:// /
OMPI / SLURM rank discovery; multi-machine `mp.spawn` variant,
run_mae_pretraining_moco_multiMachine.py:542-552).  On TPU pods there is
exactly one process per host and `jax.distributed.initialize` discovers
the topology from the TPU metadata (or from the same env conventions on
CPU/GPU clusters).
"""

from __future__ import annotations

import os


def init_distributed_mode(coordinator_address: str = None,
                          num_processes: int = None,
                          process_id: int = None) -> dict:
    """Initialize multi-host JAX if a cluster environment is detected.

    Rank-discovery precedence mirrors the reference: explicit args >
    RANK/WORLD_SIZE env > OMPI env > SLURM env > single-process.
    Returns {rank, world_size, local_devices}.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS") or (
            os.environ.get("MASTER_ADDR")
            and f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
        )
    if num_processes is None:
        for var in ("WORLD_SIZE", "OMPI_COMM_WORLD_SIZE", "SLURM_NTASKS"):
            if os.environ.get(var):
                num_processes = int(os.environ[var])
                break
    if process_id is None:
        for var in ("RANK", "OMPI_COMM_WORLD_RANK", "SLURM_PROCID"):
            if os.environ.get(var):
                process_id = int(os.environ[var])
                break

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        print(f"| distributed init: rank {jax.process_index()} of "
              f"{jax.process_count()}", flush=True)
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_device_count(),
    }


def barrier(name: str = "barrier"):
    """Cross-host sync point (≙ dist.barrier(), utils/utils.py:405)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
