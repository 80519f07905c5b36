"""Multi-host pre-training launcher.

Equivalent of the reference's multi-machine entry point
(run_mae_pretraining_moco_multiMachine.py:542-552, which spawns one
process per GPU with a tcp:// rendezvous).  On TPU pods there is one
process per host; this wrapper initializes `jax.distributed` from the
standard env conventions (COORDINATOR_ADDRESS/RANK/WORLD_SIZE, or OMPI /
SLURM vars) and silences printing on non-zero hosts, then runs the same
training main.

Launch on each host:
    COORDINATOR_ADDRESS=host0:1234 WORLD_SIZE=4 RANK=<host_id> \
        python -m dig_tpu.cli.run_pretrain_multihost --flags...
(on Cloud TPU pods the topology is discovered automatically — no env
vars needed).
"""

from __future__ import annotations

from dig_tpu.config import PretrainConfig, parse_config
from dig_tpu.parallel.dist import init_distributed_mode
from dig_tpu.utils.logging import setup_print_for_distributed


def main(cfg: PretrainConfig):
    info = init_distributed_mode()
    setup_print_for_distributed()
    print(f"multi-host pretrain: rank {info['rank']}/{info['world_size']}, "
          f"{info['local_devices']} local devices", force=True)
    from dig_tpu.cli.run_pretrain import main as pretrain_main

    return pretrain_main(cfg)


if __name__ == "__main__":
    main(parse_config(PretrainConfig))
