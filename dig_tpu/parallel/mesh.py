"""Device mesh and sharding rules.

The reference's distribution model is NCCL DDP: one process per GPU,
gradient allreduce, explicit `all_gather` for contrastive keys and
DistributedSampler index sharding (SURVEY.md §2.8).  The TPU-native
equivalent is one logical program `jit`-ted over a `jax.sharding.Mesh`:

* axis ``data``  — batch (data parallel); gradient reduction and the
  contrastive all-gather become GSPMD collectives over ICI,
* axis ``fsdp``  — optional parameter sharding (ZeRO-style) for models
  that outgrow one chip; batch is sharded over (data, fsdp) jointly,
* axis ``tensor`` — reserved for tensor parallelism (config choice, not a
  rewrite; the DiG models are small so the default is 1).

Multi-host: call `jax.distributed.initialize()` before building the mesh
(replaces torch.distributed rendezvous, utils/utils.py:375-407).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXES = ("data", "fsdp")


def create_mesh(
    n_data: Optional[int] = None,
    n_fsdp: int = 1,
    n_tensor: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_data is None:
        assert total % (n_fsdp * n_tensor) == 0, (total, n_fsdp, n_tensor)
        n_data = total // (n_fsdp * n_tensor)
    assert n_data * n_fsdp * n_tensor == total, (
        f"mesh {n_data}x{n_fsdp}x{n_tensor} != {total} devices"
    )
    dev_array = np.asarray(devices).reshape(n_data, n_fsdp, n_tensor)
    return Mesh(dev_array, axis_names=("data", "fsdp", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the joint data axes."""
    return NamedSharding(mesh, P(DATA_AXES))


def replicate(mesh: Mesh, tree):
    """Fully replicated sharding for a pytree (params/opt state default)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Place a host-global batch with the leading axis over (data, fsdp)."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def tp_param_shardings(mesh: Mesh, params):
    """Megatron-style tensor-parallel sharding rules for the ViT blocks:
    qkv / MLP-up kernels column-sharded, proj / MLP-down kernels
    row-sharded over the ``tensor`` axis.  GSPMD inserts the activation
    collectives.  Composes with `fsdp_param_shardings` (applied first,
    TP rules override where they match)."""
    n_tp = mesh.shape["tensor"]

    def path_str(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    def rule(path, leaf):
        name = path_str(path)
        if n_tp == 1 or leaf.ndim < 2:
            return NamedSharding(mesh, P())
        col = ("qkv_kernel", "mlp/Dense_0/kernel", "linear_q/kernel",
               "linear_k/kernel", "linear_v/kernel", "w_1/kernel")
        row = ("attn/proj/kernel", "mlp/Dense_1/kernel", "fc/kernel",
               "w_2/kernel")
        if any(name.endswith(c) or c in name for c in col):
            if leaf.shape[-1] % n_tp == 0:
                return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["tensor"])))
        if any(name.endswith(r) or r in name for r in row):
            if leaf.shape[0] % n_tp == 0:
                return NamedSharding(mesh, P(*(["tensor"] + [None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_param_shardings(mesh: Mesh, params, min_size: int = 2**16):
    """ZeRO-3-style rule: shard the largest axis of big >=2-D params over
    the ``fsdp`` axis when divisible; small params stay replicated."""
    n_fsdp = mesh.shape["fsdp"]

    def rule(leaf):
        if n_fsdp == 1 or leaf.ndim < 2 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        axis = int(np.argmax(leaf.shape))
        if leaf.shape[axis] % n_fsdp != 0:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[axis] = "fsdp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, params)
