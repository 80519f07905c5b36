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
    """Place a host-local batch with the leading axis over (data, fsdp).

    Single process: the host batch IS the global batch — a plain
    `device_put` splits it over local devices.  Multi-process (pods /
    multi-host CPU): each host holds only its loader shard, so the
    global array is assembled from per-process local data
    (`jax.make_array_from_process_local_data`); global batch =
    local batch × process_count (the ShardedSampler gives every host an
    equal-size shard).  Replaces the reference's implicit DDP convention
    where each rank's batch never leaves its GPU (SURVEY.md §2.8).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def host_local_rows(arr):
    """This process's rows of a batch-sharded global array, in the order
    the host's local batch was supplied to `shard_batch`.

    Single process (or a plain numpy input): the whole array.  Multi-
    process: `np.asarray` on the global array would raise "spans
    non-addressable devices", so instead concatenate the addressable
    shards by ascending global batch offset (deduplicating replicas from
    mesh axes the batch is not sharded over, e.g. ``tensor``) — under
    `jax.make_array_from_process_local_data` that reproduces exactly the
    rows this host contributed.  ≙ the reference's per-rank view of its
    own DDP batch."""
    if isinstance(arr, np.ndarray) or jax.process_count() == 1:
        return np.asarray(arr)
    by_offset = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_offset:
            by_offset[start] = s.data
    return np.concatenate(
        [np.asarray(by_offset[k]) for k in sorted(by_offset)])


# Structured tensor-parallel rules: a leaf matches when its key path ENDS
# WITH one of these component tuples (exact dict keys, not substrings).
# Column = output dim sharded (Megatron up-projection); row = input dim
# sharded (down-projection); GSPMD inserts the activation collectives.
TP_COLUMN_RULES = (
    ("attn", "qkv_kernel"),           # ViT fused qkv (models/layers.py:115)
    ("mlp", "Dense_0", "kernel"),     # ViT MLP up
    ("linear_q", "kernel"),           # decoder MHA projections
    ("linear_k", "kernel"),
    ("linear_v", "kernel"),
    ("w_1", "kernel"),                # decoder FFN up
    ("q_kernel",),                    # PatchNet cross-attn (models/moco.py)
    ("k_kernel",),
    ("v_kernel",),
)
TP_ROW_RULES = (
    ("attn", "proj", "kernel"),       # ViT attention output proj
    ("mlp", "Dense_1", "kernel"),     # ViT MLP down
    ("fc", "kernel"),                 # decoder MHA output proj
    ("w_2", "kernel"),                # decoder FFN down
)


def _path_keys(path) -> tuple:
    return tuple(str(getattr(p, "key", p)) for p in path)


def _endswith(keys: tuple, suffix: tuple) -> bool:
    return len(keys) >= len(suffix) and keys[-len(suffix):] == suffix


def tp_param_shardings(mesh: Mesh, params, base=None):
    """Megatron-style tensor-parallel sharding for the transformer blocks,
    driven by structured key-path suffix rules (TP_COLUMN_RULES /
    TP_ROW_RULES) rather than substring matching.  Pass the
    `fsdp_param_shardings` tree as ``base`` to compose the two: leaves with
    no TP opinion inherit the base sharding instead of being replicated
    (without ``base`` they are explicitly replicated).
    tests/test_tp_rules.py enumerates the trees and fails on any
    expected-sharded leaf left replicated."""
    n_tp = mesh.shape["tensor"]

    def rule(path, leaf, fallback):
        keys = _path_keys(path)
        if n_tp == 1 or leaf.ndim < 2:
            return fallback
        if any(_endswith(keys, c) for c in TP_COLUMN_RULES):
            if leaf.shape[-1] % n_tp == 0:
                return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["tensor"])))
        if any(_endswith(keys, r) for r in TP_ROW_RULES):
            if leaf.shape[0] % n_tp == 0:
                return NamedSharding(mesh, P(*(["tensor"] + [None] * (leaf.ndim - 1))))
        return fallback

    if base is None:
        replicated = NamedSharding(mesh, P())
        return jax.tree_util.tree_map_with_path(
            lambda p, l: rule(p, l, replicated), params)
    return jax.tree_util.tree_map_with_path(rule, params, base)


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
