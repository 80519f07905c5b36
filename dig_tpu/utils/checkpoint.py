"""Checkpointing: native npz save/restore with the reference's
auto-resume semantics, plus a converter for the reference's PyTorch
checkpoints.  (The format is a flat ``arrays.npz`` + ``meta.json``
commit marker per ``checkpoint-{tag}`` directory — measured ~100x
faster than Orbax over the remote-tunnel TPU runtime; `load_checkpoint`
still reads Orbax directories written by older runs.)

Parity targets (reference: utils/utils.py:546-669):

* `save_model` writes {model, optimizer, epoch, scaler, args} to
  ``checkpoint-{epoch}.pth`` every `save_ckpt_freq` epochs and mid-epoch;
  here each checkpoint is a directory ``checkpoint-{tag}``,
* `auto_load_model` scans the output dir for the highest
  ``checkpoint-N`` and restores model+optimizer+epoch, tolerating
  missing/corrupt checkpoints,
* `--finetune` loading does key surgery (strip ``backbone.``/``encoder.``
  prefixes) and positional-embedding re-interpolation
  (run_class_finetuning.py:362-441) — `load_torch_checkpoint` +
  `convert_torch_params` reproduce this for the published DiG weights.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def fast_device_get(tree):
    """Fetch a pytree from device with ONE transfer per dtype group.

    Naive `jax.device_get` issues one round trip per leaf, which is
    pathological over remote-tunnel TPU runtimes (measured 37 s for a
    10M-param train state vs <1 s batched).  Leaves are raveled,
    concatenated by dtype on device, fetched, and split on host."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    groups = {}
    for i, leaf in enumerate(leaves):
        # only device arrays need fetching; host numpy (e.g. leaves already
        # gathered by _gather_across_hosts) would be re-uploaded just to
        # come back down
        if not isinstance(leaf, jax.Array):
            continue
        groups.setdefault(jnp.dtype(leaf.dtype).name, []).append(i)
    host = list(leaves)
    for dtype_name, idxs in groups.items():
        flat = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
        arr = np.asarray(jax.device_get(flat))
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            host[i] = arr[off : off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, host)


def _is_remote(path: str) -> bool:
    """Remote checkpoint URI (``gs://…``, ``s3://…``, ``memory://…`` in
    tests).  The reference's equivalent is the moxing S3 shim
    (utils/utils.py:367-372); here remote IO routes through fsspec."""
    return "://" in path


def _fs_open(path: str, mode: str):
    if _is_remote(path):
        import fsspec

        return fsspec.open(path, mode).open()
    return open(path, mode)


def _join(base: str, *parts: str) -> str:
    if _is_remote(base):
        return "/".join([base.rstrip("/"), *parts])
    return os.path.join(base, *parts)


def _save_tree_npz(path: str, tree):
    """One-file checkpoint: leaves in a single .npz + pickled treedef."""
    import pickle

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if _is_remote(path):
        with _fs_open(_join(path, "arrays.npz"), "wb") as f:
            np.savez(f, **arrays)
    else:
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, "tmp_arrays.npz")  # np.savez appends .npz itself
        np.savez(tmp, **arrays)
        os.replace(tmp, os.path.join(path, "arrays.npz"))
    with _fs_open(_join(path, "treedef.pkl"), "wb") as f:
        pickle.dump(treedef, f)


def _load_tree_npz(path: str):
    import pickle

    with _fs_open(_join(path, "treedef.pkl"), "rb") as f:
        treedef = pickle.load(f)
    with _fs_open(_join(path, "arrays.npz"), "rb") as fh:
        with np.load(fh, allow_pickle=True) as z:
            leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    leaves = [x[()] if x.shape == () and x.dtype == object else x for x in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _gather_across_hosts(tree):
    """Replace leaves whose shards span processes with their full global
    value (one replicating collective for all such leaves).

    COLLECTIVE: every process must call this before any rank gate — when
    the train state is sharded over a mesh axis that spans hosts
    (``--n_fsdp`` on pods), host 0 alone cannot read non-addressable
    shards.  Fully-replicated and host-local leaves pass through (their
    value is readable from local shards without a collective)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idxs = [i for i, x in enumerate(leaves)
            if isinstance(x, jax.Array)
            and not x.is_fully_addressable and not x.is_fully_replicated]
    if idxs:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            [leaves[i] for i in idxs])
        for i, g in zip(idxs, gathered):
            leaves[i] = np.asarray(g)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(output_dir: str, tag, state, extra: Optional[dict] = None):
    """Write ``{output_dir}/checkpoint-{tag}``.

    Uses the framework's fast native format (single batched device fetch,
    single .npz) — measured ~100x faster than per-array checkpointing
    through a remote TPU tunnel.  `output_dir` may be a remote URI
    (``gs://bucket/run`` on pods); files then go through fsspec.

    Multi-process: COLLECTIVE — every host must call it (cross-host-
    sharded leaves are gathered first), then only host 0 writes
    (concurrent writers to a shared filesystem would race — ≙ the
    reference's `utils.save_model` rank gate, utils/utils.py:479-490)."""
    import json

    import jax

    if _is_remote(output_dir):
        path = _join(output_dir, f"checkpoint-{tag}")
    else:
        path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{tag}"))
    trees = {"params": state.params, "opt_state": state.opt_state}
    if state.ema_params is not None:
        trees["ema_params"] = state.ema_params
    if jax.process_count() > 1:
        trees = _gather_across_hosts(trees)
        if jax.process_index() != 0:
            return path
    payload = {k: fast_device_get(v) for k, v in trees.items()}
    _save_tree_npz(path, payload)
    meta = {"step": int(state.step)}
    if extra:
        meta["extra"] = extra
    # meta.json is the commit marker (checked by numeric_checkpoints):
    # written last, and atomically for local paths, so a checkpoint is
    # either complete or invisible to auto-resume
    if _is_remote(path):
        with _fs_open(_join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    else:
        tmp = os.path.join(path, "tmp_meta.json")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
    return path


def restore_checkpoint(path: str):
    """Load a checkpoint dir (native format, or orbax for older dirs).
    `path` may be a remote URI (fsspec)."""
    import json

    if _is_remote(path):
        payload = _load_tree_npz(path)
        with _fs_open(_join(path, "meta.json"), "r") as f:
            meta = json.load(f)
        payload["step"] = meta["step"]
        if "extra" in meta:
            payload["extra"] = meta["extra"]
        return payload
    path = os.path.abspath(path)
    if os.path.exists(os.path.join(path, "arrays.npz")):
        payload = _load_tree_npz(path)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        payload["step"] = meta["step"]
        if "extra" in meta:
            payload["extra"] = meta["extra"]
        return payload
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def _list_dir_names(output_dir: str) -> Optional[list]:
    """Entry names directly under `output_dir` (local or fsspec remote);
    None when the directory does not exist."""
    if _is_remote(output_dir):
        import fsspec

        fs, root = fsspec.core.url_to_fs(output_dir)
        try:
            return [p.rstrip("/").rsplit("/", 1)[-1]
                    for p in fs.ls(root, detail=False)]
        except FileNotFoundError:
            return None
    if os.path.isdir(output_dir):
        return os.listdir(output_dir)
    return None


def _has_meta(path: str) -> bool:
    """meta.json is written LAST by save_checkpoint, so its presence is
    the checkpoint's commit marker: a save killed mid-write (preemption
    second-signal force-kill, relay outage) leaves a dir without it, and
    such partial checkpoints must never shadow older intact ones."""
    if _is_remote(path):
        import fsspec

        fs, root = fsspec.core.url_to_fs(path)
        return fs.exists(f"{root}/meta.json")
    return os.path.exists(os.path.join(path, "meta.json"))


def numeric_checkpoints(output_dir: str) -> list:
    """Complete (meta.json-bearing) ``checkpoint-N`` paths, newest first."""
    names = _list_dir_names(output_dir)
    if names is None:
        return []
    numbered = sorted(
        ((int(m.group(1)), n) for n in names
         if (m := re.fullmatch(r"checkpoint-(\d+)", n))),
        reverse=True,
    )
    return [_join(output_dir, n) for _, n in numbered
            if _has_meta(_join(output_dir, n))]


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Highest-numbered COMPLETE ``checkpoint-N`` dir (reference regex
    scan, utils/utils.py:592-601, plus the meta.json commit-marker
    filter).  Remote URIs are listed through fsspec."""
    paths = numeric_checkpoints(output_dir)
    return paths[0] if paths else None


def prune_checkpoints(output_dir: str, keep: int):
    """Delete the oldest numeric ``checkpoint-N`` dirs beyond the newest
    `keep` (0/negative = keep all, the reference behavior — it never
    deletes).  Non-numeric tags (``checkpoint-best``, mid-epoch
    ``checkpoint-3_100``) are never touched.  Remote URIs pruned through
    fsspec.  Multi-process: host 0 only (same gate as save_checkpoint —
    all hosts racing to delete the same dirs on shared storage)."""
    import jax

    if keep <= 0:
        return []
    if jax.process_count() > 1 and jax.process_index() != 0:
        return []
    names = _list_dir_names(output_dir)
    if names is None:
        return []
    if _is_remote(output_dir):
        import fsspec

        fs, root = fsspec.core.url_to_fs(output_dir)

        def rm(name):
            try:
                fs.rm(f"{root}/{name}", recursive=True)
            except FileNotFoundError:
                pass
    else:
        import shutil

        rm = lambda name: shutil.rmtree(  # noqa: E731
            os.path.join(output_dir, name), ignore_errors=True)
    numbered = sorted(
        (int(m.group(1)), n) for n in names
        if (m := re.fullmatch(r"checkpoint-(\d+)", n))
    )
    pruned = []
    for _, name in numbered[:-keep] if keep < len(numbered) else []:
        rm(name)
        pruned.append(name)
    return pruned


def auto_resume(output_dir: str, state):
    """Restore the newest restorable checkpoint into `state`; returns
    (state, start_epoch_extra_dict).  Falls back to older checkpoints
    when the newest is corrupt instead of silently starting fresh.

    Multi-process: every host scans `output_dir` itself, which is only
    consistent on shared storage (gs://, NFS — the reference makes the
    same assumption, utils/utils.py:581-651).  A cross-host check fails
    fast when hosts resolve different listings, and each candidate is
    adopted only by unanimous restore success — silently diverging
    (one host resumes epoch N, another starts fresh) would deadlock the
    first collective or corrupt training."""
    candidates = numeric_checkpoints(output_dir)
    multi = jax.process_count() > 1
    if multi:
        import hashlib

        from jax.experimental import multihost_utils

        digest = hashlib.sha256("|".join(candidates).encode()).digest()
        tags = np.asarray(multihost_utils.process_allgather(
            np.frombuffer(digest, dtype=np.uint8)))
        if len({row.tobytes() for row in tags.reshape(-1, len(digest))}) != 1:
            raise RuntimeError(
                f"auto-resume: hosts disagree on the checkpoint listing "
                f"(this host resolved {candidates!r}) — output_dir must "
                f"be shared storage (gs://...) on multi-host runs")
    # newest first, falling back past corrupt checkpoints (a save killed
    # mid-write must not cost the run everything older).  Multi-process:
    # hosts stay in lockstep — a candidate is used only when EVERY host
    # restored it; one host silently starting fresh while others resume
    # would deadlock the first collective or diverge training.
    for path in candidates:
        try:
            payload = restore_checkpoint(path)
            ok = True
        except Exception as e:  # tolerate partial checkpoints like the reference
            print(f"auto-resume failed for {path}: {e}")
            payload, ok = None, False
        if multi:
            from jax.experimental import multihost_utils

            all_ok = np.asarray(multihost_utils.process_allgather(
                np.asarray([ok], np.int32)))
            if not all_ok.all():
                if ok:
                    print(f"auto-resume: skipping {path} — another host "
                          f"failed to restore it")
                continue
        elif not ok:
            continue
        import jax.numpy as jnp

        state = state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            step=jnp.asarray(payload["step"], jnp.int32),
            ema_params=payload.get("ema_params", state.ema_params),
        )
        print(f"auto-resumed from {path}")
        return state, payload.get("extra")
    return state, None


# ---------------------------------------------------------------------------
# PyTorch checkpoint conversion (published DiG weights -> dig_tpu trees)
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str, model_key: str = "model|module") -> dict:
    """Load a reference .pth checkpoint to numpy (CPU torch required).
    `model_key` is the reference's ``--model_key`` '|'-separated candidate
    list (run_class_finetuning.py:372-377); ``state_dict`` is always tried
    as a final fallback."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in list(model_key.split("|")) + ["state_dict"]:
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}


def _set(tree: dict, path: list, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_encoder(state_dict: dict, prefix: str = "encoder.") -> dict:
    """Map the reference ViT encoder's torch tensors onto the dig_tpu
    Flax tree (patch_embed conv -> dense kernel, fused qkv, per-block
    norms/mlp).  Key layout follows modeling_finetune.py /
    modeling_pretrain_vit.py.

    Prefix surgery mirrors run_class_finetuning.py:388-396: the requested
    prefix is tried first, then the reference's ``backbone.`` remap, then
    bare keys."""
    out: dict = {}
    sd = dict(state_dict)
    for pfx in (prefix, "backbone.", "encoder."):
        stripped = {
            k[len(pfx):]: v for k, v in state_dict.items() if k.startswith(pfx)
        }
        if stripped:
            sd = stripped
            break
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "patch_embed.proj.weight":
            # conv [D, C, p, p] -> dense [p*p*C, D] matching our reshape
            d, c, p1, p2 = v.shape
            kernel = v.transpose(2, 3, 1, 0).reshape(p1 * p2 * c, d)
            _set(out, ["patch_embed", "proj", "kernel"], kernel)
        elif k == "patch_embed.proj.bias":
            _set(out, ["patch_embed", "proj", "bias"], v)
        elif k == "mask_token":
            _set(out, ["mask_token"], v.reshape(1, 1, -1))
        elif k == "pos_embed":
            _set(out, ["pos_embed"], v)
        elif m := re.fullmatch(r"blocks\.(\d+)\.(.+)", k):
            i, rest = m.group(1), m.group(2)
            blk = f"blocks_{i}"
            if rest == "attn.qkv.weight":
                _set(out, [blk, "attn", "qkv_kernel"], v.T)
            elif rest == "attn.q_bias":
                _set(out, [blk, "attn", "q_bias"], v)
            elif rest == "attn.v_bias":
                _set(out, [blk, "attn", "v_bias"], v)
            elif rest == "attn.proj.weight":
                _set(out, [blk, "attn", "proj", "kernel"], v.T)
            elif rest == "attn.proj.bias":
                _set(out, [blk, "attn", "proj", "bias"], v)
            elif rest in ("norm1.weight", "norm2.weight"):
                _set(out, [blk, rest.split(".")[0], "scale"], v)
            elif rest in ("norm1.bias", "norm2.bias"):
                _set(out, [blk, rest.split(".")[0], "bias"], v)
            elif rest == "mlp.fc1.weight":
                _set(out, [blk, "mlp", "Dense_0", "kernel"], v.T)
            elif rest == "mlp.fc1.bias":
                _set(out, [blk, "mlp", "Dense_0", "bias"], v)
            elif rest == "mlp.fc2.weight":
                _set(out, [blk, "mlp", "Dense_1", "kernel"], v.T)
            elif rest == "mlp.fc2.bias":
                _set(out, [blk, "mlp", "Dense_1", "bias"], v)
            elif rest in ("gamma_1", "gamma_2"):
                _set(out, [blk, rest], v)
        elif k == "norm.weight":
            _set(out, ["norm", "scale"], v)
        elif k == "norm.bias":
            _set(out, ["norm", "bias"], v)
        elif k == "fc_norm.weight":
            _set(out, ["fc_norm", "scale"], v)
        elif k == "fc_norm.bias":
            _set(out, ["fc_norm", "bias"], v)
    return out


def _convert_torch_mha(keys: dict) -> dict:
    """Torch `MultiHeadAttention` / `TextConditionalMultiHeadAttention`
    tensors (models/transformer_layer.py:204-281, :284-383) -> the Flax
    `DecoderMHA` / `TextConditionalMHA` tree.  `keys` maps the suffix
    after ``self_attn.`` / ``enc_attn.`` to numpy arrays."""
    out: dict = {}
    for k, v in keys.items():
        v = np.asarray(v)
        mod, _, leaf = k.rpartition(".")
        if mod in ("linear_q", "linear_k", "linear_v", "fc",
                   "gamma_decode", "vis_proj"):
            _set(out, [mod, "kernel" if leaf == "weight" else "bias"],
                 v.T if leaf == "weight" else v)
        elif mod in ("vis_norm", "vis_cond_norm"):
            _set(out, [mod, "scale" if leaf == "weight" else "bias"], v)
    return out


def convert_torch_decoder(state_dict: dict, prefix: str = "decoder.") -> dict:
    """Map the reference text decoder's torch tensors onto the dig_tpu
    Flax tree (TFDecoder / DecoupledTFDecoder; reference layout:
    models/decoder.py:107-370 + models/transformer_layer.py:47-201).

    Handles: char embedding, per-layer norms + self/enc attention + FFN,
    final layer norm, classifier; the decoupled extras (`order_enc`,
    per-layer `mlp_order2cls_attn` -> `order2cls_{i}` and `new_linear_v`
    -> `new_linear_v_{i}`); text-conditional cross-attention extras.  The
    `position_enc.position_table` sinusoid buffer is skipped (recomputed
    here)."""
    out: dict = {}
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)} if prefix else dict(state_dict)
    mha: dict = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "trg_word_emb.weight":
            _set(out, ["trg_word_emb", "embedding"], v)
        elif k == "order_enc.weight":
            _set(out, ["order_enc", "embedding"], v)
        elif k == "layer_norm.weight":
            _set(out, ["layer_norm", "scale"], v)
        elif k == "layer_norm.bias":
            _set(out, ["layer_norm", "bias"], v)
        elif k == "classifier.weight":
            _set(out, ["classifier", "kernel"], v.T)
        elif k == "classifier.bias":
            _set(out, ["classifier", "bias"], v)
        elif m := re.fullmatch(r"layer_stack\.(\d+)\.(.+)", k):
            i, rest = m.group(1), m.group(2)
            blk = f"layers_{i}"
            if m2 := re.fullmatch(r"(self_attn|enc_attn)\.(.+)", rest):
                mha.setdefault((blk, m2.group(1)), {})[m2.group(2)] = v
            elif m2 := re.fullmatch(r"(norm[123])\.(weight|bias)", rest):
                _set(out, [blk, m2.group(1),
                           "scale" if m2.group(2) == "weight" else "bias"], v)
            elif m2 := re.fullmatch(r"mlp\.(w_[12])\.(weight|bias)", rest):
                _set(out, [blk, "mlp", m2.group(1),
                           "kernel" if m2.group(2) == "weight" else "bias"],
                     v.T if m2.group(2) == "weight" else v)
            # decoupled-layer extras live at the DECODER level here
            # (reference: models/transformer_layer.py:157-165)
            elif m2 := re.fullmatch(r"mlp_order2cls_attn\.([03])\.(weight|bias)",
                                    rest):
                dense = "Dense_0" if m2.group(1) == "0" else "Dense_1"
                _set(out, [f"order2cls_{i}", dense,
                           "kernel" if m2.group(2) == "weight" else "bias"],
                     v.T if m2.group(2) == "weight" else v)
            elif m2 := re.fullmatch(r"new_linear_v\.(weight|bias)", rest):
                _set(out, [f"new_linear_v_{i}",
                           "kernel" if m2.group(1) == "weight" else "bias"],
                     v.T if m2.group(1) == "weight" else v)
    for (blk, attn), keys in mha.items():
        _set(out, [blk, attn], _convert_torch_mha(keys))
    return out


def convert_torch_attn_head(state_dict: dict, prefix: str = "decoder.") -> dict:
    """Map the reference GRU additive-attention head onto the Flax
    `AttentionRecognitionHead` tree (reference: models/attn_decoder.py —
    `AttentionRecognitionHead.decoder` = `DecoderUnit` holding
    `attention_unit.{sEmbed,xEmbed,wEmbed}`, `tgt_embedding`, a 1-layer
    `nn.GRU`, and `fc`).

    GRU math is identical between torch and flax up to bias placement:
    torch keeps separate input/hidden biases per gate while flax merges
    them for r/z (`ir.bias = b_ir + b_hr`) and keeps both for n (where the
    reset gate multiplies the hidden bias)."""
    out: dict = {}
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)} if prefix else \
         {k: np.asarray(v) for k, v in state_dict.items()}
    lin = {"decoder.attention_unit.sEmbed": "s_embed",
           "decoder.attention_unit.xEmbed": "x_embed",
           "decoder.attention_unit.wEmbed": "w_embed",
           "decoder.fc": "fc"}
    for src, dst in lin.items():
        if src + ".weight" in sd:
            _set(out, [dst, "kernel"], sd[src + ".weight"].T)
            _set(out, [dst, "bias"], sd[src + ".bias"])
    if "decoder.tgt_embedding.weight" in sd:
        _set(out, ["tgt_embedding", "embedding"], sd["decoder.tgt_embedding.weight"])
    if "decoder.gru.weight_ih_l0" in sd:
        w_ih = sd["decoder.gru.weight_ih_l0"]  # [3H, in] gates (r, z, n)
        w_hh = sd["decoder.gru.weight_hh_l0"]
        b_ih = sd["decoder.gru.bias_ih_l0"]
        b_hh = sd["decoder.gru.bias_hh_l0"]
        h = w_hh.shape[1]
        for i, gate in enumerate(("r", "z", "n")):
            sl = slice(i * h, (i + 1) * h)
            _set(out, ["gru", "i" + gate, "kernel"], w_ih[sl].T)
            _set(out, ["gru", "h" + gate, "kernel"], w_hh[sl].T)
            if gate == "n":
                _set(out, ["gru", "in", "bias"], b_ih[sl])
                _set(out, ["gru", "hn", "bias"], b_hh[sl])
            else:
                _set(out, ["gru", "i" + gate, "bias"], b_ih[sl] + b_hh[sl])
    return out


def convert_torch_recognizer(state_dict: dict) -> dict:
    """Full-recognizer conversion: a reference *finetuned* checkpoint
    carries `encoder.*`, `linear_norm.*` (Sequential Linear+LayerNorm,
    models/model_builder.py:85-88) and `decoder.*` — the reference's
    surgery loads the whole dict (run_class_finetuning.py:362-441).
    Returns a tree with ``encoder`` / ``linear_norm`` / ``decoder``
    top-level keys ready to graft onto RecModel params."""
    out: dict = {"encoder": convert_torch_encoder(state_dict, prefix="encoder.")}
    ln = {}
    for k, v in state_dict.items():
        v = np.asarray(v)
        if k == "linear_norm.0.weight":
            _set(ln, ["dense", "kernel"], v.T)
        elif k == "linear_norm.0.bias":
            _set(ln, ["dense", "bias"], v)
        elif k == "linear_norm.1.weight":
            _set(ln, ["norm", "scale"], v)
        elif k == "linear_norm.1.bias":
            _set(ln, ["norm", "bias"], v)
    if ln:
        out["linear_norm"] = ln
    if any(k.startswith("decoder.decoder.gru.") for k in state_dict):
        dec = convert_torch_attn_head(state_dict, prefix="decoder.")
    else:
        dec = convert_torch_decoder(state_dict, prefix="decoder.")
    if dec:
        out["decoder"] = dec
    return out


def _strip_prefix(state_dict: dict, prefix: str) -> dict:
    return {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
            if k.startswith(prefix)}


def _convert_mlp_head(sd: dict) -> dict:
    """Torch `_build_mlp` Sequential (modeling_pretrain_moco_mim_ori.py:463-482:
    per layer l the Linear sits at index 3l and its BatchNorm1d at 3l+1)
    -> the Flax `MLPHead` tree (dense_l / bn_l).  BN running stats are
    skipped: the SSL graph only ever normalizes with batch statistics
    (SyncBN semantics), which is what `BatchStatsNorm` computes."""
    out: dict = {}
    for k, v in sd.items():
        m = re.fullmatch(r"(\d+)\.(weight|bias)", k)
        if not m:
            continue  # running_mean / running_var / num_batches_tracked
        idx, leaf = int(m.group(1)), m.group(2)
        layer, role = divmod(idx, 3)
        if role == 0:
            _set(out, [f"dense_{layer}", "kernel" if leaf == "weight" else "bias"],
                 v.T if leaf == "weight" else v)
        elif role == 1:
            _set(out, [f"bn_{layer}", "scale" if leaf == "weight" else "bias"], v)
    return out


def _convert_cross_patchnet(sd: dict) -> dict:
    """Torch `PatchNet` with the 2 cross-attention Blocks
    (modeling_pretrain_moco_mim_ori.py:137-205; Block/Attention :21-135,
    separate linear_q/k/v with the q/v-bias trick) -> Flax `PatchNet`
    (CrossBlock params q_kernel/k_kernel/v_kernel/...)."""
    out: dict = {}
    for k, v in sd.items():
        if k in ("norm.weight", "norm.bias"):
            _set(out, ["norm", "scale" if k.endswith("weight") else "bias"], v)
        elif m := re.fullmatch(r"blocks\.(\d+)\.(.+)", k):
            blk, rest = f"blocks_{m.group(1)}", m.group(2)
            if m2 := re.fullmatch(r"attn\.linear_([qkv])\.weight", rest):
                _set(out, [blk, f"{m2.group(1)}_kernel"], v.T)
            elif m2 := re.fullmatch(r"attn\.([qv])_bias", rest):
                _set(out, [blk, f"{m2.group(1)}_bias"], v)
            elif rest == "attn.k_bias":
                pass  # frozen at zero in the reference; not a Flax param
            elif rest in ("attn.proj.weight", "attn.proj.bias"):
                _set(out, [blk, "proj",
                           "kernel" if rest.endswith("weight") else "bias"],
                     v.T if rest.endswith("weight") else v)
            elif m2 := re.fullmatch(r"(norm[12])\.(weight|bias)", rest):
                _set(out, [blk, m2.group(1),
                           "scale" if m2.group(2) == "weight" else "bias"], v)
            elif m2 := re.fullmatch(r"mlp\.fc([12])\.(weight|bias)", rest):
                dense = f"Dense_{int(m2.group(1)) - 1}"
                _set(out, [blk, "mlp", dense,
                           "kernel" if m2.group(2) == "weight" else "bias"],
                     v.T if m2.group(2) == "weight" else v)
    return out


def _convert_conv_patchnet(sd: dict) -> dict:
    """Torch `ConvPatchNet` (modeling_pretrain_moco_mim_ori.py:207-258:
    conv_layers Sequential with conv3x3 blocks at indices 0/2/4/6, MaxPools
    between; patches2global Linear/BN/ReLU/Linear/BN) -> Flax
    `ConvPatchNet` (c0..c3 conv/bn, p2g_dense0/p2g_bn0/p2g_dense1)."""
    out: dict = {}
    conv_block = {0: "c0", 2: "c1", 4: "c2", 6: "c3"}
    for k, v in sd.items():
        if m := re.fullmatch(r"conv_layers\.(\d+)\.([01])\.(weight|bias)", k):
            name = conv_block[int(m.group(1))]
            if m.group(2) == "0":  # conv [out, in, 3, 3] -> [3, 3, in, out]
                _set(out, [f"{name}_conv",
                           "kernel" if m.group(3) == "weight" else "bias"],
                     v.transpose(2, 3, 1, 0) if m.group(3) == "weight" else v)
            else:  # BatchNorm2d affine
                _set(out, [f"{name}_bn",
                           "scale" if m.group(3) == "weight" else "bias"], v)
        elif m := re.fullmatch(r"patches2global\.([013])\.(weight|bias)", k):
            idx, leaf = m.group(1), m.group(2)
            if idx == "0":
                _set(out, ["p2g_dense0", "kernel" if leaf == "weight" else "bias"],
                     v.T if leaf == "weight" else v)
            elif idx == "1":
                _set(out, ["p2g_bn0", "scale" if leaf == "weight" else "bias"], v)
            else:
                _set(out, ["p2g_dense1", "kernel" if leaf == "weight" else "bias"],
                     v.T if leaf == "weight" else v)
    return out


def _convert_pix_decoder(sd: dict) -> dict:
    """Torch `pix_decoder` Sequential (Linear/Linear/LN/GELU/Linear;
    modeling_pretrain_moco_mim_ori.py:422-426) -> Flax `PixDecoder`."""
    out: dict = {}
    names = {"0": ("fc0", True), "1": ("fc1", True), "4": ("head", True)}
    for k, v in sd.items():
        m = re.fullmatch(r"([0124])\.(weight|bias)", k)
        if not m:
            continue
        idx, leaf = m.group(1), m.group(2)
        if idx == "2":
            _set(out, ["norm", "scale" if leaf == "weight" else "bias"], v)
        else:
            name, transpose = names[idx]
            _set(out, [name, "kernel" if leaf == "weight" else "bias"],
                 v.T if (leaf == "weight" and transpose) else v)
    return out


def convert_torch_moco(state_dict: dict) -> dict:
    """Full `MoCo_ViT` conversion (reference:
    modeling_pretrain_moco_mim_ori.py:261-577) -> ``{"student": tree,
    "ema": tree}`` matching `DiGPretrainModel`'s param layout and its EMA
    parameter tree (keys encoder / projection / predictor /
    patch_extractor / pix_projector / pix_decoder; the momentum branch
    maps the `momentum_*` / `pix_projector_m` modules).  The sinusoid
    pos_embed is recomputed, BN running stats are dropped (batch-stats
    normalization ≙ train-mode SyncBN)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def patchnet(prefix):
        sub = _strip_prefix(sd, prefix)
        if any(k.startswith("blocks.") for k in sub):
            return _convert_cross_patchnet(sub)
        if any(k.startswith("conv_layers.") for k in sub):
            return _convert_conv_patchnet(sub)
        return {}  # no_patchtrans: the extractor is parameter-free

    student: dict = {"encoder": convert_torch_encoder(sd, prefix="encoder.")}
    ema: dict = {}
    if any(k.startswith("momentum_encoder.") for k in sd):
        ema["encoder"] = convert_torch_encoder(sd, prefix="momentum_encoder.")
    for src, dst, tree in (
        ("encoder_projection_layer.", "projection", student),
        ("momentum_projection_layer.", "projection", ema),
        ("predictor.", "predictor", student),
        ("pix_projector.", "pix_projector", student),
        ("pix_projector_m.", "pix_projector", ema),
    ):
        sub = _strip_prefix(sd, src)
        if sub:
            tree[dst] = _convert_mlp_head(sub)
    for src, tree in (("patch_extractor.", student),
                      ("momentum_patch_extractor.", ema)):
        converted = patchnet(src)
        if converted:
            tree["patch_extractor"] = converted
    pix = _strip_prefix(sd, "pix_decoder.")
    if pix:
        student["pix_decoder"] = _convert_pix_decoder(pix)
    return {"student": student, "ema": ema}


def has_decoder_keys(state_dict: dict) -> bool:
    """True when a torch state dict carries full-RECOGNIZER decoder
    tensors: the transformer decoder's layer stack / char embedding
    (models/decoder.py:152-176) or the GRU head's DecoderUnit
    (models/attn_decoder.py:203-279).  A bare `decoder.*` prefix is NOT
    enough — SSL pretrain checkpoints carry a SimMIM *pixel* decoder
    under the same name and must keep routing through the encoder-only
    converter (with `--model_prefix` honored)."""
    return any(k.startswith(("decoder.layer_stack.", "decoder.trg_word_emb.",
                             "decoder.decoder."))
               for k in state_dict)


def interpolate_pos_embed(pos, new_grid, old_grid=None,
                          num_extra_tokens: int = 0):
    """Bicubic re-interpolation of a learnable positional embedding on
    input-resolution change (reference: run_class_finetuning.py:403-424).

    `pos` is [1, extra + gh*gw, D].  The reference assumes a SQUARE patch
    grid (``orig_size = sqrt(n)``), which is wrong for DiG's 8x32 grid;
    here the true 2-D grid is used — `old_grid` is inferred by preserving
    the target aspect ratio, falling back to square."""
    import jax.numpy as jnp

    pos = np.asarray(pos)
    d = pos.shape[-1]
    extra = pos[:, :num_extra_tokens]
    tok = pos[:, num_extra_tokens:]
    n_old = tok.shape[1]
    if old_grid is None:
        ratio = new_grid[0] / new_grid[1]
        h = int(round((n_old * ratio) ** 0.5)) or 1
        old_grid = (h, n_old // h)
        if old_grid[0] * old_grid[1] != n_old:
            s = int(round(n_old ** 0.5))
            assert s * s == n_old, (
                f"cannot infer a {new_grid[0]}:{new_grid[1]} grid from "
                f"{n_old} position tokens")
            old_grid = (s, s)
    print(f"Position interpolate from {old_grid[0]}x{old_grid[1]} "
          f"to {new_grid[0]}x{new_grid[1]}")
    grid_pos = jnp.asarray(tok, jnp.float32).reshape(1, *old_grid, d)
    out = jax.image.resize(grid_pos, (1, *new_grid, d), method="cubic")
    out = np.asarray(out).reshape(1, new_grid[0] * new_grid[1], d)
    return np.concatenate([extra, out], axis=1) if num_extra_tokens else out


def _fit_pos_embed(src, dst, grid):
    """Re-interpolate a source pos_embed onto the destination's grid.

    Extra (non-grid) token counts are derived PER SIDE: the destination's
    from its own shape, the source's by checking which split of its tokens
    yields an inferable grid (same-extra first, then zero-extra).  When the
    source has no extra tokens but the destination does, the destination's
    own extra rows are kept and only the grid rows are replaced — the
    round-2 code sliced the source with the destination's count, silently
    corrupting the embedding in that case."""
    n_grid = grid[0] * grid[1]
    extra_dst = np.shape(dst)[1] - n_grid
    for extra_src in dict.fromkeys((max(extra_dst, 0), 0)):
        if np.shape(src)[1] - extra_src <= 0:
            continue
        try:
            fitted = interpolate_pos_embed(src, grid,
                                           num_extra_tokens=extra_src)
        except AssertionError:
            continue
        if extra_src < extra_dst:
            # keep the destination's own extra-token rows (e.g. seq-cls
            # query tokens absent from a plain-encoder source)
            fitted = np.concatenate(
                [np.asarray(dst)[:, : extra_dst - extra_src], fitted], axis=1)
        return fitted
    return None


def merge_pretrained_encoder(params: dict, encoder_tree: dict,
                             dest: str = "encoder",
                             pos_embed_grid=None) -> dict:
    """Graft a converted encoder tree into a model's params (checkpoint
    surgery; run_class_finetuning.py:362-441).  A shape-mismatched
    ``pos_embed`` is bicubically re-interpolated onto `pos_embed_grid`
    (the target (gh, gw)) like the reference (:403-424); other
    shape-mismatched leaves are skipped with a note."""
    return merge_pretrained_tree(params, {dest: encoder_tree},
                                 pos_embed_grid=pos_embed_grid)


def merge_pretrained_tree(params: dict, tree: dict,
                          pos_embed_grid=None) -> dict:
    """Graft a converted param tree (any subset of the model's top-level
    modules — e.g. `convert_torch_recognizer` output with encoder +
    linear_norm + decoder) onto `params` at the root.  Same surgery rules
    as `merge_pretrained_encoder`."""
    import copy

    params = copy.deepcopy(jax.device_get(params))
    grafted = [0]

    def graft(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    graft(dst[k], v, f"{path}/{k}")
                else:
                    print(f"skip missing subtree {path}/{k}")
            else:
                if k in dst and np.shape(dst[k]) == np.shape(v):
                    dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                    grafted[0] += 1
                elif (k == "pos_embed" and pos_embed_grid is not None
                        and k in dst and np.ndim(v) == 3
                        and np.shape(v)[-1] == np.shape(dst[k])[-1]):
                    fitted = _fit_pos_embed(v, dst[k], pos_embed_grid)
                    if fitted is None:
                        print(f"skip {path}/{k}: cannot infer source grid "
                              f"from shape {np.shape(v)}")
                    else:
                        dst[k] = np.asarray(
                            fitted, dtype=np.asarray(dst[k]).dtype)
                        grafted[0] += 1
                else:
                    print(f"skip {path}/{k}: shape {np.shape(v)} vs "
                          f"{np.shape(dst.get(k))}")

    for top, sub in tree.items():
        n_leaves = len(jax.tree_util.tree_leaves(sub))
        grafted[0] = 0
        graft(params, {top: sub})
        # a converted multi-tensor subtree that matched NOTHING means the
        # checkpoint and the model are different architectures (e.g. a
        # TFDecoder .pth into --model_kind attn) — evaluating random
        # weights silently would look like a 0%-accuracy mystery, so fail
        # fast (single-leaf subtrees keep the documented skip-with-a-note
        # behavior for isolated shape mismatches)
        if n_leaves > 1 and grafted[0] == 0:
            raise ValueError(
                f"checkpoint subtree '{top}' ({n_leaves} tensors) matched "
                "nothing in the model — architecture mismatch between the "
                "checkpoint and the configured model")
    return params
