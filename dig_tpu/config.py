"""Typed configuration with a flag-compatible CLI shim.

The reference's entire config system is argparse (~90 flags in the
pretrain CLI, run_mae_pretraining_moco.py:40-275; ~80 in finetune,
run_class_finetuning.py:43-255) and the parsed namespace is pickled into
every checkpoint.  Here the configs are dataclasses; `add_cli_args` /
`from_cli` preserve the documented flag names so the README launch
commands translate 1:1.  Derived values (window size, linearly scaled
LR) are computed in `finalize()` like the reference's main() does
(run_mae_pretraining_moco.py:322-323, :382).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import List, Optional, Tuple


@dataclasses.dataclass
class PretrainConfig:
    # model
    model: str = "pretrain_simmim_moco_ori_vit_small_patch4_32x128"
    input_h: int = 32
    input_w: int = 128
    patch_size: int = 4
    drop_path: float = 0.0
    normlize_target: bool = True  # (sic — reference flag spelling)
    # masking / views
    mask_ratio: float = 0.7
    num_view: int = 2
    # moco
    moco_dim: int = 256
    moco_mlp_dim: int = 4096
    moco_m: float = 0.99
    use_moco_m_cos: bool = True
    moco_t: float = 0.2
    num_windows: int = 4
    patchnet_name: str = "regular"
    label_smoothing: float = 0.0
    # loss weights
    loss_weight_pixel: float = 1.0
    loss_weight_contrast: float = 0.1
    contrast_warmup_steps: int = 500
    contrast_start_epoch: int = 0
    only_mim_on_ori_img: bool = True
    # optimization
    batch_size: int = 128  # per host
    epochs: int = 10
    opt: str = "adamw"
    opt_betas: Tuple[float, float] = (0.9, 0.999)
    opt_eps: float = 1e-8
    clip_grad: Optional[float] = None
    weight_decay: float = 0.1
    weight_decay_end: Optional[float] = None
    lr: float = 1.5e-4
    warmup_lr: float = 1e-6
    min_lr: float = 1e-5
    warmup_epochs: int = 0
    warmup_steps: int = 5000
    # data
    image_alone_path: List[str] = dataclasses.field(default_factory=list)
    voc_type: str = "ALLCASES_SYMBOLS"
    max_len: int = 25
    aloneimage_num_samples: float = float("inf")
    num_workers: int = 10
    # "thread" (default; cv2/numpy release the GIL) or "process" (forked
    # workers, torch-DataLoader style) — see data/pipeline.py
    worker_type: str = "thread"
    # per-batch source homogeneity for multi-LMDB training (the reference
    # imports DistributedMultiSrcBatchWiseSampler but never instantiates it,
    # run_mae_pretraining_moco.py:31 vs :350-352 — wired here as an opt-in)
    batch_wise_shuffle: bool = False
    # run
    output_dir: str = "./output"
    log_dir: Optional[str] = None
    seed: int = 0
    resume: str = ""
    auto_resume: bool = True
    start_epoch: int = 0
    save_ckpt_freq: int = 1
    keep_ckpt_max: int = 0  # keep only the newest N numeric ckpts (0 = all)
    eval_freq: int = 1000
    # capture a jax.profiler trace of N steps to {output_dir}/profile
    # (starting at profile_start_step, past the first compiles); 0 = off
    profile_steps: int = 0
    profile_start_step: int = 10
    dtype: str = "bfloat16"
    # TPU-native additions
    device_aug: bool = False  # second view + masks generated on device
    remat: bool = False  # rematerialize encoder blocks (fits larger models/batches)
    n_fsdp: int = 1
    n_tensor: int = 1

    @property
    def input_size(self):
        return (self.input_h, self.input_w)

    @property
    def window_size(self):
        return (self.input_h // self.patch_size, self.input_w // self.patch_size)

    def finalize(self, num_devices: int = 1):
        """Linear LR scaling: lr * total_batch / 256
        (run_mae_pretraining_moco.py:382)."""
        if self.num_view != 2:
            # the MoCo graph is two-view by construction (ori+aug concat
            # chunked into q1/q2), exactly like the reference's MoCo_ViT
            # (modeling_pretrain_moco_mim_ori.py:488-553) — fail fast
            # instead of a shape error deep inside the jitted encoder
            raise ValueError(f"--num_view must be 2 (got {self.num_view})")
        total_bs = self.batch_size * num_devices
        self.absolute_lr = self.lr * total_bs / 256.0
        if self.weight_decay_end is None:
            self.weight_decay_end = self.weight_decay
        return self


@dataclasses.dataclass
class FinetuneConfig:
    # model
    model: str = "vit_small_patch4_32x128"
    decoder_name: str = "tf_decoder"
    # rec | ctc | attn | seq_cls | mim_rec (selects the head family)
    model_kind: str = "rec"
    # mim_rec: auxiliary SimMIM branch during fine-tuning (the reference's
    # MimRecModel, models/model_builder.py:204-290 — dead code there,
    # wired first-class here; reference flag names preserved)
    mim_sample_ratio: float = 0.5
    use_mim_proj: bool = False
    mask_ratio: float = 0.7
    loss_weight_pixel: float = 1.0
    normlize_target: bool = True  # (sic — reference flag spelling)
    use_feat_distill: bool = False
    loss_weight_feat_distill: float = 1.0
    teacher_ckpt: str = ""
    nb_classes: int = 97
    max_len: int = 25
    drop: float = 0.1
    attn_drop_rate: float = 0.1
    drop_path: float = 0.1
    use_1d_attdec: bool = False
    use_mean_pooling: bool = True
    text_cond_vis: bool = False
    beam_width: int = 0
    # recipe
    batch_size: int = 256
    epochs: int = 10
    update_freq: int = 1
    opt: str = "adamw"
    opt_betas: Tuple[float, float] = (0.9, 0.999)
    opt_eps: float = 1e-8
    clip_grad: Optional[float] = None
    weight_decay: float = 0.05
    weight_decay_end: Optional[float] = None
    lr: float = 1e-4
    layer_decay: float = 1.0
    warmup_lr: float = 1e-6
    min_lr: float = 1e-6
    warmup_epochs: int = 1
    warmup_steps: int = -1
    smoothing: float = 0.1
    fixed_encoder_layers: int = 0
    # init / resume
    finetune: str = ""
    model_key: str = "model|module"
    model_prefix: str = ""
    # erf-GELU (torch-exact) vs tanh-GELU (TPU-fast).  None = auto: erf
    # whenever --finetune/--resume loads a reference .pth (weights trained
    # under erf must be evaluated under erf), tanh otherwise.
    exact_gelu: Optional[bool] = None
    resume: str = ""
    auto_resume: bool = True
    start_epoch: int = 0
    # data
    data_path: List[str] = dataclasses.field(default_factory=list)
    eval_data_path: str = ""
    other_test_data_folders: List[str] = dataclasses.field(default_factory=list)
    voc_type: str = "ALLCASES_SYMBOLS"
    num_samples: float = float("inf")
    num_view: int = 2
    use_abi_aug: bool = True
    # run the ABI augmentation on device (jitted batched program) instead
    # of in cv2 host workers — frees the host pipeline at TPU batch sizes
    device_abi_aug: bool = False
    num_workers: int = 10
    # "thread" (default; cv2/numpy release the GIL) or "process" (forked
    # workers, torch-DataLoader style) — see data/pipeline.py
    worker_type: str = "thread"
    # per-batch source homogeneity for multi-LMDB training (see PretrainConfig)
    batch_wise_shuffle: bool = False
    # run
    output_dir: str = "./output"
    log_dir: Optional[str] = None
    seed: int = 0
    save_ckpt: bool = True
    # save a 'best' checkpoint on every eval-accuracy improvement (the
    # reference's behavior, run_class_finetuning.py:617-624).  --no_save_best
    # keeps only the periodic/final saves — useful on hosts with a slow
    # device->host path where tens of best-saves dominate wall time
    # (see VALIDATION.md "Known environment artifact")
    save_best: bool = True
    save_ckpt_freq: int = 1
    keep_ckpt_max: int = 0  # keep only the newest N numeric ckpts (0 = all)
    eval_freq: int = 1000
    # capture a jax.profiler trace of N steps to {output_dir}/profile
    # (starting at profile_start_step, past the first compiles); 0 = off
    profile_steps: int = 0
    profile_start_step: int = 10
    eval: bool = False
    # when True, eval benchmarks are sharded across hosts with a cross-host
    # metric reduction; when False every host evaluates the full set locally
    # (the reference's SequentialSampler-vs-DistributedSampler split,
    # run_class_finetuning.py:298-306)
    dist_eval: bool = False
    input_h: int = 32
    input_w: int = 128
    dtype: str = "bfloat16"
    n_fsdp: int = 1
    n_tensor: int = 1

    def finalize(self, num_devices: int = 1):
        """lr * total_batch / 256 (run_class_finetuning.py:464)."""
        total_bs = self.batch_size * num_devices * self.update_freq
        self.absolute_lr = self.lr * total_bs / 256.0
        if self.weight_decay_end is None:
            self.weight_decay_end = self.weight_decay
        return self


@dataclasses.dataclass
class PredictConfig:
    """Batch-inference entry point config (`dig_tpu.cli.run_predict`).

    The reference has no prediction CLI — recognition outside of
    `--eval` requires hand-writing a loader around RecModel
    (models/model_builder.py:124-202).  This config drives a
    production-shaped path: checkpoint -> recognize image files / LMDBs
    -> text + confidence, batched on the TPU.  Model fields mirror
    FinetuneConfig so a training config translates 1:1."""

    # model (must match the checkpoint)
    model: str = "vit_small_patch4_32x128"
    decoder_name: str = "tf_decoder"
    model_kind: str = "rec"  # rec | ctc | attn | seq_cls
    use_1d_attdec: bool = False
    use_mean_pooling: bool = True
    text_cond_vis: bool = False
    nb_classes: int = 97
    max_len: int = 25
    voc_type: str = "ALLCASES_SYMBOLS"
    beam_width: int = 0
    # inference is deterministic; rates exist only so build_model() is shared
    drop: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path: float = 0.0
    use_feat_distill: bool = False
    exact_gelu: Optional[bool] = None  # None = auto (erf for .pth weights)
    # weights: --resume = native full-model checkpoint dir;
    # --finetune = reference .pth (converted) or SSL encoder graft
    resume: str = ""
    finetune: str = ""
    model_key: str = "model|module"
    model_prefix: str = ""
    # input: files / directories / globs, and-or LMDBs (labels ignored)
    images: List[str] = dataclasses.field(default_factory=list)
    data_path: List[str] = dataclasses.field(default_factory=list)
    input_h: int = 32
    input_w: int = 128
    batch_size: int = 512
    num_workers: int = 4
    # output: TSV ``name\ttext\tconfidence`` (stdout when empty)
    output: str = ""
    seed: int = 0
    dtype: str = "bfloat16"


_TRUTHY = ("1", "true", "yes", "on")


def _add_field_args(parser: argparse.ArgumentParser, cfg) -> None:
    for f in dataclasses.fields(cfg):
        name = "--" + f.name
        default = getattr(cfg, f.name)
        if f.type in ("bool", bool) or isinstance(default, bool):
            group = parser.add_mutually_exclusive_group()
            group.add_argument(name, dest=f.name, action="store_true", default=default)
            group.add_argument(
                "--no_" + f.name, dest=f.name, action="store_false", default=default
            )
        elif "bool" in str(f.type):  # tri-state Optional[bool] (None = auto)
            parser.add_argument(
                name, default=default,
                type=lambda s: s.lower() in _TRUTHY)
        elif isinstance(default, (list, tuple)) or "List" in str(f.type) or "Tuple" in str(f.type):
            parser.add_argument(name, nargs="*", default=default)
        elif isinstance(default, float) or default is None:
            parser.add_argument(name, type=float, default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


# Reference flag spellings that map onto a differently-named field here.
# Each entry: ref flag -> fn(value_or_None) -> list of replacement argv
# tokens (the fn may inspect the value the reference flag consumed).
# Only applied when the TARGET field exists on the config class, so the
# same table serves the pretrain, finetune and predict CLIs.
def _map_decoder_type(val):
    # run_class_finetuning.py:350-355: tf_decoder -> RecModel,
    # attention -> AttnRecModel, anything else -> NotImplementedError
    kind = {"tf_decoder": "rec", "attention": "attn"}.get(val or "")
    if not kind:
        raise ValueError(
            f"--decoder_type {val!r}: the reference supports tf_decoder "
            "or attention (run_class_finetuning.py:350-355)")
    return ["--model_kind", kind]


_REF_FLAG_ALIASES = {
    # finetune / predict (run_class_finetuning.py)
    # reference spelling is `type=bool` (run_class_finetuning.py:75): any
    # non-empty value parses True there (even "False"); here truthy
    # strings and the bare-flag form select seq_cls, explicit falsy
    # strings keep the default (the sane reading of user intent)
    "--use_seq_cls_token": ("model_kind", lambda v: (
        ["--model_kind", "seq_cls"]
        if v is None or v.lower() in _TRUTHY else []), True),
    "--decoder_type": ("model_kind", _map_decoder_type, True),
    "--use_cls": ("use_mean_pooling",  # store_false dest=use_mean_pooling
                  lambda v: ["--no_use_mean_pooling"], False),
    # pretrain (run_mae_pretraining_moco.py:186-187, store_true)
    "--moco_m_cos": ("use_moco_m_cos",
                     lambda v: ["--use_moco_m_cos"], False),
}


def _translate_reference_flags(argv, cls):
    """Rewrite live reference-CLI flag spellings into this config's flags
    (in place in the argv stream, so later explicit flags still win)."""
    fields = {f.name for f in dataclasses.fields(cls())}
    out, translated, i = [], [], 0
    while i < len(argv):
        tok = argv[i]
        name, eq, inline = tok.partition("=")
        rule = _REF_FLAG_ALIASES.get(name)
        if rule is None:
            out.append(tok)
            i += 1
            continue
        target, fn, takes_value = rule
        val = inline if eq else None
        if takes_value and val is None and i + 1 < len(argv) \
                and not argv[i + 1].startswith("--"):
            val = argv[i + 1]
            i += 1
        i += 1
        if target not in fields:
            # not this CLI's flag; re-emit flag AND consumed value so the
            # unknown-flags warning reports what was actually passed
            out.append(tok)
            if val is not None and not eq:
                out.append(val)
            continue
        repl = fn(val)
        out.extend(repl)
        translated.append(f"{name} -> {' '.join(repl) or '(default)'}")
    if translated:
        print(f"[config] reference flags translated: {translated}")
    return out


def parse_config(cls, argv=None):
    """Parse CLI args into a config dataclass; unknown flags are accepted
    with a warning (the reference CLIs carry many dead research flags),
    and live reference spellings are translated onto their equivalent
    fields here (see _REF_FLAG_ALIASES)."""
    import sys as _sys

    cfg = cls()
    argv = list(_sys.argv[1:] if argv is None else argv)
    argv = _translate_reference_flags(argv, cls)
    parser = argparse.ArgumentParser(cls.__name__, allow_abbrev=False)
    _add_field_args(parser, cfg)
    args, unknown = parser.parse_known_args(argv)
    if unknown:
        print(f"[config] ignoring unknown flags: {unknown}")
    for f in dataclasses.fields(cfg):
        val = getattr(args, f.name)
        if isinstance(getattr(cfg, f.name), tuple) and isinstance(val, list):
            val = tuple(float(x) for x in val)
        if isinstance(getattr(cfg, f.name), int) and not isinstance(getattr(cfg, f.name), bool):
            val = int(val)
        setattr(cfg, f.name, val)
    return cfg


def config_to_json(cfg) -> str:
    d = dataclasses.asdict(cfg)
    for k, v in list(d.items()):
        if v == float("inf"):
            d[k] = "inf"
    return json.dumps(d, indent=2, default=str)
