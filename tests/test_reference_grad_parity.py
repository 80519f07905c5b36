"""GRADIENT-level (train-step) parity against the reference's own engines.

The forward pins in test_reference_import_parity.py do not pin
stop-gradient placement, loss normalization, EMA/update ordering or the
optimizer coupling.  This file closes that tier: identical converted
weights + identical batch, ONE full training step on both sides with a
plain SGD(lr) optimizer, asserting

* the total loss (and its contrast/pixel decomposition),
* per-leaf gradients (recovered from the SGD update: g = (p0 - p1)/lr,
  so the *actual applied update* is what is pinned),
* the updated parameters,
* the post-step EMA (momentum) tree — seeded with a perturbed momentum
  branch so the `m * ema + (1-m) * student` math and its
  update-BEFORE-momentum-forward ordering are both observable.

Reference engine math reproduced verbatim on the torch side in float64
(ground truth):

* pretrain: MIM pixel-target build (un-normalize -> einops rearrange ->
  per-patch unbiased standardize -> masked gather,
  engine_for_pretraining_moco.py:83-111), loss
  ``contra * w_contrast + mse * w_pixel`` (:120-143), backward, SGD step;
  the EMA update runs inside MoCo_ViT.forward before the momentum forward
  (modeling_pretrain_moco_mim_ori.py:526-538).
* finetune: train_class_batch (engine_for_finetuning.py:26-46) with the
  reference's OWN `RecModel` (models/model_builder.py:74-202, built
  through its own `create_encoder`/`create_decoder`) and its OWN
  `SeqLabelSmoothingCrossEntropyLoss`
  (loss/seqLabelSmoothingCrossEntropyLoss.py:19-70).

The JAX side runs the real jitted `make_pretrain_step` /
`make_finetune_step` programs in float32; tolerances are fp32-scale.
"""

import copy
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
]

for _p in (SHIM, REF):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax
import jax.numpy as jnp
import optax

from dig_tpu.models.decoder import create_decoder
from dig_tpu.models.moco import DiGPretrainModel
from dig_tpu.models.rec_model import RecModel
from dig_tpu.models.vit import VisionTransformer
from dig_tpu.ops import activations
from dig_tpu.train.finetune import init_finetune_state, make_finetune_step
from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
from dig_tpu.train.state import TrainState
from dig_tpu.utils.checkpoint import (
    convert_torch_moco,
    convert_torch_recognizer,
)

LR = 0.1


@pytest.fixture(autouse=True)
def exact_gelu():
    old = activations.EXACT
    activations.EXACT = True
    yield
    activations.EXACT = old


@pytest.fixture(scope="module")
def gloo_world1(tmp_path_factory):
    import torch.distributed as dist

    created = False
    if not dist.is_initialized():
        store = dist.FileStore(
            str(tmp_path_factory.mktemp("dist") / "store"), 1)
        dist.init_process_group("gloo", store=store, rank=0, world_size=1)
        created = True
    yield
    if created:
        dist.destroy_process_group()


def _sd(module, prefix=""):
    # .numpy() returns a VIEW of the torch storage; copy so a later
    # in-place optimizer step cannot silently mutate the snapshot
    return {prefix + k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


def _graft(dst, src, path=""):
    for k, v in src.items():
        assert k in dst, f"converted key {path}/{k} missing from flax tree"
        if isinstance(v, dict):
            _graft(dst[k], v, f"{path}/{k}")
        else:
            assert np.shape(dst[k]) == np.shape(v), (path, k)
            dst[k] = np.asarray(v, np.float32)


def _assert_tree_close(mine, ref, path="", rtol=3e-3, atol=1e-4,
                       count=None):
    """Walk the converted-reference tree and compare each leaf of `mine`.
    Per-leaf tolerance scales with that leaf's own magnitude, so big
    embedding grads and tiny bias grads are both meaningfully pinned."""
    if count is None:
        count = [0]
    for k, v in ref.items():
        assert k in mine, f"{path}/{k} missing on the jax side"
        if isinstance(v, dict):
            _assert_tree_close(mine[k], v, f"{path}/{k}", rtol, atol, count)
        else:
            a = np.asarray(mine[k], np.float64)
            b = np.asarray(v, np.float64)
            tol = atol + rtol * max(np.abs(b).max(), np.abs(a).max())
            diff = np.abs(a - b).max()
            assert diff < tol, (f"{path}/{k}: max|diff|={diff:.3e} "
                                f"tol={tol:.3e}")
            count[0] += 1
    return count[0]


# ---------------------------------------------------------------------------
# Pre-training step (MoCo + MIM) vs engine_for_pretraining_moco.py
# ---------------------------------------------------------------------------


def test_pretrain_step_gradient_parity(gloo_world1):
    import torch.nn.functional as F
    from einops import rearrange
    import modeling_pretrain_moco_mim_ori as ref_mod

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self  # labels pinned to CUDA (:453)
    try:
        torch.manual_seed(31)
        dim, depth, heads = 64, 2, 2
        ref = ref_mod.MoCo_ViT(
            img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_num_classes=48, decoder_embed_dim=32, mlp_ratio=4.0,
            qkv_bias=True, mlp_dim=96, dim=16, T=0.2, num_windows=4,
            use_pixel_target=True, use_moco_target=True,
            patchnet_name="regular")
        # Perturb the momentum branch away from the student so the EMA
        # math (and its ordering before the momentum forward) actually
        # shows up in the keys, the loss, and the post-step EMA tree.
        with torch.no_grad():
            g = torch.Generator().manual_seed(97)
            for mod in (ref.momentum_encoder, ref.momentum_projection_layer,
                        ref.momentum_patch_extractor, ref.pix_projector_m):
                for name, p in mod.named_parameters():
                    if "k_bias" in name:
                        # structurally zero in both frameworks (the q/v-bias
                        # trick freezes k_bias at 0; modeling_finetune.py:75-91)
                        continue
                    p.add_(0.05 * torch.randn(p.shape, generator=g))
        ref.train().double()

        m, cw, w_pixel = 0.5, 0.1, 1.0
        rng = np.random.default_rng(32)
        b, n = 2, 8 * 32
        img64 = torch.from_numpy(
            rng.normal(size=(b, 3, 32, 128)).astype(np.float64))
        aug64 = torch.from_numpy(
            rng.normal(size=(b, 3, 32, 128)).astype(np.float64))
        mask = np.zeros((b, 2, n), bool)
        for r in range(b):
            for v in range(2):
                mask[r, v, rng.permutation(n)[:100]] = True

        # ---- torch side: the engine step verbatim (fp64) ----------------
        bool_vis = torch.from_numpy(mask.copy())
        bool_vis[:, 1, :] = False  # only_mim_on_ori_img (engine :103-104)
        with torch.no_grad():
            unnorm = img64 * 0.5 + 0.5  # mean=std=0.5 (engine :85-88)
            sq = rearrange(unnorm, "b c (h p1) (w p2) -> b (h w) (p1 p2) c",
                           p1=4, p2=4)
            normed = (sq - sq.mean(dim=-2, keepdim=True)) / (
                sq.var(dim=-2, unbiased=True, keepdim=True).sqrt() + 1e-6)
            images_patch = rearrange(normed, "b n p c -> b n (p c)")
            Bv, _, Cp = images_patch.shape
            vis_label = images_patch[bool_vis[:, 0, :]].reshape(Bv, -1, Cp)

        p0_sd = _sd(ref)  # pre-step snapshot (student + momentum)
        opt = torch.optim.SGD(
            [p for p in ref.parameters() if p.requires_grad], lr=LR)
        out = ref(img64, aug64, bool_vis, m)
        loss_t = out["contra_loss"] * cw + w_pixel * F.mse_loss(
            out["vis_out"][0], vis_label, reduction="mean")
        opt.zero_grad()
        loss_t.backward()
        grads_sd = {k: p.grad.detach().numpy().copy()
                    for k, p in ref.named_parameters() if p.grad is not None}
        opt.step()
        p1_sd = _sd(ref)

        # ---- jax side: the real jitted make_pretrain_step ---------------
        model = DiGPretrainModel(
            img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_num_classes=48, decoder_embed_dim=32, mlp_dim=96,
            dim=16, temperature=0.2, num_windows=4, use_pixel_target=True,
            use_moco_target=True, qkv_bias=True)
        tx = optax.sgd(LR)
        state = init_pretrain_state(model, tx, jax.random.PRNGKey(0),
                                    batch_size=b)
        params = copy.deepcopy(jax.device_get(state.params))
        tree0 = convert_torch_moco(p0_sd)
        _graft(params, tree0["student"])
        ema0 = copy.deepcopy(
            {k: params[k] for k in model.ema_submodules() if k in params})
        _graft(ema0, tree0["ema"])
        state = TrainState.create(params, tx, ema_params=ema0)
        params0 = copy.deepcopy(params)

        step_fn = make_pretrain_step(
            model, momentum_schedule=np.array([m]),
            contrast_weight_schedule=np.array([cw]),
            loss_weight_pixel=w_pixel, only_mim_on_ori_img=True,
            normalize_target=True)
        batch = {
            "images": jnp.asarray(
                img64.numpy().transpose(0, 2, 3, 1), jnp.float32),
            "aug_images": jnp.asarray(
                aug64.numpy().transpose(0, 2, 3, 1), jnp.float32),
            "mask": jnp.asarray(mask),
        }
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))

        # 1. loss + decomposition
        assert abs(float(metrics["loss"]) - float(loss_t)) < 2e-3
        assert abs(float(metrics["loss_contrast"]) -
                   float(out["contra_loss"])) < 2e-3
        ref_pix = float(F.mse_loss(out["vis_out"][0], vis_label))
        assert abs(float(metrics["loss_pixel"]) - ref_pix) < 1e-3

        # 2. gradients, recovered from the applied SGD update
        p_new = jax.device_get(new_state.params)
        my_grads = jax.tree_util.tree_map(
            lambda a, z: (np.asarray(a, np.float64) -
                          np.asarray(z, np.float64)) / LR, params0, p_new)
        ref_grads = convert_torch_moco(grads_sd)["student"]
        n_pinned = _assert_tree_close(my_grads, ref_grads, "grad",
                                      rtol=3e-3, atol=2e-4)
        assert n_pinned > 40  # every student leaf is covered

        # 3. updated parameters
        tree1 = convert_torch_moco(p1_sd)
        _assert_tree_close(p_new, tree1["student"], "param",
                           rtol=1e-4, atol=5e-5)

        # 4. post-step EMA tree: m * ema0 + (1-m) * student0, computed
        # BEFORE the optimizer update (and feeding the key forward)
        _assert_tree_close(jax.device_get(new_state.ema_params),
                           tree1["ema"], "ema", rtol=1e-4, atol=5e-5)
    finally:
        torch.Tensor.cuda = orig_cuda


# ---------------------------------------------------------------------------
# Fine-tune step vs engine_for_finetuning.py + the reference's own RecModel
# ---------------------------------------------------------------------------

NB, T_MAX = 13, 7


def _register_test_encoder():
    """Register a tiny 32x128 encoder through the reference's own timm
    registry so `create_encoder` (models/encoder.py:6-20) builds it.
    `num_classes` must be forced positive: the reference's
    `VisionTransformer.__init__` crashes on the num_classes=0 its own
    `create_encoder` passes (trunc_normal_ on the Identity head,
    modeling_finetune.py:305) — the head is unused on the
    return_feat_map path, so a real (untrained) head is equivalent."""
    from functools import partial

    import torch.nn as nn

    import modeling_finetune
    from timm.models.registry import is_model, register_model

    if is_model("vit_gradpin_patch4_32x128"):
        return

    @register_model
    def vit_gradpin_patch4_32x128(pretrained=False, **kwargs):
        kwargs.pop("drop_block_rate", None)
        kwargs["num_classes"] = 10
        return modeling_finetune.VisionTransformer(
            img_size=(32, 128), patch_size=4, embed_dim=48, depth=2,
            num_heads=2, mlp_ratio=4.0, qkv_bias=True,
            norm_layer=partial(nn.LayerNorm, eps=1e-6), **kwargs)


def test_finetune_step_gradient_parity():
    """One supervised step with the reference's own RecModel and its own
    `SeqCrossEntropyLoss`.  smoothing=0 deliberately: the reference's
    smoothing criterion has a broadcasting bug that inflates the loss
    ~B*T-fold (see test_reference_loss_pins.py) — the bug-free SeqCE is
    the criterion run_class_finetuning.py:535-544 selects at
    --smoothing 0, and the one whose gradients are pinnable."""
    from loss.seqCrossEntropyLoss import SeqCrossEntropyLoss
    from models import model_builder

    _register_test_encoder()
    torch.manual_seed(41)
    args = types.SimpleNamespace(
        model="vit_gradpin_patch4_32x128", nb_classes=NB, max_len=T_MAX,
        decoder_name="small_tf_decoder", drop=0.0, drop_path=0.0,
        attn_drop_rate=0.0, use_mean_pooling=False, init_scale=0.001,
        use_seq_cls_token=False, text_cond_vis=False, use_1d_attdec=False,
        beam_width=0)
    ref = model_builder.RecModel(args).train().double()
    # create_decoder hardcodes the torch default dropout=0.1
    # (models/decoder.py:13-33); zero every Dropout so the train-mode
    # forward is deterministic and the gradients comparable
    for mod in ref.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    criterion = SeqCrossEntropyLoss()

    rng = np.random.default_rng(42)
    b = 3
    img64 = torch.from_numpy(
        rng.normal(size=(b, 3, 32, 128)).astype(np.float64))
    targets = rng.integers(0, NB, size=(b, T_MAX)).astype(np.int64)
    lens = np.array([T_MAX, 4, 6], np.int64)

    # ---- torch: train_class_batch + backward + SGD (fp64) ---------------
    p0_sd = _sd(ref)
    opt = torch.optim.SGD([p for p in ref.parameters() if p.requires_grad],
                          lr=LR)
    outputs = ref((img64, torch.from_numpy(targets), torch.from_numpy(lens)))
    logits_t = outputs[0]  # (dec_output, None, None, dec_attn_maps)
    loss_t = criterion(logits_t, torch.from_numpy(targets),
                       torch.from_numpy(lens))
    opt.zero_grad()
    loss_t.backward()
    grads_sd = {k: p.grad.detach().numpy().copy()
                for k, p in ref.named_parameters() if p.grad is not None}
    opt.step()
    p1_sd = _sd(ref)

    # ---- jax: the real jitted make_finetune_step (fp32) -----------------
    encoder = VisionTransformer(
        img_size=(32, 128), patch_size=4, embed_dim=48, depth=2, num_heads=2,
        qkv_bias=True, use_mean_pooling=False, return_feat_map=True,
        drop_rate=0.0)
    # small_tf_decoder dims (create_decoder table) but dropout=0.0 —
    # matching the Dropout modules zeroed on the torch side above
    from dig_tpu.models.decoder import TFDecoder
    model = RecModel(encoder=encoder,
                     decoder=TFDecoder(
                         n_layers=2, d_embedding=384, n_head=6, d_k=64,
                         d_v=64, d_model=384, d_inner=192, dropout=0.0,
                         num_classes=NB, max_seq_len=T_MAX))
    tx = optax.sgd(LR)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0),
                                batch_size=b, max_len=T_MAX)
    params = copy.deepcopy(jax.device_get(state.params))
    _graft(params, convert_torch_recognizer(p0_sd))
    state = TrainState.create(params, tx)
    params0 = copy.deepcopy(params)

    step_fn = make_finetune_step(model, smoothing=0.0)
    batch = {
        "images": jnp.asarray(img64.numpy().transpose(0, 2, 3, 1),
                              jnp.float32),
        "targets": jnp.asarray(targets, jnp.int32),
        "lengths": jnp.asarray(lens, jnp.int32),
    }
    new_state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(1))

    assert abs(float(metrics["loss"]) - float(loss_t)) < 2e-3

    p_new = jax.device_get(new_state.params)
    my_grads = jax.tree_util.tree_map(
        lambda a, z: (np.asarray(a, np.float64) -
                      np.asarray(z, np.float64)) / LR, params0, p_new)
    ref_grads = convert_torch_recognizer(grads_sd)
    n_pinned = _assert_tree_close(my_grads, ref_grads, "grad",
                                  rtol=3e-3, atol=2e-4)
    assert n_pinned > 40

    _assert_tree_close(p_new, convert_torch_recognizer(p1_sd), "param",
                       rtol=1e-4, atol=5e-5)
