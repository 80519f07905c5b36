"""Numerical parity with the reference's PyTorch ViT math.

Builds a minimal torch encoder implementing the reference's exact forward
(fused qkv with [q_bias, 0, k..] trick, pre-LN blocks, conv patch embed,
sinusoid positions; modeling_finetune.py:63-196 + modeling_pretrain_vit.py:89-106),
runs it on random weights/inputs, converts the state_dict with
`convert_torch_encoder`, and checks the Flax model reproduces the outputs.
This validates both the block math and the published-checkpoint loader.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dig_tpu.models.layers import sinusoid_position_table
from dig_tpu.models.vit import PretrainViTEncoder
from dig_tpu.ops import activations
from dig_tpu.utils.checkpoint import convert_torch_encoder

@pytest.fixture(autouse=True)
def exact_gelu():
    # bit-parity with torch F.gelu needs the erf form (the framework
    # default is the tanh form; see dig_tpu/ops/activations.py)
    old = activations.EXACT
    activations.EXACT = True
    yield
    activations.EXACT = old

EMBED, DEPTH, HEADS = 64, 2, 2
IMG = (32, 128)
PATCH = 4
N_TOKENS = (IMG[0] // PATCH) * (IMG[1] // PATCH)


class TorchBlock(tnn.Module):
    """Reference block math: pre-LN, fused qkv with trainable q/v bias and
    constant-zero k bias, GELU MLP."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.q_bias = tnn.Parameter(torch.randn(dim) * 0.05)
        self.v_bias = tnn.Parameter(torch.randn(dim) * 0.05)
        self.proj = tnn.Linear(dim, dim)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def attn(self, x):
        b, n, c = x.shape
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias), self.v_bias])
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // self.heads) ** -0.5
        w = ((q * scale) @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x


class TorchEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patch = tnn.Conv2d(3, EMBED, kernel_size=PATCH, stride=PATCH)
        self.mask_token = tnn.Parameter(torch.randn(1, 1, EMBED) * 0.05)
        self.blocks = tnn.ModuleList([TorchBlock(EMBED, HEADS) for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(EMBED, eps=1e-6)
        pos = sinusoid_position_table(N_TOKENS, EMBED)
        self.register_buffer("pos", torch.from_numpy(np.asarray(pos)))

    def forward(self, x, mask=None):
        x = self.patch(x).flatten(2).transpose(1, 2)  # [B, N, C]
        if mask is not None:
            m = mask.unsqueeze(-1).float()
            x = x * (1 - m) + self.mask_token.expand_as(x) * m
        x = x + self.pos
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def reference_style_state_dict(self):
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch.weight.detach()
        sd["patch_embed.proj.bias"] = self.patch.bias.detach()
        sd["mask_token"] = self.mask_token.detach()
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "attn.qkv.weight"] = blk.qkv.weight.detach()
            sd[p + "attn.q_bias"] = blk.q_bias.detach()
            sd[p + "attn.v_bias"] = blk.v_bias.detach()
            sd[p + "attn.proj.weight"] = blk.proj.weight.detach()
            sd[p + "attn.proj.bias"] = blk.proj.bias.detach()
            sd[p + "norm1.weight"] = blk.norm1.weight.detach()
            sd[p + "norm1.bias"] = blk.norm1.bias.detach()
            sd[p + "norm2.weight"] = blk.norm2.weight.detach()
            sd[p + "norm2.bias"] = blk.norm2.bias.detach()
            sd[p + "mlp.fc1.weight"] = blk.fc1.weight.detach()
            sd[p + "mlp.fc1.bias"] = blk.fc1.bias.detach()
            sd[p + "mlp.fc2.weight"] = blk.fc2.weight.detach()
            sd[p + "mlp.fc2.bias"] = blk.fc2.bias.detach()
        sd["norm.weight"] = self.norm.weight.detach()
        sd["norm.bias"] = self.norm.bias.detach()
        return {k: v.numpy() for k, v in sd.items()}


def test_encoder_matches_torch_reference_math():
    torch.manual_seed(0)
    tenc = TorchEncoder().eval()

    model = PretrainViTEncoder(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
        num_heads=HEADS, qkv_bias=True, use_final_norm=True,
    )
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(2, *IMG, 3)).astype(np.float32)
    mask_np = (rng.random((2, N_TOKENS)) < 0.5)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    converted = convert_torch_encoder(tenc.reference_style_state_dict(), prefix="")

    # graft converted weights over the flax tree
    import copy

    params = copy.deepcopy(jax.device_get(variables["params"]))

    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                assert np.shape(dst[k]) == np.shape(v), (k, np.shape(dst[k]), np.shape(v))
                dst[k] = np.asarray(v, dtype=np.float32)

    graft(params, converted)

    with torch.no_grad():
        # torch is NCHW
        y_t = tenc(torch.from_numpy(x_np).permute(0, 3, 1, 2),
                   torch.from_numpy(mask_np))
    y_j = model.apply({"params": params}, jnp.asarray(x_np), jnp.asarray(mask_np))

    diff = np.abs(np.asarray(y_j) - y_t.numpy())
    assert diff.max() < 2e-4, diff.max()
