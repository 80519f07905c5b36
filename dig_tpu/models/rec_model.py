"""Recognition models: ViT encoder + text decoder heads (Flax).

Parity targets (reference: models/model_builder.py):

* `RecModel` — encoder -> linear_norm (Dense + LayerNorm into the decoder
  width, :85-88) -> transformer decoder; eval switches to greedy/beam
  decoding (:137-139, :151-158); optional 1-D feature collapse (mean over
  the height axis, :146-148),
* `CTCRecModel` — encoder -> height-mean -> MLP ctc classifier with
  ``nb_classes + 1`` outputs (blank last; :8-38),
* `AttnRecModel` — encoder -> GRU additive-attention head (:40-72;
  models/attn_decoder.py),
* `MimRecModel` — fine-tuning with an auxiliary masked-image-modeling
  branch (:204-290).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dig_tpu.models.attn_decoder import AttentionRecognitionHead
from dig_tpu.models.decoder import TFDecoder, create_decoder
from dig_tpu.ops.activations import gelu
from dig_tpu.models.registry import create_model
from dig_tpu.models.vit import VisionTransformer


class LinearNorm(nn.Module):
    """Dense + LayerNorm bridge into the decoder width
    (reference: models/model_builder.py:85-88)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="dense")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


def _greedy_or_beam(decoder, dec_in, beam_width: int, eos: int):
    """Shared decode dispatch for all recognizer heads.

    Beam when beam_width > 0 (the KV-cached beam beats dense recompute:
    the beam folding already yields big batches, see decoder.py).  Greedy
    uses the dense full-prefix variant on TPU (MXU-friendly shapes) and
    the KV-cached scan elsewhere — numerically the same decode
    (tests/test_decoder.py).  eos < 0 disables greedy early exit
    (fixed-length decode)."""
    if beam_width > 0:
        return None, decoder.beam_search(dec_in, beam_width, eos)
    if jax.default_backend() == "tpu":
        return decoder.greedy_decode_dense(dec_in, eos=eos if eos >= 0 else None)
    return decoder.greedy_decode(dec_in)


class RecModel(nn.Module):
    encoder: nn.Module
    decoder: TFDecoder
    use_1d_attdec: bool = False
    use_feat_distill: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.linear_norm = LinearNorm(self.decoder.d_embedding, dtype=self.dtype)
        if self.use_feat_distill:
            # 3-layer projector for feature distillation
            # (reference: models/model_builder.py:113-115, 183-202)
            from dig_tpu.models.moco import MLPHead

            self.feat_proj = MLPHead(3, 4096, self.encoder.embed_dim, dtype=self.dtype)

    def _raw_encode(self, images, deterministic):
        enc = self.encoder(images, deterministic=deterministic)
        if self.use_1d_attdec:
            b, n, c = enc.shape
            gh, gw = self.encoder.patch_shape
            enc = enc.reshape(b, gh, gw, c).mean(axis=1)
        return enc

    def _encode(self, images, deterministic):
        return self.linear_norm(self._raw_encode(images, deterministic))

    def __call__(self, images, targets, tgt_lens, deterministic: bool = False):
        """Teacher-forced training pass -> [B, T, num_classes] logits
        (plus the projected student feature when distilling;
        reference: models/model_builder.py:161-166)."""
        enc = self._raw_encode(images, deterministic)
        logits = self.decoder(self.linear_norm(enc), targets, tgt_lens,
                              deterministic=deterministic)
        if self.use_feat_distill:
            b, l, c = enc.shape
            s_feat = self.feat_proj(enc.reshape(b * l, c)).reshape(b, l, c)
            return logits, s_feat
        return logits

    def encode_features(self, images, deterministic: bool = True):
        """Bare encoder features (used as the distillation teacher;
        engine_for_finetuning.py:34-36).  Routed through `_raw_encode` so
        the teacher gets the SAME 1-D height collapse as the student when
        `use_1d_attdec` is on — the smooth-L1 in the distill step
        subtracts them elementwise."""
        return self._raw_encode(images, deterministic)

    def recognize(self, images, beam_width: int = 0, eos: int = 94):
        """Inference: greedy or beam search (shared dispatch).
        Returns (probs [B, T, C] or None, ids [B, T])."""
        return _greedy_or_beam(self.decoder, self._encode(images, True),
                               beam_width, eos)


class CTCRecModel(nn.Module):
    encoder: nn.Module
    nb_classes: int = 97
    d_embedding: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        enc = self.encoder(images, deterministic=deterministic)
        b, n, c = enc.shape
        gh, gw = self.encoder.patch_shape
        x = enc.reshape(b, gh, gw, c).mean(axis=1)
        x = nn.Dense(self.d_embedding, dtype=self.dtype, name="fc0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = gelu(x)
        return nn.Dense(self.nb_classes + 1, dtype=self.dtype, name="fc1")(x)


class AttnRecModel(nn.Module):
    encoder: nn.Module
    nb_classes: int = 97
    max_len: int = 25
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.decoder = AttentionRecognitionHead(
            num_classes=self.nb_classes, s_dim=512, att_dim=512,
            max_len_labels=self.max_len, dtype=self.dtype,
        )

    def __call__(self, images, targets, tgt_lens, deterministic: bool = False):
        enc = self.encoder(images, deterministic=deterministic)
        return self.decoder(enc, targets)

    def recognize(self, images, beam_width: int = 0, eos: int = 94):
        enc = self.encoder(images, deterministic=True)
        if beam_width > 0:
            return None, self.decoder.beam_search(enc, beam_width, eos)
        probs, ids = self.decoder.sample(enc)
        return probs, ids


class MimRecModel(nn.Module):
    """Fine-tuning with an auxiliary MIM pixel branch
    (reference: models/model_builder.py:204-290)."""

    encoder: nn.Module
    decoder: TFDecoder
    use_mim_proj: bool = False
    pix_dim: int = 192
    pix_classes: int = 48
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.linear_norm = LinearNorm(self.decoder.d_embedding, dtype=self.dtype)
        self.pix_encoder_to_decoder = nn.Dense(self.pix_dim, use_bias=False, dtype=self.dtype)
        self.pix_head = nn.Sequential([
            nn.Dense(self.pix_dim, use_bias=False, dtype=self.dtype),
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype),
            gelu,
            nn.Dense(self.pix_classes, dtype=self.dtype),
        ])
        if self.use_mim_proj:
            dim = self.encoder.embed_dim
            self.mim_proj = nn.Sequential([
                nn.Dense(dim * 2, dtype=self.dtype),
                nn.LayerNorm(epsilon=1e-6, dtype=self.dtype),
                gelu,
                nn.Dense(dim, dtype=self.dtype),
                nn.LayerNorm(epsilon=1e-6, dtype=self.dtype),
            ])

    def __call__(self, images, targets, tgt_lens, mask=None, num_mim_samples: int = 0,
                 deterministic: bool = False):
        out = {}
        if mask is not None:
            enc = self.encoder(images, mask, deterministic=deterministic)
        else:
            enc = self.encoder(images, deterministic=deterministic)
        rec_in = enc
        if mask is not None:
            out["pix_pred"] = self.pix_head(self.pix_encoder_to_decoder(enc))
            if self.use_mim_proj and num_mim_samples > 0:
                mim_part = self.mim_proj(enc[:num_mim_samples])
                rec_in = jnp.concatenate([mim_part, enc[num_mim_samples:]], axis=0)
        dec_in = self.linear_norm(rec_in)
        out["rec_pred"] = self.decoder(dec_in, targets, tgt_lens, deterministic=deterministic)
        return out

    def recognize(self, images, beam_width: int = 0, eos: int = 94):
        """Inference: unmasked encoder -> greedy/beam decode (the
        reference's eval path sets tgt=None with mask absent,
        models/model_builder.py:277-289).  Returns (probs or None, ids)."""
        dec_in = self.linear_norm(self.encoder(images, deterministic=True))
        return _greedy_or_beam(self.decoder, dec_in, beam_width, eos)


class SeqClsTokenRecModel(nn.Module):
    """Non-autoregressive recognizer: the encoder's learned per-position
    class queries are classified directly (reference --use_seq_cls_token
    path: engine_for_finetuning.py:27-28 with `vit_seq_cls_*` encoders,
    modeling_finetune.py:249-255, :335-352).  One parallel forward both at
    train and eval — no decode loop."""

    encoder: nn.Module  # must be built with use_seq_cls_token=True
    nb_classes: int = 97
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, targets=None, tgt_lens=None,
                 deterministic: bool = False):
        cls_tokens = self.encoder(images, deterministic=deterministic)  # [B, T, C]
        return nn.Dense(self.nb_classes, dtype=self.dtype, name="head")(cls_tokens)

    def recognize(self, images, beam_width: int = 0, eos: int = 94):
        logits = self(images, deterministic=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, jnp.argmax(probs, axis=-1).astype(jnp.int32)


class MultiLabelHead(nn.Module):
    """Class-query attention pooling producing per-character presence
    logits and the class-query attention maps consumed by the decoupled
    decoder (capability for --use_multi_label_loss /
    cls_query_attn_maps; reference: run_class_finetuning.py multi-label
    path + models/model_builder.py:131-143 — the producing encoder module
    is absent from the reference snapshot, so this is a fresh design)."""

    nb_classes: int = 97
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_map, deterministic: bool = True):
        b, n, c = feat_map.shape
        queries = self.param(
            "cls_queries", nn.initializers.truncated_normal(0.02),
            (1, self.nb_classes, c), jnp.float32,
        )
        q = jnp.broadcast_to(jnp.asarray(queries, feat_map.dtype),
                             (b, self.nb_classes, c))
        logits = jnp.einsum("bqc,bnc->bqn", q, feat_map) * (c**-0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(feat_map.dtype)
        pooled = jnp.einsum("bqn,bnc->bqc", attn, feat_map)
        cls_logit = nn.Dense(1, dtype=self.dtype, name="presence")(pooled)[..., 0]
        return cls_logit, attn  # [B, nb_classes], [B, nb_classes, N]


class SeqClsRecModel(nn.Module):
    """Recognizer with a multi-label class-presence branch whose attention
    maps can feed a `DecoupledTFDecoder`."""

    encoder: nn.Module
    decoder: TFDecoder
    nb_classes: int = 97
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.linear_norm = LinearNorm(self.decoder.d_embedding, dtype=self.dtype)
        self.multi_label = MultiLabelHead(nb_classes=self.nb_classes, dtype=self.dtype)

    def __call__(self, images, targets, tgt_lens, deterministic: bool = False):
        enc = self.encoder(images, deterministic=deterministic)
        cls_logit, cls_maps = self.multi_label(enc, deterministic)
        dec_in = self.linear_norm(enc)
        if isinstance(self.decoder, type(None)):
            return None, cls_logit, cls_maps
        from dig_tpu.models.decoder import DecoupledTFDecoder

        if isinstance(self.decoder, DecoupledTFDecoder):
            logits = self.decoder.decoupled_forward(
                dec_in, targets, tgt_lens, cls_maps, deterministic
            )
        else:
            logits = self.decoder(dec_in, targets, tgt_lens, deterministic=deterministic)
        return logits, cls_logit, cls_maps

    def recognize(self, images, beam_width: int = 0, eos: int = 94,
                  with_cls: bool = False):
        """Inference through the decoupled graph (the reference's
        forward_test/beam_search also run the decoupled `_attention`;
        models/decoder.py:224-252, :254-370, :415-436).
        Returns (probs [B, T, C] or None, ids [B, T]); with_cls appends
        the char-presence logits [B, nb_classes], which the reference's
        evaluate consumes for the multi-label F-measure
        (engine_for_finetuning.py:262-269)."""
        from dig_tpu.models.decoder import DecoupledTFDecoder

        enc = self.encoder(images, deterministic=True)
        cls_logit, cls_maps = self.multi_label(enc, True)
        dec_in = self.linear_norm(enc)
        if isinstance(self.decoder, DecoupledTFDecoder):
            if beam_width > 0:
                out = None, self.decoder.decoupled_beam_search(
                    dec_in, cls_maps, beam_width, eos
                )
            else:
                out = self.decoder.decoupled_greedy_decode(
                    dec_in, cls_maps, eos=eos if eos >= 0 else None
                )
        elif beam_width > 0:
            out = None, self.decoder.beam_search(dec_in, beam_width, eos)
        else:
            out = self.decoder.greedy_decode_dense(
                dec_in, eos=eos if eos >= 0 else None
            )
        return (*out, cls_logit) if with_cls else out


def build_rec_model(
    model_name: str = "vit_small_patch4_32x128",
    decoder_name: str = "tf_decoder",
    nb_classes: int = 97,
    max_len: int = 25,
    drop_rate: float = 0.0,
    attn_drop_rate: float = 0.0,
    drop_path_rate: float = 0.0,
    use_1d_attdec: bool = False,
    use_mean_pooling: bool = True,
    use_feat_distill: bool = False,
    text_cond_vis: bool = False,
    use_mim_proj: bool = False,
    dtype=jnp.float32,
    model_kind: str = "rec",  # rec | ctc | attn | seq_cls | mim_rec
) -> nn.Module:
    """Model factory mirroring the reference's encoder/decoder assembly
    (run_class_finetuning.py:344-356, models/encoder.py:6-20)."""
    if model_kind == "mim_rec":
        # The auxiliary-MIM recognizer needs the masked (SimMIM) encoder.
        # The reference's MimRecModel is unreachable dead code whose
        # `self.encoder(x, mask)` call does not even typecheck against its
        # finetune ViT (models/model_builder.py:263 vs the mask-less
        # forward at modeling_finetune.py:361-366); wired first-class here
        # against `PretrainViTEncoder` (mask-token substitution).
        if model_name.startswith("pretrain_"):
            # pretrain_* registry names build the full DiGPretrainModel
            # (dict outputs, different signature) — not a graftable encoder
            raise ValueError(
                f"--model_kind mim_rec needs a plain or simmim_* encoder "
                f"name, not the pretrain model {model_name!r} (e.g. "
                f"vit_small_patch4_32x128)")
        simmim_name = (model_name if model_name.startswith("simmim_")
                       else "simmim_" + model_name)
        encoder = create_model(
            simmim_name, drop_rate=drop_rate, attn_drop_rate=attn_drop_rate,
            drop_path_rate=drop_path_rate, dtype=dtype,
        )
        decoder = create_decoder(decoder_name, nb_classes, max_len,
                                 dtype=dtype)
        return MimRecModel(encoder=encoder, decoder=decoder,
                           use_mim_proj=use_mim_proj,
                           pix_classes=encoder.patch_size ** 2 * 3, dtype=dtype)
    encoder = create_model(
        model_name,
        drop_rate=drop_rate,
        attn_drop_rate=attn_drop_rate,
        drop_path_rate=drop_path_rate,
        use_mean_pooling=use_mean_pooling,
        return_feat_map=True,
        dtype=dtype,
    )
    if model_kind == "ctc":
        return CTCRecModel(encoder=encoder, nb_classes=nb_classes, dtype=dtype)
    if model_kind == "attn":
        return AttnRecModel(encoder=encoder, nb_classes=nb_classes, max_len=max_len, dtype=dtype)
    if model_kind == "seq_cls":
        if not getattr(encoder, "use_seq_cls_token", False):
            encoder = create_model(
                model_name, drop_rate=drop_rate, attn_drop_rate=attn_drop_rate,
                drop_path_rate=drop_path_rate, use_mean_pooling=use_mean_pooling,
                return_feat_map=True, use_seq_cls_token=True, max_seq_len=max_len,
                dtype=dtype,
            )
        return SeqClsTokenRecModel(encoder=encoder, nb_classes=nb_classes, dtype=dtype)
    decoder = create_decoder(decoder_name, nb_classes, max_len, dtype=dtype,
                             text_cond_vis=text_cond_vis)
    if decoder_name == "decoupled_tf_decoder":
        # the decoupled decoder needs class-query attention maps, which the
        # multi-label head supplies (reference wires cls_query_attn_maps
        # through RecModel when the decoupled decoder is selected)
        return SeqClsRecModel(encoder=encoder, decoder=decoder,
                              nb_classes=nb_classes, dtype=dtype)
    return RecModel(encoder=encoder, decoder=decoder, use_1d_attdec=use_1d_attdec,
                    use_feat_distill=use_feat_distill, dtype=dtype)
