"""CLIP assembly with XTag additions (tag head, pseudo-prompts, TQN fusion).

Mirrors the reference CLIP/CustomTextCLIP (/root/reference/src/open_clip/model.py:227-936)
with one deliberate re-design: the reference tokenizes pseudo-prompts ON HOST
inside forward() (model.py:513-548), an untraceable host/device sync. Here the
finite prompt space (one tag choice per category x class word x template) is
pre-tokenized once into a lookup table, and forward() does a pure jnp.take —
the entire train step stays inside one jit.

Tag category layout (model.py:354-383): sizes [3,4,3,4,4,4] over 22 tags; the
score for tag i is sigmoid(logits[i]) + sigmoid(logits[22+i]) (paired queries).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.tag_head import TagBertHead
from xtagclip_tpu.models.tqn import TQNModel

Dtype = Any

TAG_CATEGORY_SIZES = (3, 4, 3, 4, 4, 4)
TAG_CATEGORY_OFFSETS = tuple(
    int(np.cumsum((0,) + TAG_CATEGORY_SIZES)[i]) for i in range(len(TAG_CATEGORY_SIZES))
)
NUM_TAGS = sum(TAG_CATEGORY_SIZES)  # 22


def combo_index(tag_local_idx: jnp.ndarray) -> jnp.ndarray:
    """Mixed-radix index of per-category choices [.., 6] -> scalar per row."""
    idx = tag_local_idx[..., 0]
    for i in range(1, len(TAG_CATEGORY_SIZES)):
        idx = idx * TAG_CATEGORY_SIZES[i] + tag_local_idx[..., i]
    return idx


def num_combos() -> int:
    return int(np.prod(TAG_CATEGORY_SIZES))  # 2304


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class CLIP(nn.Module):
    """Two-tower CLIP + tag head + TQN fusion.

    `visual` / `text` are module *instances* passed in by the factory (any
    tower satisfying the (pooled, tokens) return contract works: ViT, timm-less
    ResNet, HF BERT text tower...).
    """

    visual: nn.Module
    text: nn.Module
    embed_dim: int
    init_logit_scale: float = float(np.log(1 / 0.07))
    init_logit_bias: Optional[float] = None
    nonscalar_logit_scale: bool = False
    use_tagging: bool = False
    use_fusion: bool = False
    tag_hidden_size: int = 768
    tag_heads: int = 4
    tag_layers: int = 2
    tag_intermediate_size: int = 3072
    num_tags: int = NUM_TAGS
    # reference TQN_Model() hardcodes d_model=512 regardless of the towers
    # (CAR_heads/TQN_model.py:19-24) — use_fusion therefore only works when
    # embed_dim == fusion_dim == text width, in the reference and here alike;
    # fusion_dim makes the constraint configurable instead of implicit
    fusion_dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        lshape = (1,) if self.nonscalar_logit_scale else ()
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape, dtype: jnp.full(shape, self.init_logit_scale, dtype),
            lshape, self.param_dtype,
        )
        if self.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias",
                lambda key, shape, dtype: jnp.full(shape, self.init_logit_bias, dtype),
                lshape, self.param_dtype,
            )
        else:
            self.logit_bias = None

        self.tag_head = TagBertHead(
            num_layers=self.tag_layers, hidden_size=self.tag_hidden_size,
            num_heads=self.tag_heads,
            intermediate_size=self.tag_intermediate_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.tag_labels = nn.Embed(
            self.num_tags * 2, self.tag_hidden_size, name="tag_labels",
            dtype=self.dtype, param_dtype=self.param_dtype,
            embedding_init=nn.initializers.normal(1.0),
        )
        self.tag_fc = nn.Dense(1, name="tag_fc", dtype=self.dtype,
                               param_dtype=self.param_dtype)
        if self.use_fusion and self.embed_dim != self.fusion_dim:
            raise ValueError(
                f"use_fusion requires embed_dim == fusion_dim "
                f"({self.embed_dim} != {self.fusion_dim}); the reference has "
                "the same implicit constraint (TQN_Model d_model=512). Set "
                "fusion_dim in the model kwargs for non-512 towers.")
        self.fusion_model = TQNModel(
            embed_dim=self.fusion_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="fusion_model",
        )

    # ---- tower wrappers -------------------------------------------------
    def encode_image(self, image, normalize: bool = False, deterministic=True):
        pooled, tokens = self.visual(image, deterministic=deterministic)
        return (l2_normalize(pooled) if normalize else pooled), tokens

    def encode_text(self, text, normalize: bool = False, deterministic=True):
        projected, seq = self.text(text, deterministic=deterministic)
        return (l2_normalize(projected) if normalize else projected), seq

    # ---- XTag pieces -----------------------------------------------------
    def tag_forward(self, image_tokens, deterministic=True):
        """Cross-attend the 2*num_tags label queries over image tokens ->
        [B, 2*num_tags] logits (reference model.py:337-352)."""
        b = image_tokens.shape[0]
        label_embed = jnp.broadcast_to(
            self.tag_labels.embedding.astype(self.dtype)[None],
            (b, self.num_tags * 2, self.tag_hidden_size),
        )
        out = self.tag_head(
            label_embed, image_tokens, deterministic=deterministic
        )
        return self.tag_fc(out)[..., 0]

    def prepare_tag_indices(self, tag_logits):
        """Per-category argmax of paired sigmoid scores -> local [B,6] and
        global [B,6] tag indices (reference prepare_control_words)."""
        scores = jax.nn.sigmoid(tag_logits[:, : self.num_tags]) + jax.nn.sigmoid(
            tag_logits[:, self.num_tags :]
        )
        locals_ = []
        for size, off in zip(TAG_CATEGORY_SIZES, TAG_CATEGORY_OFFSETS):
            locals_.append(jnp.argmax(scores[:, off : off + size], axis=-1))
        local_idx = jnp.stack(locals_, axis=-1)
        global_idx = local_idx + jnp.asarray(TAG_CATEGORY_OFFSETS)[None]
        return local_idx, global_idx

    def get_logits(self, image, text):
        (image_features, _) = self.encode_image(image, normalize=True)
        (text_features, _) = self.encode_text(text, normalize=True)
        scale = jnp.exp(self.logit_scale)
        image_logits = scale * image_features @ text_features.T
        if self.logit_bias is not None:
            image_logits = image_logits + self.logit_bias
        return image_logits, image_logits.T

    def forward_intermediates(
        self,
        image=None,
        text=None,
        image_indices=None,
        text_indices=None,
        normalize: bool = True,
        normalize_intermediates: bool = False,
        intermediates_only: bool = False,
        image_output_fmt: str = "NCHW",
        image_output_extra_tokens: bool = False,
        text_output_fmt: str = "NLC",
        text_output_extra_tokens: bool = False,
        output_logits: bool = False,
        output_logit_scale_bias: bool = False,
        deterministic: bool = True,
    ):
        """Per-block intermediate features from either/both towers
        (reference model.py:395-456 contract). Requires unrolled CLIP towers
        (VisionTransformer/TextTransformer with scan_layers=False)."""
        del text_output_fmt  # NLC is the only text layout (reference parity)
        output = {}
        if intermediates_only:
            normalize = False
            output_logits = False
        if output_logits:
            assert image is not None and text is not None, (
                "both image and text inputs are required to compute logits")

        if image is not None:
            output.update(self.visual(
                image, deterministic=deterministic,
                intermediates_cfg={
                    "indices": image_indices,
                    "normalize_intermediates": normalize_intermediates,
                    "intermediates_only": intermediates_only,
                    "output_fmt": image_output_fmt,
                    "output_extra_tokens": image_output_extra_tokens,
                },
            ))
            if "image_features" in output and normalize:
                output["image_features"] = l2_normalize(
                    output["image_features"])
        if text is not None:
            output.update(self.text(
                text, deterministic=deterministic,
                intermediates_cfg={
                    "indices": text_indices,
                    "normalize_intermediates": normalize_intermediates,
                    "intermediates_only": intermediates_only,
                    "output_extra_tokens": text_output_extra_tokens,
                },
            ))
            if "text_features" in output and normalize:
                output["text_features"] = l2_normalize(output["text_features"])

        scale = jnp.exp(self.logit_scale)
        if output_logits:
            image_logits = scale * (
                output["image_features"] @ output["text_features"].T
            )
            if self.logit_bias is not None:
                image_logits = image_logits + self.logit_bias
            output["image_logits"] = image_logits
            output["text_logits"] = image_logits.T
        if output_logit_scale_bias:
            output["logit_scale"] = scale
            if self.logit_bias is not None:
                output["logit_bias"] = self.logit_bias
        return output

    # ---- full forward ----------------------------------------------------
    def __call__(
        self,
        image,
        text=None,
        prompt_table=None,    # [n_templates, n_classes, n_combos, ctx] int32
        class_ids=None,       # [B] int32 into prompt_table's class axis
        template_id=0,        # scalar int (host picks; 'total' = random choice)
        deterministic: bool = True,
        visual_deterministic: Optional[bool] = None,
    ):
        # visual_deterministic=True runs the image tower in eval mode during a
        # train-mode forward: BatchNorm normalizes with (and does not update)
        # running statistics — the reference's FrozenBatchNorm2d semantics
        # under --lock-image-freeze-bn-stats (reference utils.py:11-49).
        vd = deterministic if visual_deterministic is None else visual_deterministic
        image_features, image_tokens = self.encode_image(
            image, normalize=True, deterministic=vd
        )
        tag_logits = self.tag_forward(image_tokens, deterministic=deterministic)
        tag_local, tag_global = self.prepare_tag_indices(tag_logits)

        if self.use_tagging and prompt_table is not None:
            assert class_ids is not None, (
                "use_tagging forward needs class_ids alongside prompt_table"
            )
            combo = combo_index(tag_local)
            prompts = prompt_table[template_id, class_ids, combo]  # [B, ctx]
            text_features, text_tokens = self.encode_text(
                prompts, normalize=True, deterministic=deterministic
            )
        elif text is not None:
            text_features, text_tokens = self.encode_text(
                text, normalize=True, deterministic=deterministic
            )
        else:
            text_features, text_tokens = None, None

        out = {
            "image_features": image_features,
            "text_features": text_features,
            "logit_scale": jnp.exp(self.logit_scale),
            "tag_logits": tag_logits,
            "tag_indices": tag_global,
            "i2t_cls": None,
            "t2i_cls": None,
            "text_features_l": None,
            "text_features_g": None,
            "image_features_l": None,
            "image_features_g": None,
        }
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias

        if self.use_fusion and text_features is not None:
            text_l = text_tokens
            text_g = text_tokens.mean(axis=1)
            image_l = image_tokens
            image_g = image_tokens.mean(axis=1)
            i2t = self.fusion_model(
                jnp.concatenate([image_g[:, None], image_l], axis=1), text_g,
                deterministic=deterministic,
            )[..., 0]
            t2i = self.fusion_model(
                jnp.concatenate([text_g[:, None], text_l], axis=1), image_g,
                deterministic=deterministic,
            )[..., 0]
            out.update(
                i2t_cls=i2t, t2i_cls=t2i, text_features_l=text_l,
                text_features_g=text_g, image_features_l=image_l,
                image_features_g=image_g,
            )
        return out


# The reference maintains CLIP and CustomTextCLIP as two classes differing
# only in how the text tower is attached (model.py:227-590 vs :593-936); here
# a single assembly accepts any text tower module (TextTransformer, HF BERT
# family, mT5, NLLB), so the custom-text name is the same class.
CustomTextCLIP = CLIP
