"""Precomputed-prompt serving for the XTag pipeline.

The XTag forward runs the TEXT tower over each image's pseudo-prompt
(reference model.py:513-561) — ~6 GFLOP/image on ViT-B-32, nearly half the
pipeline's FLOPs — yet the prompt space is FINITE: templates x classes x
tag-combos, all known at checkpoint-load time. This module embeds every
prompt once (the pooled fusion query `text_tokens.mean(axis=1)` is all the
i2t direction needs: [C, K, D] ~ 7 MB bf16 for the scar space) and the
serving step becomes encode_image -> tag head -> TABLE GATHER -> TQN
fusion over all C classes: the per-image text tower disappears, and the
fusion scores every class in one shot ([B, C]) instead of the train path's
in-batch [B, B].

The reference cannot precompute this at all — it re-tokenizes and re-encodes
pseudo-prompts on host inside forward() every batch (model.py:545).

Equivalence with the on-the-fly path is pinned by tests/test_serving.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xtagclip_tpu.models.clip import combo_index


def precompute_prompt_features(bundle, prompt_table, template_id: int = 0,
                               batch_size: int = 512):
    """Encode every (class, combo) pseudo-prompt of one template.

    prompt_table: [T, C, K, ctx] int32 (PromptTable(...).table).
    Returns the pooled fusion queries as a [C, K, D] array (the mean over
    the projected token sequence, exactly the train path's `text_g`).
    """
    table = np.asarray(prompt_table)
    _, n_cls, n_combos, ctx = table.shape
    rows = table[template_id].reshape(-1, ctx)  # [C*K, ctx]

    @jax.jit
    def encode(params, tokens):
        _, token_seq = bundle.module.apply(
            bundle._variables(params), tokens, True,
            method=bundle.module.encode_text,
        )
        return token_seq.mean(axis=1)

    feats = []
    n = rows.shape[0]
    for start in range(0, n, batch_size):
        chunk = rows[start:start + batch_size]
        if chunk.shape[0] < batch_size:  # pad to the jitted static shape
            pad = np.zeros((batch_size - chunk.shape[0], ctx), chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        feats.append(np.asarray(
            encode(bundle.params, jnp.asarray(chunk))))
    feats = np.concatenate(feats)[:n]
    return jnp.asarray(feats.reshape(n_cls, n_combos, -1))


def serve_body(m, images, table):
    """The precomputed-prompt classify program, as a flax `method=` body:
    images -> (img_feat, global tag picks, [B, C] fusion logits).

    The fusion logits follow the train path's i2t direction (queries =
    per-class pooled prompt features for the image's OWN tag combo, memory
    = [global ; local] image tokens, models/clip.py:296-299). Shared by
    make_xtag_serve_step (live serving) and convert/serving.py's
    export_serve_classify (the AOT artifact) so the two can never drift.
    """
    img_feat, tokens = m.encode_image(images, normalize=True,
                                      deterministic=True)
    tag_logits = m.tag_forward(tokens, deterministic=True)
    tag_local, tag_global = m.prepare_tag_indices(tag_logits)
    combo = combo_index(tag_local)                 # [B]
    queries = jnp.swapaxes(table[:, combo], 0, 1)  # [B, C, D]
    image_g = tokens.mean(axis=1)
    memory = jnp.concatenate([image_g[:, None], tokens], axis=1)
    i2t = m.fusion_model(memory, queries, deterministic=True)[..., 0]
    return img_feat, tag_global, i2t


def make_xtag_serve_step(bundle, text_g_table):
    """One jitted program: images -> (img_feat, tag picks, [B, C] fusion).

    text_g_table: [C, K, D] from precompute_prompt_features.
    """
    module = bundle.module
    if not getattr(module, "use_fusion", False):
        raise ValueError(
            "make_xtag_serve_step needs a model built with use_fusion=True "
            "(and use_tagging=True) — pass them to create_model")
    extra = dict(bundle.extra_variables or {})

    @jax.jit
    def step(params, images, table):
        return module.apply({"params": params, **extra}, images, table,
                            method=serve_body)

    def serve(params, images):
        return step(params, images, text_g_table)

    return serve
