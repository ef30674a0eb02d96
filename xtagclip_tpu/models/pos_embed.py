"""2-D sin-cos position embeddings and pos-embed resizing.

Numerically equivalent to reference pos_embed.py:20-72 (sin-cos) and
model.py:1065-1128 (bicubic/linear resize on checkpoint load), implemented on
numpy/jax.image instead of torch.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False):
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def resize_vision_pos_embed(
    pos: np.ndarray,
    new_grid: tuple[int, int],
    num_prefix_tokens: int = 1,
    antialias: bool = True,
) -> np.ndarray:
    """Bicubic-resize a [L, D] learnable vision pos-embed to a new token grid.

    Matches the reference resize on --force-image-size / checkpoint load
    (model.py:1065-1096) using jax.image.resize.
    """
    pos = np.asarray(pos)
    total, dim = pos.shape
    prefix, grid_part = pos[:num_prefix_tokens], pos[num_prefix_tokens:]
    old_side = int(math.sqrt(grid_part.shape[0]))
    assert old_side * old_side == grid_part.shape[0], "non-square source grid"
    if (old_side, old_side) == tuple(new_grid):
        return pos
    grid_img = grid_part.reshape(old_side, old_side, dim)
    resized = jax.image.resize(
        grid_img, (new_grid[0], new_grid[1], dim), method="bicubic",
        antialias=antialias,
    )
    resized = np.asarray(resized).reshape(new_grid[0] * new_grid[1], dim)
    return np.concatenate([prefix, resized], axis=0).astype(pos.dtype)


def resize_text_pos_embed(pos: np.ndarray, new_len: int) -> np.ndarray:
    """Linear-resize a [L, D] text pos-embed (reference model.py:1099-1128)."""
    pos = np.asarray(pos)
    old_len, dim = pos.shape
    if old_len == new_len:
        return pos
    out = jax.image.resize(pos, (new_len, dim), method="linear", antialias=False)
    return np.asarray(out).astype(pos.dtype)
