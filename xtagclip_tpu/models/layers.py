"""Core transformer layers, TPU-first.

Semantics match the reference blocks (/root/reference/src/open_clip/transformer.py):
- LayerNorm always computes in float32 and casts back (reference LayerNormFp32 /
  LayerNorm collapse to one TPU-friendly rule: fp32 statistics under bf16 compute).
- QuickGELU (x * sigmoid(1.702x)) vs exact tanh GELU selectable.
- MultiheadAttention mirrors torch.nn.MultiheadAttention math: fused qkv
  projection, q scaled by head_dim**-0.5, additive float mask, fp32 softmax.

All matmuls run with preferred_element_type=float32 so the MXU accumulates in
fp32 regardless of bf16 inputs.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.ops import cls_split_attn, flash_attn, fused_attn_block

Dtype = Any


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def get_act_fn(name_or_fn) -> Callable:
    if callable(name_or_fn):
        return name_or_fn
    return {"gelu": gelu_exact, "quick_gelu": quick_gelu, "relu": jax.nn.relu}[
        name_or_fn
    ]


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, output cast back to input dtype."""

    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(orig_dtype)


def feature_take_indices(num_features: int, indices=None):
    """Absolute block indices to take (reference utils.py:94-133):
    None -> all, int -> last n, list -> explicit (negatives from the end)."""
    if indices is None:
        indices = num_features
    if isinstance(indices, int):
        assert 0 < indices <= num_features, (
            f"last-n ({indices}) out of range (1 to {num_features})")
        take = [num_features - indices + i for i in range(indices)]
    else:
        take = []
        for i in indices:
            idx = num_features + i if i < 0 else i
            assert 0 <= idx < num_features, (
                f"feature index {idx} out of range (0 to {num_features - 1})")
            take.append(idx)
    return take, max(take)


class LayerScale(nn.Module):
    init_values: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param(
            "gamma",
            lambda key, shape, dtype: jnp.full(shape, self.init_values, dtype),
            (dim,),
            self.param_dtype,
        )
        return x * gamma.astype(x.dtype)


def _dot(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def dot_product_attention(q, k, v, mask=None, scale=None, dropout_rate=0.0,
                          dropout_rng=None, deterministic=True):
    """q,k,v: [B, H, L, Dh]. mask: additive float, broadcastable to [B,H,Lq,Lk].

    Softmax is computed in float32 (TPU numerics rule); output cast to q dtype.
    """
    dh = q.shape[-1]
    scale = dh**-0.5 if scale is None else scale
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), probs


def fused_attention(q, k, v, num_heads, mask=None, dropout_rate=0.0,
                    dropout_rng=None, deterministic=True):
    """Multi-head attention over [B, L, E] streams.

    Fast path (no dropout): jax.nn.dot_product_attention in BLHD layout —
    the TPU-optimized fused lowering, no head transposes. Dropout falls back
    to the explicit einsum path.
    """
    b, lq, e = q.shape
    lk = k.shape[1]
    dh = e // num_heads
    if mask is not None:
        while mask.ndim < 4:
            mask = mask[None]
    if dropout_rate > 0.0 and not deterministic:
        out, _ = dot_product_attention(
            _split_heads(q, num_heads), _split_heads(k, num_heads),
            _split_heads(v, num_heads), mask=mask,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
        return _merge_heads(out)
    if cls_split_attn.supported(lq, lk, mask) and cls_split_attn.enabled():
        return cls_split_attn.cls_split_attention(
            q.reshape(b, lq, num_heads, dh),
            k.reshape(b, lk, num_heads, dh),
            v.reshape(b, lk, num_heads, dh),
            layout="blhd",
        ).reshape(b, lq, e)
    if flash_attn.enabled() and flash_attn.supported(lq, lk, mask, dh):
        return flash_attn.flash_mha(
            q.reshape(b, lq, num_heads, dh),
            k.reshape(b, lk, num_heads, dh),
            v.reshape(b, lk, num_heads, dh),
            layout="blhd",
        ).reshape(b, lq, e)
    return jax.nn.dot_product_attention(
        q.reshape(b, lq, num_heads, dh),
        k.reshape(b, lk, num_heads, dh),
        v.reshape(b, lk, num_heads, dh),
        bias=mask.astype(jnp.float32) if mask is not None else None,
    ).reshape(b, lq, e)


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


class _FusedQKVProj(nn.Module):
    """Fused [E, 3E] qkv projection, param layout identical to
    nn.Dense(3*e, name='in_proj'), but DISTINCT q/k/v tensors are projected
    through per-use kernel slices — a full in_proj per tensor would compute
    3x the needed columns (the TQN cross-attention case)."""

    e: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        e = self.e
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (e, 3 * e), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (3 * e,),
                          self.param_dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)

        def proj(x, lo, hi):
            return jnp.dot(x.astype(self.dtype), kernel[:, lo:hi]) + bias[lo:hi]

        if q is k and k is v:
            y = proj(q, 0, 3 * e)
            return jnp.split(y, 3, axis=-1)
        qh = proj(q, 0, e)
        if k is v:
            kv = proj(k, e, 3 * e)
            kh, vh = jnp.split(kv, 2, axis=-1)
        else:
            kh = proj(k, e, 2 * e)
            vh = proj(v, 2 * e, 3 * e)
        return qh, kh, vh


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (batch-first).

    Fused in_proj when q/k/v dims agree (kernel layout [E, 3E]; the torch
    converter transposes [3E, E] weights). Separate kdim/vdim path kept for
    AttentionalPooler parity.
    """

    num_heads: int
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    # scaled-cosine / per-head-scale options of the reference's custom
    # Attention (transformer.py:92-188): cosine similarity between L2-
    # normalized q/k in place of dot-product scores, scaled by a learned
    # per-head temperature exp(min(logit_scale, logit_scale_max)); and a
    # learned per-head output gain. No shipped config sets either (dead
    # upstream) — kept as API surface for checkpoint compatibility.
    scaled_cosine: bool = False
    scale_heads: bool = False
    logit_scale_max: float = math.log(1.0 / 0.01)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k=None, v=None, attn_mask=None, deterministic=True,
                 return_weights=False):
        k = q if k is None else k
        v = k if v is None else v
        e = q.shape[-1]
        kdim = self.kdim or k.shape[-1]
        vdim = self.vdim or v.shape[-1]
        qkv_same = kdim == e and vdim == e

        dense = lambda feats, name: nn.Dense(
            feats, name=name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        if qkv_same:
            qh, kh, vh = _FusedQKVProj(
                e=e, dtype=self.dtype, param_dtype=self.param_dtype,
                name="in_proj",
            )(q, k, v)
        else:
            qh = dense(e, "q_proj")(q)
            kh = dense(e, "k_proj")(k)
            vh = dense(e, "v_proj")(v)

        mask = None
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                mask = jnp.where(attn_mask, jnp.float32(-jnp.inf), 0.0)
            else:
                mask = attn_mask
            while mask.ndim < 4:
                mask = mask[None]

        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        if self.scaled_cosine or self.scale_heads:
            out, probs = self._cosine_attention(qh, kh, vh, mask, rng,
                                                deterministic)
            out = _merge_heads(out)
        elif return_weights or rng is not None:
            out, probs = dot_product_attention(
                _split_heads(qh, self.num_heads),
                _split_heads(kh, self.num_heads),
                _split_heads(vh, self.num_heads),
                mask=mask, dropout_rate=self.dropout,
                dropout_rng=rng, deterministic=deterministic,
            )
            out = _merge_heads(out)
        else:
            # fast path: BLHD layout (no head transposes) through the
            # TPU-optimized fused attention lowering; ragged cls sequences
            # (L = 128k+r, the ViT case) through the exact lane-aligned
            # split (ops/cls_split_attn.py) when enabled
            b, lq, _ = qh.shape
            lk = kh.shape[1]
            nh, dh = self.num_heads, e // self.num_heads
            if cls_split_attn.supported(lq, lk, mask) \
                    and cls_split_attn.enabled():
                out = cls_split_attn.cls_split_attention(
                    qh.reshape(b, lq, nh, dh),
                    kh.reshape(b, lk, nh, dh),
                    vh.reshape(b, lk, nh, dh),
                    layout="blhd",
                ).reshape(b, lq, e)
            elif flash_attn.enabled() and flash_attn.supported(lq, lk, mask,
                                                               dh):
                out = flash_attn.flash_mha(
                    qh.reshape(b, lq, nh, dh),
                    kh.reshape(b, lk, nh, dh),
                    vh.reshape(b, lk, nh, dh),
                    layout="blhd",
                ).reshape(b, lq, e)
            else:
                out = jax.nn.dot_product_attention(
                    qh.reshape(b, lq, nh, dh),
                    kh.reshape(b, lk, nh, dh),
                    vh.reshape(b, lk, nh, dh),
                    bias=mask.astype(jnp.float32)
                    if mask is not None else None,
                ).reshape(b, lq, e)
        out = dense(e, "out_proj")(out)
        if return_weights:
            # torch returns head-averaged weights by default
            return out, probs.mean(axis=1)
        return out

    def _cosine_attention(self, qh, kh, vh, mask, rng, deterministic):
        """Scaled-cosine (and/or per-head-scaled) attention — the reference
        Attention's logit_scale/head_scale branch (transformer.py:150-180).
        Scores in fp32; F.normalize semantics (x / max(||x||, 1e-12))."""
        qs = _split_heads(qh, self.num_heads).astype(jnp.float32)
        ks = _split_heads(kh, self.num_heads).astype(jnp.float32)
        vs = _split_heads(vh, self.num_heads)
        if self.scaled_cosine:
            norm = lambda t: t / jnp.maximum(  # noqa: E731
                jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
            logit_scale = self.param(
                "logit_scale",
                lambda _, shape, dt: jnp.full(shape, math.log(10.0), dt),
                (self.num_heads, 1, 1), self.param_dtype)
            temp = jnp.exp(jnp.minimum(
                logit_scale.astype(jnp.float32), self.logit_scale_max))
            scores = jnp.einsum("bhqd,bhkd->bhqk", norm(qs), norm(ks)) * temp
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) * (
                qs.shape[-1] ** -0.5)
        if mask is not None:
            scores = scores + mask.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        if rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, probs.shape)
            probs = probs * keep / (1.0 - self.dropout)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vs.dtype), vs,
                         preferred_element_type=jnp.float32)
        if self.scale_heads:
            head_scale = self.param(
                "head_scale", nn.initializers.ones,
                (self.num_heads, 1, 1), self.param_dtype)
            out = out * head_scale.astype(jnp.float32)
        return out.astype(qh.dtype), probs


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel lecun_normal, bias zeros)
    without applying them — lets MLP hand the raw weights to a fused kernel
    while keeping the exact nn.Dense checkpoint layout."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias


class MLP(nn.Module):
    """CLIP block MLP: c_fc -> act -> c_proj.

    XTAG_FUSED_MLP=1 opts into the Pallas fused kernel (ops/fused_mlp.py):
    standalone it beats XLA's lowering by 20-25% (hidden activation stays in
    VMEM), but in the full graph the pallas_call fusion barrier costs more
    than that saving (measured: 7,267 vs 7,806 img/s end-to-end), so the
    default is the plain path — see PERF.md. Param structure is identical
    either way (c_fc/c_proj kernels+biases)."""

    mlp_width: int
    act: Callable
    scale_fc: bool = False  # LayerNorm between act and c_proj (ref
    # CustomResidualAttentionBlock transformer.py:304 'ln')
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        d = x.shape[-1]
        if self.scale_fc:
            h = nn.Dense(self.mlp_width, name="c_fc", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
            h = LayerNorm(eps=self.norm_eps, name="ln")(self.act(h))
            return nn.Dense(d, name="c_proj", dtype=self.dtype,
                            param_dtype=self.param_dtype)(h)
        act_name = {"gelu_exact": "gelu", "quick_gelu": "quick_gelu"}.get(
            getattr(self.act, "__name__", ""))
        if (act_name is not None and self.dtype == jnp.bfloat16
                and os.environ.get("XTAG_FUSED_MLP")):
            from xtagclip_tpu.ops.fused_mlp import maybe_fused_mlp

            k1, b1 = _DenseParams(self.mlp_width, self.param_dtype,
                                  name="c_fc")(d)
            k2, b2 = _DenseParams(d, self.param_dtype, name="c_proj")(
                self.mlp_width)
            shape = x.shape
            out = maybe_fused_mlp(
                x.reshape(-1, d).astype(self.dtype),
                k1.astype(self.dtype), b1,
                k2.astype(self.dtype), b2, act_name,
            )
            return out.reshape(shape)
        h = nn.Dense(self.mlp_width, name="c_fc", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = self.act(h)
        return nn.Dense(d, name="c_proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(h)


class _LNParams(nn.Module):
    """Declares LayerNorm-compatible params (scale ones, bias zeros) without
    applying them — for handing raw weights to a fused kernel while keeping
    the exact LayerNorm checkpoint layout."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,),
                          self.param_dtype)
        return scale, bias


class _MHAParams(nn.Module):
    """MultiheadAttention-compatible param tree (in_proj [E,3E] + out_proj)
    without applying it — the fused-block kernel consumes the raw weights."""

    e: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kqkv, bqkv = _DenseParams(3 * self.e, self.param_dtype,
                                  name="in_proj")(self.e)
        kout, bout = _DenseParams(self.e, self.param_dtype,
                                  name="out_proj")(self.e)
        return kqkv, bqkv, kout, bout


class _MLPParams(nn.Module):
    """MLP-compatible param tree (c_fc + c_proj) without applying it — the
    fused MLP-half kernel consumes the raw weights."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, din: int, width: int):
        k1, b1 = _DenseParams(width, self.param_dtype, name="c_fc")(din)
        k2, b2 = _DenseParams(din, self.param_dtype, name="c_proj")(width)
        return k1, b1, k2, b2


class ResidualAttentionBlock(nn.Module):
    """Pre-norm transformer block (reference transformer.py:213-269).

    is_cross_attention adds an ln_1_kv over the key/value stream (the CoCa
    multimodal decoder's cross-attn block).

    XTAG_FUSED_BLOCK=1 opts the attention half (LN1 -> qkv -> MHA -> out
    proj -> residual) into one Pallas kernel (ops/fused_attn_block.py) on
    qualifying shapes — see PERF.md for the measured trade-off."""

    num_heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable = gelu_exact
    norm_eps: float = 1e-5
    is_cross_attention: bool = False
    # CustomResidualAttentionBlock surface (ref transformer.py:271-316):
    # scaled-cosine attention, per-head output gain, post-attention LN,
    # mid-MLP LN. All default off; no shipped config sets them.
    scale_cosine_attn: bool = False
    scale_heads: bool = False
    scale_attn: bool = False
    scale_fc: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, k_x=None, v_x=None, attn_mask=None,
                 deterministic=True):
        d = x.shape[-1]
        # eval/serving (deterministic=True) always qualifies for the fused
        # path; training (deterministic=False) qualifies only when a train
        # gate is opted in (fused_attn_block.train_path_enabled(), both
        # default OFF — measured losers in the full step, see the module
        # doc): XTAG_FUSED_TRAIN_BWD pairs the eval forward kernel with a
        # Pallas backward that recomputes the half in VMEM; XTAG_FUSED_TRAIN
        # saves q/k/v / the pre-activation as kernel residuals. Dropout is
        # rate-0 throughout this block, so deterministic changes no
        # semantics.
        # 2-D additive masks (the text tower's causal mask) ride into the
        # kernel; bool masks are converted; >2-D masks (CLIPA padding) stay
        # on the XLA path
        fmask = None
        fmask_ok = attn_mask is None
        if attn_mask is not None and attn_mask.ndim == 2:
            fmask_ok = True
            fmask = (jnp.where(attn_mask, jnp.float32(-jnp.inf), 0.0)
                     if attn_mask.dtype == jnp.bool_ else attn_mask)
        custom_opts = (self.scale_cosine_attn or self.scale_heads
                       or self.scale_attn or self.scale_fc)
        if ((deterministic or fused_attn_block.train_path_enabled())
                and not self.is_cross_attention and k_x is None and v_x is None
                and not custom_opts
                and fmask_ok and self.ls_init_value is None
                and self.dtype == jnp.bfloat16
                and fused_attn_block.enabled()
                and fused_attn_block.supported(
                    x.shape, self.num_heads, self.dtype,
                    None if fmask is None else fmask.shape)):
            g, bln = _LNParams(self.param_dtype, name="ln_1")(d)
            kqkv, bqkv, kout, bout = _MHAParams(
                e=d, param_dtype=self.param_dtype, name="attn")()
            x = fused_attn_block.fused_attn_half_auto(
                x.astype(self.dtype), g, bln,
                kqkv.astype(self.dtype), bqkv, kout.astype(self.dtype),
                bout, fmask, self.num_heads, self.norm_eps)
            mlp_width = int(d * self.mlp_ratio)
            act_name = {"gelu_exact": "gelu", "quick_gelu": "quick_gelu"
                        }.get(getattr(self.act, "__name__", ""))
            if (act_name is not None and fused_attn_block.supported_mlp(
                    x.shape, mlp_width, act_name, self.dtype)):
                g2, bln2 = _LNParams(self.param_dtype, name="ln_2")(d)
                k1, b1, k2, b2 = _MLPParams(
                    param_dtype=self.param_dtype, name="mlp")(d, mlp_width)
                return fused_attn_block.fused_mlp_half_auto(
                    x, g2, bln2, k1.astype(self.dtype), b1,
                    k2.astype(self.dtype), b2, act_name, self.norm_eps)
            mlp_out = MLP(mlp_width, self.act,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="mlp")(
                LayerNorm(eps=self.norm_eps, name="ln_2")(x))
            return x + mlp_out
        if self.is_cross_attention and k_x is not None:
            kv_norm = LayerNorm(eps=self.norm_eps, name="ln_1_kv")
            k_in = kv_norm(k_x)
            v_in = kv_norm(v_x if v_x is not None else k_x)
        else:
            k_in = v_in = None
        attn_out = MultiheadAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            scaled_cosine=self.scale_cosine_attn,
            scale_heads=self.scale_heads,
            param_dtype=self.param_dtype, name="attn",
        )(LayerNorm(eps=self.norm_eps, name="ln_1")(x), k_in, v_in,
          attn_mask=attn_mask, deterministic=deterministic)
        if self.scale_attn:
            # ln_attn precedes LayerScale and the residual add
            # (ref transformer.py:314: x + ls_1(ln_attn(attn(ln_1(x)))))
            attn_out = LayerNorm(eps=self.norm_eps, name="ln_attn")(attn_out)
        if self.ls_init_value is not None:
            attn_out = LayerScale(self.ls_init_value, name="ls_1")(attn_out)
        x = x + attn_out

        mlp_out = MLP(int(d * self.mlp_ratio), self.act, dtype=self.dtype,
                      scale_fc=self.scale_fc, norm_eps=self.norm_eps,
                      param_dtype=self.param_dtype, name="mlp")(
            LayerNorm(eps=self.norm_eps, name="ln_2")(x)
        )
        if self.ls_init_value is not None:
            mlp_out = LayerScale(self.ls_init_value, name="ls_2")(mlp_out)
        return x + mlp_out


class _ScanBlock(nn.Module):
    """One block inside nn.scan: (carry=x, broadcast mask) -> (x, None)."""

    num_heads: int
    mlp_ratio: float
    ls_init_value: Optional[float]
    act: Callable
    norm_eps: float
    deterministic: bool
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x, attn_mask):
        x = ResidualAttentionBlock(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value, act=self.act,
            norm_eps=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="block",
        )(x, attn_mask=attn_mask, deterministic=self.deterministic)
        return x, None


class Transformer(nn.Module):
    """Stack of residual attention blocks.

    remat=True wraps each block in jax.checkpoint (the reference's per-block
    torch.utils.checkpoint, transformer.py:409-412). scan_layers=True runs the
    stack as one lax.scan over stacked per-layer params — compile time becomes
    O(1) in depth (the ViT-H / slow-remote-compile lever); params live under
    'resblocks_scan/block' with a leading layer axis (see
    parallel/scan_params.py for stacking converters).
    """

    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable = gelu_exact
    norm_eps: float = 1e-5
    remat: bool = False
    scan_layers: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True,
                 return_intermediates=False):
        if self.scan_layers and not return_intermediates:
            body = _ScanBlock
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                length=self.layers,
            )(
                num_heads=self.heads, mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value, act=self.act,
                norm_eps=self.norm_eps, deterministic=deterministic,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="resblocks_scan",
            )
            x, _ = scanned(x, attn_mask)
            return x

        block_cls = ResidualAttentionBlock
        if self.remat:
            # argnums count from the bound module: x=1, k_x=2, v_x=3,
            # attn_mask=4, deterministic=5
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=(5,))
        intermediates = []
        for i in range(self.layers):
            blk = block_cls(
                num_heads=self.heads, mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value, act=self.act,
                norm_eps=self.norm_eps, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resblocks_{i}",
            )
            if self.remat:
                x = blk(x, None, None, attn_mask, deterministic)
            else:
                x = blk(x, attn_mask=attn_mask, deterministic=deterministic)
            if return_intermediates:
                intermediates.append(x)
        if return_intermediates:
            return x, intermediates
        return x


class AttentionalPooler(nn.Module):
    """Query-token attention pooling (reference transformer.py:190-211)."""

    d_model: int
    context_dim: int
    n_head: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        query = self.param(
            "query", nn.initializers.normal(1.0), (self.n_queries, self.d_model),
            self.param_dtype,
        )
        x = LayerNorm(name="ln_k")(x)
        q = LayerNorm(name="ln_q")(query.astype(x.dtype))
        q = jnp.broadcast_to(q[None], (x.shape[0],) + q.shape)
        return MultiheadAttention(
            num_heads=self.n_head, kdim=self.context_dim, vdim=self.context_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(q, x, x, deterministic=deterministic)


def patch_dropout(x, rng, prob: float, exclude_first_token: bool = True):
    """Randomly keep a subset of tokens (reference transformer.py:48-90).

    Static output shape: keeps ceil((1-prob)*N) tokens chosen by random topk.
    """
    if prob <= 0.0:
        return x
    if exclude_first_token:
        cls_tok, rest = x[:, :1], x[:, 1:]
    else:
        cls_tok, rest = None, x
    b, n, _ = rest.shape
    num_keep = max(1, int(n * (1.0 - prob)))
    scores = jax.random.normal(rng, (b, n))
    _, keep_idx = jax.lax.top_k(scores, num_keep)
    kept = jnp.take_along_axis(rest, keep_idx[..., None], axis=1)
    if cls_tok is not None:
        kept = jnp.concatenate([cls_tok, kept], axis=1)
    return kept
