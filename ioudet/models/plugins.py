"""Backbone plugins (ref: mmdet/models/plugins/ (NonLocal2D,
GeneralizedAttention), mmdet/ops/gcb/context_block.py (ContextBlock)).

All three are attention-ish feature refiners injectable into ResNet stages;
on TPU they are plain matmul/softmax compositions (MXU-native — no custom
kernels were ever needed here, the reference's gcb C++ is just a fused
broadcast)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """Global-context block (GCNet).  ratio shrinks the bottleneck."""

    ratio: float = 1.0 / 16
    pooling_type: str = "att"
    fusion_types: Tuple[str, ...] = ("channel_add",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            attn = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_mask")(x)
            attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
            context = jnp.einsum("bnc,bnk->bkc", x.reshape(b, h * w, c), attn)
        else:
            context = x.mean(axis=(1, 2), keepdims=False)[:, None, :]
        context = context.reshape(b, 1, 1, c)
        out = x
        for fusion in self.fusion_types:
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f"{fusion}_down")(context)
            t = nn.LayerNorm(dtype=self.dtype, name=f"{fusion}_ln")(t)
            t = nn.relu(t)
            t = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"{fusion}_up")(t)
            if fusion == "channel_add":
                out = out + t
            else:  # channel_mul
                out = out * jax.nn.sigmoid(t)
        return out


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block (ref: NonLocal2D)."""

    reduction: int = 2
    use_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        q = theta.reshape(b, h * w, inter)
        k = phi.reshape(b, h * w, inter)
        v = g.reshape(b, h * w, inter)
        attn = jnp.einsum("bqc,bkc->bqk", q, k)
        if self.use_scale:
            attn = attn / jnp.sqrt(jnp.float32(inter))
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_out")(y)
        return x + y


class GeneralizedAttention(nn.Module):
    """Simplified generalized-attention plugin (ref: GeneralizedAttention):
    content-content attention term with multi-head projection."""

    num_heads: int = 8
    kv_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        hk, wk = kv.shape[1:3]
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="key")(kv)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(kv)
        q = q.reshape(b, h * w, self.num_heads, head_dim)
        k = k.reshape(b, hk * wk, self.num_heads, head_dim)
        v = v.reshape(b, hk * wk, self.num_heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(head_dim))
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="proj")(y)
        return x + y
