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
    """Generalized attention plugin (ref: mmdet/models/plugins/
    generalized_attention.py (GeneralizedAttention); "An Empirical Study of
    Spatial Attention Mechanisms in Deep Networks").

    Full four-term energy, selected by ``attention_type`` (a 4-char
    bitstring, reference convention):
      [0] query-content & key-content          (q . k)
      [1] query-content & relative-position    (q . pos_embed)
      [2] key-content only (saliency bias)     (appr_bias . k)
      [3] relative-position only (geometric)   (geom_bias . pos_embed)
    Relative positions are encoded per axis with sin/cos features
    (wave_length 1000) and projected per head; the x/y position energies
    broadcast-add into the (h, w, h_kv, w_kv) energy before one softmax
    over all key positions — the reference's factorized form, which is
    also the TPU-friendly one (two small matmuls instead of a dense
    (hw, hk*wk) position tensor).  ``spatial_range`` (local masking) is
    unused by the empirical_attention configs (-1) and unsupported here.
    """

    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: float = 1.0
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = "1111"
    spatial_range: int = -1
    dtype: Any = jnp.float32

    def _position_feat(self, q_idx, k_idx, feat_dim):
        """sin/cos relative-position features, (Q, K, feat_dim)."""
        diff = (q_idx[:, None] - k_idx[None, :]) * self.position_magnitude
        n = feat_dim // 2
        dim_mat = jnp.power(1000.0, jnp.arange(n) / jnp.float32(n))
        ang = diff[:, :, None] / dim_mat[None, None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    @nn.compact
    def __call__(self, x):
        assert self.spatial_range == -1, "spatial_range masking unsupported"
        at = [t == "1" for t in self.attention_type]
        b, h, w, c = x.shape
        qk_dim = max(c // self.num_heads, 1)
        v_dim = max(c // self.num_heads, 1)
        nh = self.num_heads
        pe_dim = self.position_embedding_dim if \
            self.position_embedding_dim > 0 else c

        x_q = x[:, ::self.q_stride, ::self.q_stride, :]
        x_kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        hq, wq = x_q.shape[1:3]
        hk, wk = x_kv.shape[1:3]

        q = k = None
        if at[0] or at[1]:
            q = nn.Conv(nh * qk_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name="query_conv")(x_q)
            q = q.reshape(b, hq, wq, nh, qk_dim) * (qk_dim ** -0.5)
        if at[0] or at[2]:
            k = nn.Conv(nh * qk_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name="key_conv")(x_kv)
            k = k.reshape(b, hk, wk, nh, qk_dim)
        v = nn.Conv(nh * v_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="value_conv")(x_kv)
        v = v.reshape(b, hk, wk, nh, v_dim)

        # energy (b, nh, hq, wq, hk, wk), accumulated term by term
        energy = jnp.zeros((b, nh, hq, wq, hk, wk), jnp.float32)
        if at[0]:
            energy = energy + jnp.einsum("byxhd,bvuhd->bhyxvu",
                                         q.astype(jnp.float32),
                                         k.astype(jnp.float32))
        if at[2]:
            appr_bias = self.param("appr_bias",
                                   nn.initializers.normal(0.01),
                                   (nh, qk_dim)) * (qk_dim ** -0.5)
            e = jnp.einsum("hd,bvuhd->bhvu", appr_bias,
                           k.astype(jnp.float32))
            energy = energy + e[:, :, None, None, :, :]

        if at[1] or at[3]:
            # per-axis relative position embeddings, projected per head
            q_y = jnp.arange(hq) * self.q_stride
            q_x = jnp.arange(wq) * self.q_stride
            k_y = jnp.arange(hk) * self.kv_stride
            k_x = jnp.arange(wk) * self.kv_stride
            pf_y = self._position_feat(q_y, k_y, pe_dim)  # (hq, hk, pe)
            pf_x = self._position_feat(q_x, k_x, pe_dim)  # (wq, wk, pe)
            geom_y = nn.Dense(nh * qk_dim, use_bias=False,
                              dtype=self.dtype, name="appr_geom_fc_y")(
                pf_y.astype(self.dtype)).reshape(hq, hk, nh, qk_dim)
            geom_x = nn.Dense(nh * qk_dim, use_bias=False,
                              dtype=self.dtype, name="appr_geom_fc_x")(
                pf_x.astype(self.dtype)).reshape(wq, wk, nh, qk_dim)
            geom_y = geom_y.astype(jnp.float32)
            geom_x = geom_x.astype(jnp.float32)
            if at[1]:
                e_y = jnp.einsum("byxhd,yvhd->bhyxv",
                                 q.astype(jnp.float32), geom_y)
                e_x = jnp.einsum("byxhd,xuhd->bhyxu",
                                 q.astype(jnp.float32), geom_x)
                energy = energy + e_y[..., :, None] + e_x[..., None, :]
            if at[3]:
                geom_bias = self.param("geom_bias",
                                       nn.initializers.normal(0.01),
                                       (nh, qk_dim)) * (qk_dim ** -0.5)
                e_y = jnp.einsum("hd,yvhd->hyv", geom_bias, geom_y)
                e_x = jnp.einsum("hd,xuhd->hxu", geom_bias, geom_x)
                energy = energy + e_y[None, :, :, None, :, None] \
                    + e_x[None, :, None, :, None, :]

        attn = jax.nn.softmax(energy.reshape(b, nh, hq, wq, hk * wk),
                              axis=-1)
        out = jnp.einsum("bhyxk,bkhd->byxhd", attn,
                         v.reshape(b, hk * wk, nh, v_dim).astype(
                             jnp.float32))
        out = out.reshape(b, hq, wq, nh * v_dim).astype(x.dtype)
        if self.q_stride > 1:
            out = jnp.repeat(jnp.repeat(out, self.q_stride, 1),
                             self.q_stride, 2)[:, :h, :w]
        out = nn.Conv(c, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      name="proj_conv")(out)
        return x + out
