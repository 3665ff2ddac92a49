"""Network building blocks (Flax), TPU-first re-expressions of the
reference's graph builders (reference: src/networks/blocks.cpp:32-208 and the
ConvNext block inlined in src/networks/networks.cpp:1154-1218).

Conventions:
- NHWC layout throughout (preferred conv layout on TPU).
- Blocks compute in `dtype` (bfloat16 by default) with float32 parameters
  and float32 BatchNorm statistics; XLA fuses BN+ReLU into the convs.
- Heads return LOGITS; softmax/temperature is applied by the caller
  (the reference bakes Softmax into the graph — equivalent capability,
  but logits compose better with masked softmax and loss functions).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNormalization with optional activation
    (reference: blocks.cpp conv_bn_relu/conv_bn)."""

    filters: int
    kernel: int = 3
    act: Any = nn.relu  # None for linear
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters, (self.kernel, self.kernel), use_bias=False, dtype=self.dtype
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, axis_name=None
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ResidualBlock(nn.Module):
    """conv3x3-BN-relu, conv3x3-BN, add, relu
    (reference: blocks.cpp:45-55 createResidualBlock)."""

    filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.filters, 3, nn.relu, self.dtype)(x, train)
        y = ConvBN(self.filters, 3, None, self.dtype)(y, train)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """Bottleneck residual blocks v1-v3 (reference: blocks.cpp:56-97)."""

    filters: int
    version: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.filters // 2
        if self.version == 1:
            y = ConvBN(half, 3, nn.relu, self.dtype)(x, train)
            y = ConvBN(self.filters, 3, None, self.dtype)(y, train)
        elif self.version == 2:
            y = ConvBN(half, 1, nn.relu, self.dtype)(x, train)
            y = ConvBN(half, 3, nn.relu, self.dtype)(y, train)
            y = ConvBN(half, 3, nn.relu, self.dtype)(y, train)
            y = ConvBN(self.filters, 1, None, self.dtype)(y, train)
        elif self.version == 3:
            y = ConvBN(half, 1, nn.relu, self.dtype)(x, train)
            y = ConvBN(half, 3, nn.relu, self.dtype)(y, train)
            y = ConvBN(self.filters, 3, None, self.dtype)(y, train)
        else:
            raise ValueError(f"bottleneck version {self.version}")
        return nn.relu(x + y)


class SqueezeExcitation(nn.Module):
    """Global-average-pool channel gating
    (reference: blocks.cpp:129-143 squeeze_and_excitation_block)."""

    filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x, axis=(1, 2))  # [B, C]
        z = nn.relu(nn.Dense(self.filters, dtype=self.dtype)(z))
        z = nn.sigmoid(nn.Dense(self.filters, dtype=self.dtype)(z))
        return x * z[:, None, None, :]


class ConvNextBlock(nn.Module):
    """Depthwise 7x7 + BN + pointwise expand/project with residual, followed
    by squeeze-excitation (reference: networks.cpp:1163-1181, the ConvNext
    block of ConvNextPVQMraw)."""

    filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.filters,
            (7, 7),
            feature_group_count=self.filters,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(nn.Conv(self.filters, (1, 1), dtype=self.dtype)(y))
        # reference fuses the projection of y with the residual into one
        # two-input Conv2D; projection + add is the same computation
        x = nn.Conv(self.filters, (1, 1), dtype=self.dtype)(y) + x
        return SqueezeExcitation(self.filters, self.dtype)(x)


class TransformerBlock(nn.Module):
    """Pre-norm MHA + FFN over board cells as tokens
    (reference: blocks.cpp:172-208 mha_pre_norm_block / ffn_pre_norm_block;
    RMSNorm + learned positional bias + residuals)."""

    embed: int
    heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, h * w, c),
        )
        y = nn.RMSNorm(dtype=self.dtype)(tokens) + pos.astype(self.dtype)
        y = nn.SelfAttention(
            num_heads=self.heads,
            qkv_features=self.embed,
            out_features=c,
            dtype=self.dtype,
        )(y)
        tokens = tokens + y
        z = nn.RMSNorm(dtype=self.dtype)(tokens)
        z = nn.relu(nn.Dense(self.embed, dtype=self.dtype)(z))
        z = nn.Dense(c, dtype=self.dtype)(z)
        tokens = tokens + z
        return tokens.reshape(b, h, w, c)


class PolicyHead(nn.Module):
    """conv-BN-relu then 1x1 conv to one logit per cell
    (reference: blocks.cpp:99-107; ConvNext variant networks.cpp:1185-1189
    uses kernel 1).  Returns logits [B, H, W]."""

    filters: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.filters, self.kernel, nn.relu, self.dtype)(x, train)
        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        return x[..., 0].astype(jnp.float32)


class ValueHead(nn.Module):
    """Global pooling + MLP to 3-way win/draw/loss logits
    (reference: blocks.cpp:108-118; ConvNext variant networks.cpp:1192-1198).
    Returns logits [B, 3]."""

    filters: int
    hidden: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = nn.relu(nn.Conv(self.filters, (1, 1), dtype=self.dtype)(x))
        v = jnp.mean(v, axis=(1, 2))
        v = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)(v)
        v = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(v)
        v = nn.relu(v)
        v = nn.Dense(3, dtype=self.dtype)(v)
        return v.astype(jnp.float32)


class ActionValuesHead(nn.Module):
    """Per-cell 3-way action-value logits [B, H, W, 3]
    (reference: blocks.cpp:119-127; ConvNext variant networks.cpp:1201-1205)."""

    filters: int
    kernel: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = ConvBN(self.filters, self.kernel, nn.relu, self.dtype)(x, train)
        q = nn.Conv(3, (1, 1), dtype=self.dtype)(q)
        return q.astype(jnp.float32)


class MovesLeftHead(nn.Module):
    """Distribution over 0..H*W-1 moves left, as logits [B, H*W]
    (reference: networks.cpp:1208-1215)."""

    buckets: int
    hidden: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = nn.relu(nn.Conv(32, (1, 1), dtype=self.dtype)(x))
        m = jnp.mean(m, axis=(1, 2))
        m = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)(m)
        m = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(m)
        m = nn.relu(m)
        m = nn.Dense(self.buckets, dtype=self.dtype)(m)
        return m.astype(jnp.float32)


def space_to_depth(x, block: int = 2):
    """[B,H,W,C] -> [B,ceil(H/b),ceil(W/b),b*b*C] with zero padding
    (reference: ml::SpaceToDepth used by the Unet trunks,
    networks.cpp:770-780)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % block, (-w) % block
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    h2, w2 = (h + ph) // block, (w + pw) // block
    x = x.reshape(b, h2, block, w2, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2, w2, block * block * c)


def depth_to_space(x, block: int, out_hw: tuple[int, int]):
    """Inverse of space_to_depth, cropped to `out_hw`
    (reference: ml::DepthToSpace(2, {h, w}))."""
    b, h2, w2, cc = x.shape
    c = cc // (block * block)
    x = x.reshape(b, h2, w2, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 * block, w2 * block, c)
    return x[:, : out_hw[0], : out_hw[1], :]


class UnetTrunk(nn.Module):
    """3-level U-Net trunk over the board: residual conv groups at full,
    1/2 and 1/4 resolution with space-to-depth down/up sampling and skip
    adds (reference: ConvUnet::create_network, networks.cpp:749-830).
    `bottleneck="transformer"` uses attention blocks at the coarsest level
    (reference: TransformerUnet, networks.cpp:846-920)."""

    filters: int
    bottleneck: str = "conv"  # conv | transformer
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = self.filters
        h, w = x.shape[1], x.shape[2]

        def group(x, f, n):
            y = x
            for _ in range(n):
                y = ConvBN(f, 3, nn.relu, self.dtype)(y, train)
            return x + y

        level0 = group(x, emb, 3)
        x = space_to_depth(level0, 2)
        x = ConvBN(2 * emb, 1, nn.relu, self.dtype)(x, train)
        level1 = group(x, 2 * emb, 3)
        x = space_to_depth(level1, 2)
        x = ConvBN(4 * emb, 1, nn.relu, self.dtype)(x, train)
        if self.bottleneck == "transformer":
            x = TransformerBlock(4 * emb, dtype=self.dtype)(x, train)
            x = TransformerBlock(4 * emb, dtype=self.dtype)(x, train)
        else:
            x = group(x, 4 * emb, 2)
            x = group(x, 4 * emb, 2)
        x = depth_to_space(x, 2, (level1.shape[1], level1.shape[2]))
        x = ConvBN(2 * emb, 1, nn.relu, self.dtype)(x, train)
        x = group(x + level1, 2 * emb, 3)
        x = depth_to_space(x, 2, (h, w))
        x = ConvBN(emb, 1, nn.relu, self.dtype)(x, train)
        return group(x + level0, emb, 3)


class MoEConvNextBlock(nn.Module):
    """ConvNext block whose pointwise MLP is a token-choice mixture of
    experts (reference: ConvNextMoE_PVQMraw last block,
    networks.cpp:1334-1369: Router(TOKEN_CHOICE) + MixtureOfExperts pair).

    TPU-native re-design: instead of gather/scatter token routing (serial
    on TPU), every expert runs densely and a hard top-1 gate (weighted by
    its routing probability, straight-through at train time) selects per
    cell — identical selection semantics, no capacity dropping."""

    filters: int
    experts: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.filters,
            (7, 7),
            feature_group_count=self.filters,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        x = y + x

        router_logits = nn.Conv(
            self.experts, (1, 1), use_bias=False, dtype=self.dtype
        )(x).astype(jnp.float32)
        probs = jax.nn.softmax(router_logits, axis=-1)  # [B,H,W,E]
        top = jax.nn.one_hot(
            jnp.argmax(probs, axis=-1), self.experts, dtype=probs.dtype
        )
        gate = (probs * top).astype(self.dtype)  # hard top-1, prob-weighted

        out = 0.0
        for e in range(self.experts):
            he = nn.relu(nn.Conv(self.filters, (1, 1), dtype=self.dtype)(x))
            oe = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(he)
            out = out + oe * gate[..., e : e + 1]
        x = out + x
        return SqueezeExcitation(self.filters, self.dtype)(x)
