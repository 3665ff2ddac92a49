"""The network zoo: policy/value(/q/moves-left) models for search + training.

The reference ships ~23 concrete architectures
(reference: include/alphagomoku/networks/networks.hpp:16-250); they are all
combinations of {trunk} x {input planes: 32 feature / 8 raw} x {output heads:
p, v, q, m, s}.  We factor that product into ONE parametric Flax module
(`AGNetwork`) plus a name registry covering every reference architecture name,
so `create_network("ResnetPV", ...)` works like the reference factory
(reference: AGNetwork.hpp:114 createAGNetwork).

Outputs are logits in a `NetOutput`; `postprocess` converts to the
probability-space quantities the search consumes (policy over legal cells,
3-way value, per-cell q, expected moves left).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import blocks as B


class NetOutput(NamedTuple):
    """Raw head outputs (logits, float32)."""

    policy_logits: jax.Array  # [B, H, W]
    value_logits: jax.Array  # [B, 3] (win, draw, loss) from side-to-move view
    q_logits: jax.Array | None  # [B, H, W, 3]
    moves_left_logits: jax.Array | None  # [B, H*W]
    soft_policy_logits: jax.Array | None  # [B, H, W] (T=4 head, 's' config)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture description (reference: TrainingConfig blocks /
    filters, utils/configs.hpp TrainingConfig)."""

    trunk: str = "convnext"  # resnet | bottleneck_v1|v2|v3 | convnext
    blocks: int = 6
    filters: int = 64
    heads: str = "pvqm"  # subset of "pvqms", p and v mandatory
    raw_input: bool = True  # 8 raw planes instead of 32 feature planes
    input_kernel: int = 5
    dtype: Any = jnp.bfloat16

    @property
    def input_planes(self) -> int:
        return 8 if self.raw_input else 32


class AGNetwork(nn.Module):
    """One parametric trunk+heads module covering the reference zoo.

    Input: [B, H, W, C] planes (C = 8 raw or 32 feature planes, already
    unpacked from the uint32 feature map by patterns.features).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> NetOutput:
        cfg = self.cfg
        h, w = x.shape[1], x.shape[2]
        x = x.astype(cfg.dtype)
        # input block (reference: blocks.cpp:32-38 conv5x5 + BN-relu)
        x = B.ConvBN(cfg.filters, cfg.input_kernel, nn.relu, cfg.dtype)(x, train)

        if cfg.trunk in ("unet", "unet_transformer"):
            # fixed 3-level structure: cfg.blocks does not apply
            # (reference: ConvUnet/TransformerUnet, networks.cpp:749-920)
            x = B.UnetTrunk(
                cfg.filters,
                bottleneck="transformer" if cfg.trunk.endswith("transformer") else "conv",
                dtype=cfg.dtype,
            )(x, train)
        else:
            for i in range(cfg.blocks):
                if cfg.trunk == "resnet":
                    x = B.ResidualBlock(cfg.filters, cfg.dtype)(x, train)
                elif cfg.trunk.startswith("bottleneck"):
                    v = int(cfg.trunk[-1])
                    x = B.BottleneckBlock(cfg.filters, v, cfg.dtype)(x, train)
                elif cfg.trunk == "convnext_moe":
                    # the reference puts the MoE in the LAST block only
                    # (ConvNextMoE_PVQMraw, networks.cpp:1334-1369)
                    if i == cfg.blocks - 1:
                        x = B.MoEConvNextBlock(cfg.filters, dtype=cfg.dtype)(x, train)
                    else:
                        x = B.ConvNextBlock(cfg.filters, cfg.dtype)(x, train)
                elif cfg.trunk == "convnext":
                    x = B.ConvNextBlock(cfg.filters, cfg.dtype)(x, train)
                elif cfg.trunk == "transformer":
                    x = B.TransformerBlock(cfg.filters, dtype=cfg.dtype)(x, train)
                else:
                    raise ValueError(f"unknown trunk {cfg.trunk}")

        pk = 1 if cfg.trunk == "convnext" else 3
        policy = B.PolicyHead(cfg.filters, pk, cfg.dtype)(x, train)
        value = B.ValueHead(cfg.filters, min(256, 2 * cfg.filters), cfg.dtype)(x, train)
        q = (
            B.ActionValuesHead(cfg.filters, pk, cfg.dtype)(x, train)
            if "q" in cfg.heads
            else None
        )
        m = (
            B.MovesLeftHead(h * w, 128, cfg.dtype)(x, train)
            if "m" in cfg.heads
            else None
        )
        s = (
            B.PolicyHead(cfg.filters, pk, cfg.dtype)(x, train)
            if "s" in cfg.heads
            else None
        )
        return NetOutput(policy, value, q, m, s)


# ---------------------------------------------------------------------------
# Registry: reference architecture names -> ModelConfig fields
# (reference: networks.hpp:16-250; LoC-heavy zoo collapsed to a config map)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, dict] = {
    # resnet family (reference: networks.cpp:71-171, 360-570)
    "ResnetPV": dict(trunk="resnet", heads="pv", raw_input=False),
    "ResnetPVraw": dict(trunk="resnet", heads="pv", raw_input=True),
    "ResnetPVQ": dict(trunk="resnet", heads="pvq", raw_input=False),
    "ResnetPVQraw": dict(trunk="resnet", heads="pvq", raw_input=True),
    "ResnetOld": dict(trunk="resnet", heads="pv", raw_input=False),
    "ResnetPVraw_v0": dict(trunk="resnet", heads="pv", raw_input=True),
    "ResnetPVraw_v1": dict(trunk="resnet", heads="pv", raw_input=True),
    "ResnetPVraw_v2": dict(trunk="resnet", heads="pv", raw_input=True),
    # bottleneck family (reference: networks.cpp:174-357, 920-1010)
    "BottleneckPV": dict(trunk="bottleneck_v2", heads="pv", raw_input=False),
    "BottleneckPVraw": dict(trunk="bottleneck_v2", heads="pv", raw_input=True),
    # Broadcast/Pooling variants: in the REFERENCE these are bottleneck_v3
    # trunks whose broadcast block is commented out and whose pooling block
    # is a no-op (blocks.cpp:40-43, networks.cpp:254-310) — the v3 trunk IS
    # the whole difference, faithfully reproduced here
    "BottleneckBroadcastPVraw": dict(trunk="bottleneck_v3", heads="pv", raw_input=True),
    "BottleneckPoolingPVraw": dict(trunk="bottleneck_v3", heads="pv", raw_input=True),
    "BottleneckPVQ": dict(trunk="bottleneck_v2", heads="pvq", raw_input=False),
    "BottleneckPVUM": dict(trunk="bottleneck_v2", heads="pvm", raw_input=False),
    # convnext family (reference: networks.cpp:1012-1440)
    "ConvNextPVraw": dict(trunk="convnext", heads="pv", raw_input=True),
    "ConvNextPVQraw": dict(trunk="convnext", heads="pvq", raw_input=True),
    "ConvNextPVQMraw": dict(trunk="convnext", heads="pvqm", raw_input=True),
    "ConvNextPVQMSraw": dict(trunk="convnext", heads="pvqms", raw_input=True),
    "ConvNextMoE_PVQMraw": dict(trunk="convnext_moe", heads="pvqm", raw_input=True),
    # transformer family (reference: networks.cpp:571-920 Transformer_v2;
    # windowed attention approximated by full attention over the <=400
    # board tokens)
    "Transformer_v2": dict(trunk="transformer", heads="pvqm", raw_input=False),
    # U-net family: 3-level space-to-depth trunks with skip adds
    # (reference: ConvUnet networks.cpp:749-830, TransformerUnet :846-920)
    "TransformerUnet": dict(trunk="unet_transformer", heads="pv", raw_input=False),
    "ConvUnet": dict(trunk="unet", heads="pv", raw_input=False),
    # small fast nets for openings/solver assistance
    "FastNetwork": dict(trunk="resnet", heads="pv", raw_input=True, blocks=2, filters=32),
    "FastPolicy": dict(trunk="resnet", heads="pv", raw_input=True, blocks=2, filters=32),
}


def create_network(
    arch: str, blocks: int | None = None, filters: int | None = None, dtype=jnp.bfloat16
) -> AGNetwork:
    """Factory matching the reference's createAGNetwork(architecture)
    (reference: src/networks/AGNetwork.cpp factory + networks.hpp)."""
    if arch not in _REGISTRY:
        raise ValueError(f"unknown architecture {arch!r}; known: {sorted(_REGISTRY)}")
    kw = dict(_REGISTRY[arch])
    if blocks is not None:
        kw["blocks"] = blocks
    if filters is not None:
        kw["filters"] = filters
    kw["dtype"] = dtype
    return AGNetwork(ModelConfig(**kw))


def list_architectures() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Inference-space postprocessing
# ---------------------------------------------------------------------------


class NetEval(NamedTuple):
    """Probability-space outputs the search consumes."""

    policy: jax.Array  # [B, H, W], masked + renormalized
    value: jax.Array  # [B, 3] (win, draw, loss) probabilities
    q: jax.Array | None  # [B, H, W, 3]
    moves_left: jax.Array | None  # [B] expectation


def postprocess(out: NetOutput, legal_mask: jax.Array) -> NetEval:
    """Masked softmax over legal cells + head softmaxes.

    The reference bakes plain Softmax into the graph and masks afterwards in
    the edge generator; masking inside the softmax is numerically equivalent
    and keeps everything fused on device."""
    neg = jnp.float32(-1e9)
    plogits = jnp.where(legal_mask, out.policy_logits, neg)
    bsz = plogits.shape[0]
    policy = jax.nn.softmax(plogits.reshape(bsz, -1), axis=-1).reshape(plogits.shape)
    value = jax.nn.softmax(out.value_logits, axis=-1)
    q = jax.nn.softmax(out.q_logits, axis=-1) if out.q_logits is not None else None
    moves_left = None
    if out.moves_left_logits is not None:
        dist = jax.nn.softmax(out.moves_left_logits, axis=-1)
        moves_left = dist @ jnp.arange(dist.shape[-1], dtype=jnp.float32)
    return NetEval(policy, value, q, moves_left)


def value_expectation(value: jax.Array) -> jax.Array:
    """Scalar expectation from (win, draw, loss): w + 0.5*d
    (reference: search/Value.hpp:41-44)."""
    return value[..., 0] + 0.5 * value[..., 1]
