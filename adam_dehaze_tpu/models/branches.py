"""Intensity-specialised dehazing branches ("CORUN-Light/Medium/Complex").

TPU-native re-implementations of the reference branch family
(reference: models/dehazing/{low,medium,high}_intensity.py, base_model.py:98-231)
in flax/NHWC with static shapes. All branches map hazy [0,1] images to dehazed
[0,1] images and guarantee the output range by construction.

Factory config keys match the reference (`dehazing.{low,medium,high}.
{model_type,channels,blocks}`, config/config.yaml:22-46).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from adam_dehaze_tpu.nn.blocks import (
    AttentionBlock,
    AttentionBlockR,
    ConvBlock,
    ConvBlockR,
    ResidualBlock,
    ResidualBlockR,
    UpBlock,
    UpBlockR,
    resize_bilinear,
    resize_bilinear_align_corners,
)
from adam_dehaze_tpu.parallel.sharding import shard_channels

Dtype = Any


def _fullres_blocks(remat: bool):
    """Block classes for FULL-RESOLUTION call sites: the nn.remat twins
    (identical param tree, interiors recomputed in backward) under
    `tpu.remat: fullres`, the plain classes otherwise. Half/quarter-res
    sites always use the plain classes — their activations are 4-16x
    smaller, so rematting them buys little HBM for real recompute FLOPs
    (nn/blocks.py:remat_twin)."""
    if remat:
        return ConvBlockR, ResidualBlockR, AttentionBlockR, UpBlockR
    return ConvBlock, ResidualBlock, AttentionBlock, UpBlock


class LightweightDehazeModel(nn.Module):
    """Low branch, default: shallow residual net with a learnable global skip
    (reference: low_intensity.py:5-54).

    out = (1 - alpha) * x + alpha * sigmoid(net(x)), alpha init 0.1.
    """
    base_channels: int = 32
    n_blocks: int = 3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        CB, RB, _, _ = _fullres_blocks(self.remat_fullres)  # all-full-res net
        h = CB(self.base_channels, 3, dtype=dt)(x.astype(dt), train)
        for _ in range(self.n_blocks):
            h = RB(self.base_channels, dtype=dt)(h, train)
        h = CB(self.base_channels, 3, dtype=dt)(h, train)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(h)
        out = jax.nn.sigmoid(out)
        alpha = self.param("skip_alpha", nn.initializers.constant(0.1), (), jnp.float32)
        alpha = alpha.astype(dt)
        return ((1.0 - alpha) * x.astype(dt) + alpha * out).astype(jnp.float32)


class LowIntensityUNet(nn.Module):
    """Low branch, alternative: one-level U-Net with residual output
    (reference: low_intensity.py:56-116).

    out = clip(x + (sigmoid(net) - 0.5) * 2, 0, 1).
    """
    base_channels: int = 32
    n_blocks: int = 3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channels
        CB, _, _, UB = _fullres_blocks(self.remat_fullres)
        init = CB(c, 3, dtype=dt)(x.astype(dt), train)
        down = ConvBlock(c * 2, 4, stride=2, padding=1, dtype=dt)(init, train)
        down = ResidualBlock(c * 2, dtype=dt)(down, train)
        h = down
        for _ in range(self.n_blocks - 1):
            h = ResidualBlock(c * 2, dtype=dt)(h, train)
        up = UB(c, dtype=dt)(h, train)
        h = jnp.concatenate([up, init], axis=-1)
        h = CB(c, 3, dtype=dt)(h, train)
        h = CB(c, 3, dtype=dt)(h, train)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(h)
        out = jax.nn.sigmoid(out)
        res = (out - 0.5) * 2.0
        return jnp.clip(x.astype(dt) + res, 0.0, 1.0).astype(jnp.float32)


class MediumIntensityDehazeModel(nn.Module):
    """Medium branch, default: 2-level encoder/decoder with concat skips and a
    tanh residual head (reference: medium_intensity.py:5-117).

    out = clip(x + tanh(net(x)), 0, 1).
    """
    base_channels: int = 64
    n_blocks: int = 6  # kept for config parity; depth is structural
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channels
        CB, RB, _, UB = _fullres_blocks(self.remat_fullres)
        f0 = CB(c, 7, dtype=dt)(x.astype(dt), train)

        e1 = ConvBlock(c * 2, 4, stride=2, padding=1, dtype=dt)(f0, train)
        e1 = ResidualBlock(c * 2, dtype=dt)(e1, train)
        e1 = ResidualBlock(c * 2, dtype=dt)(e1, train)

        e2 = ConvBlock(c * 4, 4, stride=2, padding=1, dtype=dt)(e1, train)
        e2 = shard_channels(e2)  # TP hook: widest stage (4c channels)
        e2 = ResidualBlock(c * 4, dtype=dt)(e2, train)
        e2 = ResidualBlock(c * 4, dtype=dt)(e2, train)

        b = ResidualBlock(c * 4, dtype=dt)(e2, train)
        b = ResidualBlock(c * 4, dtype=dt)(b, train)
        b = shard_channels(b)

        d1 = UpBlock(c * 2, dtype=dt)(b, train)
        d1 = ResidualBlock(c * 2, dtype=dt)(d1, train)
        if d1.shape[1:3] != e1.shape[1:3]:
            d1 = resize_bilinear(d1, e1.shape[1:3])
        d1 = jnp.concatenate([d1, e1], axis=-1)

        d2 = UB(c, dtype=dt)(d1, train)
        d2 = RB(c, dtype=dt)(d2, train)
        if d2.shape[1:3] != f0.shape[1:3]:
            d2 = resize_bilinear(d2, f0.shape[1:3])
        d2 = jnp.concatenate([d2, f0], axis=-1)

        h = CB(c, 3, dtype=dt)(d2, train)
        h = CB(c // 2, 3, dtype=dt)(h, train)
        res = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(h)
        res = jnp.tanh(res)
        return jnp.clip(x.astype(dt) + res, 0.0, 1.0).astype(jnp.float32)


class COrunInspiredModel(nn.Module):
    """Medium branch, alternative: 3-scale pyramid + fusion + residual stack
    (reference: medium_intensity.py:128-199)."""
    base_channels: int = 64
    n_blocks: int = 6
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channels
        CB, RB, _, _ = _fullres_blocks(self.remat_fullres)
        init = CB(c, 7, dtype=dt)(x.astype(dt), train)

        # Upsampling uses align_corners=True to match the reference's
        # nn.UpsamplingBilinear2d (medium_intensity.py:146,151).
        s1 = CB(c, 3, dtype=dt)(init, train)
        s2 = nn.max_pool(init, (2, 2), strides=(2, 2))
        s2 = ConvBlock(c * 2, 3, dtype=dt)(s2, train)
        s2 = resize_bilinear_align_corners(s2, init.shape[1:3])
        s3 = nn.max_pool(init, (4, 4), strides=(4, 4))
        s3 = ConvBlock(c * 4, 3, dtype=dt)(s3, train)
        s3 = resize_bilinear_align_corners(s3, init.shape[1:3])

        fused = jnp.concatenate([s1, s2, s3], axis=-1)
        fused = CB(c * 2, 1, padding=0, dtype=dt)(fused, train)
        h = fused
        for _ in range(self.n_blocks):
            h = RB(c * 2, dtype=dt)(h, train)
        h = CB(c, 3, dtype=dt)(h, train)
        res = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(h)
        res = jnp.tanh(res)
        return jnp.clip(x.astype(dt) + res, 0.0, 1.0).astype(jnp.float32)


class HighIntensityDehazeModel(nn.Module):
    """High branch, default: attention-augmented encoder/decoder with a
    detail-guidance branch (reference: high_intensity.py:6-147).

    out = clip(x + tanh(net(x)) * sigmoid(detail(x)), 0, 1).
    """
    base_channels: int = 96
    n_blocks: int = 9
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channels
        pl = self.use_pallas
        CB, RB, AB, UB = _fullres_blocks(self.remat_fullres)
        xin = x.astype(dt)

        # Detail guidance map (1 channel, sigmoid).
        g = CB(16, 3, dtype=dt)(xin, train)
        g = CB(16, 3, dtype=dt)(g, train)
        guidance = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), padding=0, dtype=dt, param_dtype=jnp.float32)(g))

        f0 = CB(c, 7, dtype=dt)(xin, train)

        e1 = ConvBlock(c * 2, 4, stride=2, padding=1, dtype=dt)(f0, train)
        e1 = ResidualBlock(c * 2, dtype=dt)(e1, train)
        e1 = ResidualBlock(c * 2, dtype=dt)(e1, train)
        e1 = AttentionBlock(c * 2, use_pallas=pl, dtype=dt)(e1, train)

        e2 = ConvBlock(c * 4, 4, stride=2, padding=1, dtype=dt)(e1, train)
        e2 = shard_channels(e2)  # TP hook: widest stage (4c channels)
        e2 = ResidualBlock(c * 4, dtype=dt)(e2, train)
        e2 = ResidualBlock(c * 4, dtype=dt)(e2, train)
        e2 = AttentionBlock(c * 4, use_pallas=pl, dtype=dt)(e2, train)

        b = ResidualBlock(c * 4, dtype=dt)(e2, train)
        b = AttentionBlock(c * 4, use_pallas=pl, dtype=dt)(b, train)
        b = ResidualBlock(c * 4, dtype=dt)(b, train)
        b = AttentionBlock(c * 4, use_pallas=pl, dtype=dt)(b, train)
        b = shard_channels(b)

        d1 = UpBlock(c * 2, dtype=dt)(b, train)
        d1 = ResidualBlock(c * 2, dtype=dt)(d1, train)
        d1 = AttentionBlock(c * 2, use_pallas=pl, dtype=dt)(d1, train)
        if d1.shape[1:3] != e1.shape[1:3]:
            d1 = resize_bilinear(d1, e1.shape[1:3])
        d1 = jnp.concatenate([d1, e1], axis=-1)

        d2 = UB(c, dtype=dt)(d1, train)
        d2 = RB(c, dtype=dt)(d2, train)
        d2 = AB(c, use_pallas=pl, dtype=dt)(d2, train)
        if d2.shape[1:3] != f0.shape[1:3]:
            d2 = resize_bilinear(d2, f0.shape[1:3])
        d2 = jnp.concatenate([d2, f0], axis=-1)

        h = CB(c, 3, dtype=dt)(d2, train)
        h = CB(c // 2, 3, dtype=dt)(h, train)
        res = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(h)
        res = jnp.tanh(res)
        return jnp.clip(xin + res * guidance, 0.0, 1.0).astype(jnp.float32)


class DualBranchAttentionModel(nn.Module):
    """High branch, alternative: global+local branches with a transmission-map
    scaled residual (reference: high_intensity.py:149-223)."""
    base_channels: int = 96
    n_blocks: int = 9
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channels
        pl = self.use_pallas
        CB, RB, _, _ = _fullres_blocks(self.remat_fullres)
        xin = x.astype(dt)

        g = CB(c, 7, dtype=dt)(xin, train)
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        g = ResidualBlock(c, dtype=dt)(g, train)
        g = AttentionBlock(c, use_pallas=pl, dtype=dt)(g, train)
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        g = ResidualBlock(c, dtype=dt)(g, train)
        g = AttentionBlock(c, use_pallas=pl, dtype=dt)(g, train)
        g = ResidualBlock(c, dtype=dt)(g, train)
        # align_corners=True upsampling matches the reference's
        # nn.UpsamplingBilinear2d (high_intensity.py:169,171).
        g = resize_bilinear_align_corners(g, (xin.shape[1] // 2, xin.shape[2] // 2))
        g = ResidualBlock(c, dtype=dt)(g, train)
        g = resize_bilinear_align_corners(g, xin.shape[1:3])
        g = CB(c // 2, 3, dtype=dt)(g, train)

        l = CB(c // 2, 3, dtype=dt)(xin, train)
        l = RB(c // 2, dtype=dt)(l, train)
        l = RB(c // 2, dtype=dt)(l, train)
        l = CB(c // 2, 3, dtype=dt)(l, train)

        h = jnp.concatenate([g, l], axis=-1)
        t = CB(c // 2, 3, dtype=dt)(h, train)
        t = CB(c // 4, 3, dtype=dt)(t, train)
        transmission = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), padding=0, dtype=dt, param_dtype=jnp.float32)(t))

        r = CB(c // 2, 3, dtype=dt)(h, train)
        res = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(r)
        res = jnp.tanh(res)
        return jnp.clip(xin + (1.0 - transmission) * res, 0.0, 1.0).astype(jnp.float32)


class EncoderDecoder(nn.Module):
    """Generic 3-level encoder/decoder with concat skips.

    The reference version (base_model.py:98-231) created untrained 1x1 convs
    inside `forward` (a bug: base_model.py:201-208); here the fusion convs are
    proper learned parameters. Documented divergence: fixed, not reproduced.
    """
    base_channels: int = 64
    n_blocks: int = 6
    use_attention: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat_fullres: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.base_channels
        per = max(self.n_blocks // 3, 1)
        CB, _, _, UB = _fullres_blocks(self.remat_fullres)

        h = CB(c, 7, dtype=dt)(x.astype(dt), train)
        skips = [h]
        ch = c
        for _ in range(3):
            h = ConvBlock(ch * 2, 4, stride=2, padding=1, dtype=dt)(h, train)
            ch *= 2
            for _ in range(per):
                h = ResidualBlock(ch, dtype=dt)(h, train)
            skips.append(h)

        h = ResidualBlock(ch, dtype=dt)(h, train)
        h = ResidualBlock(ch, dtype=dt)(h, train)
        if self.use_attention:
            h = AttentionBlock(ch, use_pallas=self.use_pallas, dtype=dt)(h, train)

        # skips[-1] is the bottleneck input itself; decode against skips[2],1,0.
        for level in range(3):
            for _ in range(per):
                h = ResidualBlock(ch, dtype=dt)(h, train)
            ch //= 2
            # level 2's UpBlock/fusion outputs are full resolution.
            h = (UB if level == 2 else UpBlock)(ch, dtype=dt)(h, train)
            skip = skips[2 - level]
            if h.shape[1:3] != skip.shape[1:3]:
                h = resize_bilinear(h, skip.shape[1:3])
            h = jnp.concatenate([h, skip], axis=-1)
            h = (CB if level == 2 else ConvBlock)(
                ch, 1, padding=0, use_bn=False, activation=None,
                dtype=dt)(h, train)

        h = CB(c, 3, dtype=dt)(h, train)
        res = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                      param_dtype=jnp.float32)(h)
        res = jnp.tanh(res)
        return jnp.clip(x.astype(dt) + res, 0.0, 1.0).astype(jnp.float32)


def _common_kwargs(config):
    import jax.numpy as jnp  # local to avoid cycle at import time
    from adam_dehaze_tpu.config import use_pallas
    dtype = jnp.dtype(config.get("tpu", {}).get("compute_dtype", "float32"))
    return {"dtype": dtype, "use_pallas": use_pallas(config),
            # selective remat: full-resolution blocks become nn.remat twins
            # (identical param tree; nn/blocks.py:remat_twin).
            "remat_fullres":
                config.get("tpu", {}).get("remat") == "fullres"}


def _maybe_remat(cls, config):
    """FULL rematerialisation (`tpu.remat: true`) is applied at the
    train-step level (training/remat.py: jax.checkpoint around the forward
    with `train` closed over). SELECTIVE remat (`tpu.remat: fullres`) is
    structural instead — `_common_kwargs` sets `remat_fullres` on the model
    so only full-resolution blocks recompute. This hook is kept for config
    surface stability."""
    del config
    return cls


def create_low_intensity_model(config) -> nn.Module:
    """(reference: low_intensity.py:127-140)"""
    sub = config["dehazing"]["low"]
    cls = LightweightDehazeModel if sub["model_type"] == "lightweight" else LowIntensityUNet
    return _maybe_remat(cls, config)(
        base_channels=sub["channels"], n_blocks=sub["blocks"],
        **_common_kwargs(config))


def create_medium_intensity_model(config) -> nn.Module:
    """(reference: medium_intensity.py:201-215; 'encoder_decoder' additionally
    exposes the generic fixed EncoderDecoder)"""
    sub = config["dehazing"]["medium"]
    kw = _common_kwargs(config)
    if sub["model_type"] == "corun":
        cls = COrunInspiredModel
    elif sub["model_type"] == "encoder_decoder":
        return EncoderDecoder(base_channels=sub["channels"],
                              n_blocks=sub["blocks"], use_attention=False, **kw)
    else:
        cls = MediumIntensityDehazeModel
    return _maybe_remat(cls, config)(
        base_channels=sub["channels"], n_blocks=sub["blocks"], **kw)


def create_high_intensity_model(config) -> nn.Module:
    """(reference: high_intensity.py:225-239; 'encoder_decoder' additionally
    exposes the generic fixed EncoderDecoder with attention)"""
    sub = config["dehazing"]["high"]
    kw = _common_kwargs(config)
    if sub["model_type"] == "dual_branch":
        cls = DualBranchAttentionModel
    elif sub["model_type"] == "encoder_decoder":
        return EncoderDecoder(base_channels=sub["channels"],
                              n_blocks=sub["blocks"], use_attention=True, **kw)
    else:
        cls = HighIntensityDehazeModel
    return _maybe_remat(cls, config)(
        base_channels=sub["channels"], n_blocks=sub["blocks"], **kw)


def create_branch_models(config):
    """All three branches keyed by intensity name."""
    return {
        "low": create_low_intensity_model(config),
        "medium": create_medium_intensity_model(config),
        "high": create_high_intensity_model(config),
    }
