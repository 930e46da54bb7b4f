"""Faithful classic-LoFTR (Sun et al., CVPR 2021) in Flax, with a
converter for the published upstream checkpoints.

The reference's learned-matcher role consumes external matcher packages
per crop pair (src/coarse_to_fine_matching_base.py:1059-1233); the LoFTR
family is one of the registered options (``img_matching_type: loftr``).
This module mirrors the *upstream* zju3dv/LoFTR architecture exactly —
so the published ``indoor_ds.ckpt`` / ``outdoor_ds.ckpt`` state dicts
convert losslessly — unlike :mod:`.loftr`'s compact LayerNorm variant,
which is an in-environment-trainable stand-in:

- ResNetFPN_8_2 backbone: 7x7 stem + three 2-BasicBlock stages
  (128/196/256) + top-down FPN with bilinear (align_corners) upsampling,
  producing 1/8 coarse (256-d) and 1/2 fine (128-d) maps. All
  BatchNorms are eval-mode and folded into the convolutions at
  conversion (exact for inference).
- Sinusoidal positional encoding (including the upstream
  ``temp_bug_fix=False`` frequency layout that the published checkpoints
  were trained with).
- LocalFeatureTransformer: interleaved self/cross LoFTR encoder layers —
  bias-free q/k/v/merge projections, elu+1 linear attention,
  post-attention LayerNorm, a concat([x, message]) MLP, residual add.
- Dual-softmax coarse matching at temperature 0.1 with mutual-NN +
  confidence threshold.
- FinePreprocess (W=5 windows, coarse-feature conditioning via
  down_proj/merge_feat), a 1-layer self/cross fine transformer, and the
  spatial-expectation sub-pixel refinement.

TPU notes: every stage is static-shape; attention is linear (O(N d^2))
batched matmuls on the MXU; the per-match fine windows are a batched
gather + einsum. The coarse token count is (H/8)(W/8) — crops from
``image.crop`` keep it bounded.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ClassicLoFTRConfig",
    "ClassicLoFTR",
    "classic_loftr_match",
    "convert_classic_loftr",
    "is_classic_loftr_state_dict",
]


@dataclasses.dataclass(frozen=True)
class ClassicLoFTRConfig:
    """Upstream LoFTR hyper-parameters (configs/loftr/loftr_ds.py)."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    d_coarse: int = 256
    d_fine: int = 128
    nhead: int = 8
    coarse_layers: int = 4  # self/cross pairs
    fine_layers: int = 1
    window: int = 5
    temperature: float = 0.1
    match_threshold: float = 0.2
    border_rm: int = 2  # upstream coarse-matching border removal
    temp_bug_fix: bool = False  # published ckpts use the legacy encoding


class FoldedConv(nn.Module):
    """Conv with bias (BatchNorm folded in at conversion)."""

    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            name="conv",
        )(x)


class BasicBlock(nn.Module):
    """Upstream resnet_fpn.BasicBlock (BNs folded)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(
            FoldedConv(self.features, 3, self.stride, name="conv1")(x)
        )
        y = FoldedConv(self.features, 3, name="conv2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = FoldedConv(self.features, 1, self.stride, name="down")(x)
        return nn.relu(x + y)


def _upsample2x(x):
    """Bilinear 2x with align_corners=True (torch F.interpolate)."""
    b, h, w, c = x.shape
    return _resize_align_corners(x, 2 * h, 2 * w)


def _resize_align_corners(x, oh, ow):
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class ResNetFPN82(nn.Module):
    """ResNetFPN_8_2: 1/8 coarse (256) + 1/2 fine (128) features."""

    cfg: ClassicLoFTRConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d1, d2, d3 = c.block_dims
        x0 = nn.relu(FoldedConv(c.initial_dim, 7, 2, name="stem")(x))
        x1 = BasicBlock(d1, name="layer1_0")(x0)
        x1 = BasicBlock(d1, name="layer1_1")(x1)
        x2 = BasicBlock(d2, 2, name="layer2_0")(x1)
        x2 = BasicBlock(d2, name="layer2_1")(x2)
        x3 = BasicBlock(d3, 2, name="layer3_0")(x2)
        x3 = BasicBlock(d3, name="layer3_1")(x3)

        x3_out = FoldedConv(d3, 1, name="layer3_outconv")(x3)
        x2_out = FoldedConv(d3, 1, name="layer2_outconv")(x2)
        h = x2_out + _upsample2x(x3_out)
        h = FoldedConv(d3, 3, name="layer2_outconv2_0")(h)
        h = FoldedConv(d2, 3, name="layer2_outconv2_1")(
            nn.leaky_relu(h, 0.01)
        )
        x1_out = FoldedConv(d2, 1, name="layer1_outconv")(x1)
        g = x1_out + _upsample2x(h)
        g = FoldedConv(d2, 3, name="layer1_outconv2_0")(g)
        g = FoldedConv(d1, 3, name="layer1_outconv2_1")(
            nn.leaky_relu(g, 0.01)
        )
        return x3_out, g  # coarse (1/8, 256), fine (1/2, 128)


class EncoderLayer(nn.Module):
    """Upstream LoFTREncoderLayer: linear attention + concat-MLP."""

    dim: int
    nhead: int

    @nn.compact
    def __call__(self, x, source):
        b, n, d = x.shape
        dh = self.dim // self.nhead
        proj = functools.partial(nn.DenseGeneral, (self.nhead, dh),
                                 use_bias=False)
        q = proj(name="q_proj")(x)
        k = proj(name="k_proj")(source)
        v = proj(name="v_proj")(source)
        q = nn.elu(q) + 1.0
        k = nn.elu(k) + 1.0
        kv = jnp.einsum("bshd,bshv->bhdv", k, v)
        z = 1.0 / (
            jnp.einsum("blhd,bhd->blh", q, jnp.sum(k, axis=1)) + 1e-6
        )
        msg = jnp.einsum("blhd,bhdv,blh->blhv", q, kv, z)
        msg = msg.reshape(b, n, self.dim)
        msg = nn.Dense(self.dim, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(name="norm1")(msg)
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(2 * self.dim, use_bias=False, name="mlp0")(h)
        h = nn.Dense(self.dim, use_bias=False, name="mlp1")(nn.relu(h))
        return x + nn.LayerNorm(name="norm2")(h)


class LocalFeatureTransformer(nn.Module):
    """Upstream LocalFeatureTransformer: interleaved ['self', 'cross']
    layers, each layer SHARED between the two images, and the cross
    update sequential — f1 attends to the already-updated f0 (upstream
    loftr_module/transformer.py forward loop)."""

    dim: int
    nhead: int
    pairs: int  # number of (self, cross) pairs

    @nn.compact
    def __call__(self, f0, f1):
        for i in range(self.pairs):
            self_l = EncoderLayer(self.dim, self.nhead, name=f"self_{i}")
            cross_l = EncoderLayer(self.dim, self.nhead, name=f"cross_{i}")
            f0 = self_l(f0, f0)
            f1 = self_l(f1, f1)
            f0 = cross_l(f0, f1)
            f1 = cross_l(f1, f0)
        return f0, f1


def _pos_encoding_sine(h, w, d_model, temp_bug_fix):
    """Upstream PositionEncodingSine (utils/position_encoding.py)."""
    d4 = d_model // 4
    idx = np.arange(0, d_model // 2, 2, dtype=np.float32)
    if temp_bug_fix:
        div = np.exp(idx * (-np.log(10000.0) / (d_model // 2)))
    else:  # legacy layout the published checkpoints use
        div = np.exp(idx * (-np.log(10000.0) / d_model // 2))
    y = np.arange(1, h + 1, dtype=np.float32)[:, None, None]
    x = np.arange(1, w + 1, dtype=np.float32)[None, :, None]
    pe = np.zeros((h, w, d_model), np.float32)
    pe[:, :, 0::4] = np.broadcast_to(np.sin(x * div), (h, w, d4))
    pe[:, :, 1::4] = np.broadcast_to(np.cos(x * div), (h, w, d4))
    pe[:, :, 2::4] = np.broadcast_to(np.sin(y * div), (h, w, d4))
    pe[:, :, 3::4] = np.broadcast_to(np.cos(y * div), (h, w, d4))
    return jnp.asarray(pe)


class ClassicLoFTR(nn.Module):
    cfg: ClassicLoFTRConfig = ClassicLoFTRConfig()

    def setup(self):
        c = self.cfg
        self.backbone = ResNetFPN82(c)
        self.loftr_coarse = LocalFeatureTransformer(
            c.d_coarse, c.nhead, c.coarse_layers
        )
        self.loftr_fine = LocalFeatureTransformer(
            c.d_fine, c.nhead, c.fine_layers
        )
        self.fine_down_proj = nn.Dense(c.d_fine)
        self.fine_merge_feat = nn.Dense(c.d_fine)

    def __call__(self, img0, img1):
        """imgs: (H, W) grayscale in [0, 1]. Returns coarse tokens, fine
        maps and the coarse grid shape."""
        c = self.cfg
        f0c, f0f = self.backbone(img0[None, :, :, None])
        f1c, f1f = self.backbone(img1[None, :, :, None])
        _, hc, wc, _ = f0c.shape
        pe = _pos_encoding_sine(hc, wc, c.d_coarse, c.temp_bug_fix)[None]
        t0 = (f0c + pe).reshape(1, hc * wc, c.d_coarse)
        t1 = (f1c + pe).reshape(1, hc * wc, c.d_coarse)
        t0, t1 = self.loftr_coarse(t0, t1)
        return t0, t1, f0f[0], f1f[0], (hc, wc)

    def fine_stage(self, win0, win1, cent0, cent1):
        """FinePreprocess conditioning + fine transformer.

        win0/win1: (S, W*W, d_fine) unfolded fine windows at the coarse
        matches; cent0/cent1: (S, d_coarse) matched coarse tokens.
        """
        c = self.cfg
        s, ww, _ = win0.shape
        wins = jnp.concatenate([win0, win1], axis=0)  # (2S, WW, df)
        cents = self.fine_down_proj(
            jnp.concatenate([cent0, cent1], axis=0)
        )  # (2S, df)
        cond = jnp.broadcast_to(cents[:, None, :], (2 * s, ww, c.d_fine))
        wins = self.fine_merge_feat(jnp.concatenate([wins, cond], axis=-1))
        w0, w1 = jnp.split(wins, 2, axis=0)
        return self.loftr_fine(w0, w1)


def _unfold_fine(fmap, ys, xs, window):
    """(H, W, C) fine map -> (S, window^2, C) windows centred at the
    (ys, xs) fine-grid positions (torch F.unfold with pad=W//2)."""
    h, w, c = fmap.shape
    half = window // 2
    dy, dx = jnp.meshgrid(
        jnp.arange(-half, half + 1), jnp.arange(-half, half + 1),
        indexing="ij",
    )
    yy = ys[:, None, None] + dy[None]
    xx = xs[:, None, None] + dx[None]
    inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    vals = fmap[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
    vals = jnp.where(inb[..., None], vals, 0.0)
    return vals.reshape(ys.shape[0], window * window, c)


@functools.partial(jax.jit, static_argnames=("model", "match_threshold"))
def _classic_core(params, img0, img1, model: ClassicLoFTR,
                  match_threshold: float):
    cfg = model.cfg
    t0, t1, fine0, fine1, (hc, wc) = model.apply(params, img0, img1)
    t0 = t0[0] / jnp.sqrt(jnp.asarray(cfg.d_coarse, jnp.float32))
    t1 = t1[0] / jnp.sqrt(jnp.asarray(cfg.d_coarse, jnp.float32))
    sim = jnp.einsum(
        "lc,sc->ls", t0, t1, preferred_element_type=jnp.float32
    ) / cfg.temperature
    conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)
    best_j = jnp.argmax(conf, axis=1)
    cbest = jnp.take_along_axis(conf, best_j[:, None], axis=1)[:, 0]
    mutual = (
        jnp.take(jnp.argmax(conf, axis=0), best_j)
        == jnp.arange(conf.shape[0])
    )
    ok = mutual & (cbest > match_threshold)
    # Upstream border removal (coarse_matching.mask_border, border_rm=2):
    # a match whose coarse cell lies within bd cells of either image's
    # border is dropped.
    bd = cfg.border_rm
    iia = jnp.arange(hc * wc)
    ix, iy = iia % wc, iia // wc
    jx, jy = (jnp.argmax(conf, axis=1) % wc), (jnp.argmax(conf, axis=1) // wc)
    inb = lambda x, y: (
        (x >= bd) & (x < wc - bd) & (y >= bd) & (y < hc - bd)
    )
    ok = ok & inb(ix, iy) & inb(jx, jy)

    # Fine stage at every coarse cell (static shape; gated by ok later).
    ii = jnp.arange(hc * wc)
    stride = 4  # fine (1/2) / coarse (1/8)
    y0f = (ii // wc) * stride
    x0f = (ii % wc) * stride
    y1f = (best_j // wc) * stride
    x1f = (best_j % wc) * stride
    W = cfg.window
    win0 = _unfold_fine(fine0, y0f, x0f, W)
    win1 = _unfold_fine(fine1, y1f, x1f, W)
    cent0 = t0 * jnp.sqrt(jnp.asarray(cfg.d_coarse, jnp.float32))
    cent1 = jnp.take(
        t1 * jnp.sqrt(jnp.asarray(cfg.d_coarse, jnp.float32)),
        best_j, axis=0,
    )
    w0, w1 = model.apply(
        params, win0, win1, cent0, cent1, method=ClassicLoFTR.fine_stage
    )
    # FineMatching: centre of w0 against all of w1, spatial expectation.
    centre = w0[:, (W * W) // 2, :]
    simf = jnp.einsum("sc,src->sr", centre, w1) / jnp.sqrt(
        jnp.asarray(cfg.d_fine, jnp.float32)
    )
    heat = jax.nn.softmax(simf, axis=-1).reshape(-1, W, W)
    gy, gx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, W), jnp.linspace(-1.0, 1.0, W),
        indexing="ij",
    )
    ex = jnp.sum(heat * gx[None], axis=(1, 2))
    ey = jnp.sum(heat * gy[None], axis=(1, 2))

    # Pixel coordinates (upstream: coarse cell corners * 8; fine offsets
    # in [-1,1] * W//2 fine px * 2 full px / fine px).
    u0 = (ii % wc) * 8.0
    v0 = (ii // wc) * 8.0
    u1 = (best_j % wc) * 8.0 + ex * (W // 2) * 2.0
    v1 = (best_j // wc) * 8.0 + ey * (W // 2) * 2.0
    return u0, v0, u1, v1, cbest, ok


def classic_loftr_match(
    params,
    img0: np.ndarray,
    img1: np.ndarray,
    *,
    model: ClassicLoFTR | None = None,
    match_threshold: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(M, 4) [u0 v0 u1 v1] matches + (M,) confidences."""
    model = model or ClassicLoFTR()
    if match_threshold is None:
        match_threshold = model.cfg.match_threshold
    g0 = np.asarray(img0, np.float32)
    g1 = np.asarray(img1, np.float32)
    if g0.ndim == 3:
        g0 = g0 @ np.asarray([0.299, 0.587, 0.114], np.float32)
        g1 = g1 @ np.asarray([0.299, 0.587, 0.114], np.float32)
    if g0.max() > 1.5:
        g0 = g0 / 255.0
        g1 = g1 / 255.0
    H = -(-g0.shape[0] // 8) * 8
    W = -(-g0.shape[1] // 8) * 8
    g0 = np.pad(g0, ((0, H - g0.shape[0]), (0, W - g0.shape[1])))
    g1 = np.pad(g1, ((0, H - g1.shape[0]), (0, W - g1.shape[1])))
    u0, v0, u1, v1, conf, ok = _classic_core(
        params, jnp.asarray(g0), jnp.asarray(g1), model,
        float(match_threshold),
    )
    ok = np.asarray(ok)
    out = np.stack(
        [np.asarray(u0), np.asarray(v0), np.asarray(u1), np.asarray(v1)],
        axis=1,
    )[ok]
    return out, np.asarray(conf)[ok]


# ---------------------------------------------------------------------------
# Upstream checkpoint conversion
# ---------------------------------------------------------------------------


def is_classic_loftr_state_dict(sd) -> bool:
    """Recognise the upstream zju3dv/LoFTR layout (indoor/outdoor_ds)."""
    return (
        "backbone.conv1.weight" in sd
        and any(k.startswith("loftr_coarse.layers.0.q_proj") for k in sd)
    )


def convert_classic_loftr(
    sd, cfg: ClassicLoFTRConfig | None = None
) -> tuple[dict, ClassicLoFTRConfig]:
    """Map an upstream LoFTR state dict onto :class:`ClassicLoFTR` params.

    BatchNorms (eval mode) are folded into their convolutions — exact for
    inference. Every tensor of the checkpoint is consumed; an unexpected
    or missing key raises.
    """
    from fusion4landslide_tpu.image.eloftr import (
        _conv_hwio,
        _dense,
        _fold_bn,
    )

    sd = {k.removeprefix("matcher."): np.asarray(v) for k, v in sd.items()}
    cfg = cfg or ClassicLoFTRConfig()
    used = set()

    def take(key):
        used.add(key)
        return np.asarray(sd[key], np.float32)

    def folded(conv_key, bn_prefix):
        w, b = _fold_bn(
            take(f"{conv_key}.weight"),
            take(f"{bn_prefix}.weight"),
            take(f"{bn_prefix}.bias"),
            take(f"{bn_prefix}.running_mean"),
            take(f"{bn_prefix}.running_var"),
        )
        for suffix in ("num_batches_tracked",):
            k = f"{bn_prefix}.{suffix}"
            if k in sd:
                used.add(k)
        return {
            "conv": {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": b,
            }
        }

    def plain(conv_key):
        out = {"conv": {"kernel": _conv_hwio(take(f"{conv_key}.weight"))}}
        if f"{conv_key}.bias" in sd:
            out["conv"]["bias"] = take(f"{conv_key}.bias")
        else:
            out["conv"]["bias"] = np.zeros(
                out["conv"]["kernel"].shape[-1], np.float32
            )
        return out

    backbone = {"stem": folded("backbone.conv1", "backbone.bn1")}
    for li, _dim in enumerate(cfg.block_dims, start=1):
        for bi in range(2):
            p = f"backbone.layer{li}.{bi}"
            blk = {
                "conv1": folded(f"{p}.conv1", f"{p}.bn1"),
                "conv2": folded(f"{p}.conv2", f"{p}.bn2"),
            }
            if f"{p}.downsample.0.weight" in sd:
                blk["down"] = folded(
                    f"{p}.downsample.0", f"{p}.downsample.1"
                )
            backbone[f"layer{li}_{bi}"] = blk
    backbone["layer3_outconv"] = plain("backbone.layer3_outconv")
    for li in (1, 2):
        backbone[f"layer{li}_outconv"] = plain(f"backbone.layer{li}_outconv")
        backbone[f"layer{li}_outconv2_0"] = folded(
            f"backbone.layer{li}_outconv2.0",
            f"backbone.layer{li}_outconv2.1",
        )
        backbone[f"layer{li}_outconv2_1"] = plain(
            f"backbone.layer{li}_outconv2.3"
        )

    def encoder_layer(prefix, dim):
        dh = dim // cfg.nhead
        out = {}
        for name in ("q_proj", "k_proj", "v_proj"):
            w = _dense(take(f"{prefix}.{name}.weight"))  # (in, out)
            out[name] = {"kernel": w.reshape(dim, cfg.nhead, dh)}
        out["merge"] = {"kernel": _dense(take(f"{prefix}.merge.weight"))}
        out["mlp0"] = {"kernel": _dense(take(f"{prefix}.mlp.0.weight"))}
        out["mlp1"] = {"kernel": _dense(take(f"{prefix}.mlp.2.weight"))}
        out["norm1"] = {
            "scale": take(f"{prefix}.norm1.weight"),
            "bias": take(f"{prefix}.norm1.bias"),
        }
        out["norm2"] = {
            "scale": take(f"{prefix}.norm2.weight"),
            "bias": take(f"{prefix}.norm2.bias"),
        }
        return out

    def transformer(prefix, dim, pairs):
        # Upstream layers alternate ['self', 'cross']; each layer is
        # shared between the two images, mirrored by the shared Flax
        # submodules in :class:`LocalFeatureTransformer`.
        out = {}
        for i in range(pairs):
            out[f"self_{i}"] = encoder_layer(
                f"{prefix}.layers.{2 * i}", dim
            )
            out[f"cross_{i}"] = encoder_layer(
                f"{prefix}.layers.{2 * i + 1}", dim
            )
        return out

    params = {
        "backbone": backbone,
        "loftr_coarse": transformer(
            "loftr_coarse", cfg.d_coarse, cfg.coarse_layers
        ),
        "loftr_fine": transformer("loftr_fine", cfg.d_fine, cfg.fine_layers),
        "fine_down_proj": {
            "kernel": _dense(take("fine_preprocess.down_proj.weight")),
            "bias": take("fine_preprocess.down_proj.bias"),
        },
        "fine_merge_feat": {
            "kernel": _dense(take("fine_preprocess.merge_feat.weight")),
            "bias": take("fine_preprocess.merge_feat.bias"),
        },
    }
    unused = set(sd) - used
    if unused:
        raise ValueError(
            f"unconsumed checkpoint tensors ({len(unused)}): "
            f"{sorted(unused)[:8]}..."
        )
    return {"params": params}, cfg
