"""EfficientLoFTR (Wang et al., CVPR 2024) — faithful Flax/JAX port.

This is the production learned dense matcher the reference rides for its
flagship fusion and rgb_guided pipelines (``eloftr_outdoor.ckpt`` consumed at
/root/reference/src/coarse_to_fine_matching_base.py:1065 and
src/rgb_guided.py:2063). Architecture (verified against the torch
implementation shipped in ``transformers.models.efficientloftr``, which also
publishes the converted upstream weights as ``zju-community/efficientloftr``):

- RepVGG backbone: 4 stages (blocks [1,2,4,14], strides [2,1,2,2], channels
  [64,64,128,256]) producing 1/2, 1/4 residual maps + the 1/8 coarse map,
- coarse transformer: ``num_attention_layers`` layers of aggregated
  attention — features are reduced 4x4/stride-4 (depthwise conv for Q,
  max-pool for KV), 2-D RoPE applied on the self-attention Q/K, softmax MHA
  on the reduced tokens, bilinear 4x upsample, concat + MLP residual. Cross
  attention is sequential (img0 attends img1, then img1 attends the UPDATED
  img0 — replicating the upstream behaviour),
- coarse matching: scaled similarity, dual softmax, mutual NN + threshold +
  border removal,
- fine fusion: FPN over the residual maps up to FULL resolution (64-d),
- two-stage fine refinement: 8x8 vs 10x10 window dual-softmax argmax, then
  3x3 spatial-expectation sub-pixel regression on an 8-d feature slice.

TPU re-design notes: everything is fixed-shape per image size — matches are
returned dense per coarse cell of image0 with a validity mask (no host-side
compaction inside jit); BatchNorms and the three RepVGG branches are folded
into single conv kernels at weight-conversion time (inference-exact), so the
whole forward is convs + matmuls that ride the MXU.

Weights: convert a ``transformers`` EfficientLoFTR checkpoint (state dict of
``EfficientLoFTRForKeypointMatching``) with :func:`load_torch_eloftr`.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ELoFTRConfig",
    "EfficientLoFTRFlax",
    "eloftr_match",
    "load_torch_eloftr",
    "save_eloftr_weights",
    "load_eloftr_weights",
]


@dataclasses.dataclass(frozen=True)
class ELoFTRConfig:
    stage_num_blocks: tuple = (1, 2, 4, 14)
    out_features: tuple = (64, 64, 128, 256)
    stage_stride: tuple = (2, 1, 2, 2)
    hidden_size: int = 256
    num_attention_layers: int = 4
    num_attention_heads: int = 8
    q_aggregation_kernel_size: int = 4
    kv_aggregation_kernel_size: int = 4
    q_aggregation_stride: int = 4
    kv_aggregation_stride: int = 4
    fine_kernel_size: int = 8
    fine_matching_slice_dim: int = 8
    coarse_matching_temperature: float = 0.1
    coarse_matching_threshold: float = 0.2
    coarse_matching_border_removal: int = 2
    fine_matching_regress_temperature: float = 10.0
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 4.0

    @property
    def fine_fusion_dims(self) -> tuple:
        return tuple(reversed(self.out_features))[:-1]


class RepVGGBlockFused(nn.Module):
    """One RepVGG block with the 3x3/1x1/identity branches folded into a
    single biased 3x3 conv (the standard deploy-time reparameterisation —
    exact for inference)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            name="conv",
        )(x)
        return nn.relu(x)


class RepVGGBackbone(nn.Module):
    cfg: ELoFTRConfig

    @nn.compact
    def __call__(self, x):
        outputs = []
        c = self.cfg
        for s, (blocks, feats, stride) in enumerate(
            zip(c.stage_num_blocks, c.out_features, c.stage_stride)
        ):
            for b in range(blocks):
                x = RepVGGBlockFused(
                    feats,
                    stride=stride if b == 0 else 1,
                    name=f"stage{s}_block{b}",
                )(x)
            outputs.append(x)
        return outputs[1:]  # 1/2, 1/4, 1/8 (stage 0 excluded)


def _rope_embeddings(cfg: ELoFTRConfig, h: int, w: int):
    """2-D RoPE cos/sin of shape (h*w, hidden_size); positions are 1-based
    row/column indices (cumsum-of-ones in the torch implementation)."""
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    rope_dim = int(head_dim * cfg.partial_rotary_factor)
    inv_freq = 1.0 / (
        cfg.rope_theta
        ** (np.arange(0, rope_dim, 2, dtype=np.float32) / rope_dim)
    )
    i_idx = np.arange(1, h + 1, dtype=np.float32)[:, None, None]
    j_idx = np.arange(1, w + 1, dtype=np.float32)[None, :, None]
    emb = np.zeros((h, w, cfg.hidden_size // 2), np.float32)
    emb[:, :, 0::2] = i_idx * inv_freq
    emb[:, :, 1::2] = j_idx * inv_freq
    sin = np.repeat(np.sin(emb), 2, axis=-1).reshape(h * w, cfg.hidden_size)
    cos = np.repeat(np.cos(emb), 2, axis=-1).reshape(h * w, cfg.hidden_size)
    return jnp.asarray(cos), jnp.asarray(sin)


def _rotate_half(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(q, k, cos, sin):
    # q, k: (B, S, D); cos/sin: (S, D).
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


class ELoFTRAttention(nn.Module):
    cfg: ELoFTRConfig

    @nn.compact
    def __call__(self, x, source, rope):
        # x: (B, S, D) queries; source: (B, S, D) keys/values.
        c = self.cfg
        d = c.hidden_size
        heads = c.num_attention_heads
        dh = d // heads
        q = nn.Dense(d, use_bias=False, name="q_proj")(x)
        k = nn.Dense(d, use_bias=False, name="k_proj")(source)
        v = nn.Dense(d, use_bias=False, name="v_proj")(source)
        if rope is not None:
            cos, sin = rope
            q, k = _apply_rope(q, k, cos, sin)
        B, S, _ = x.shape
        q = q.reshape(B, S, heads, dh)
        k = k.reshape(B, S, heads, dh)
        v = v.reshape(B, S, heads, dh)
        hp = jax.lax.Precision.HIGHEST
        attn = jnp.einsum("bshd,bthd->bhst", q, k, precision=hp) / jnp.sqrt(
            jnp.asarray(dh, x.dtype)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", attn, v, precision=hp)
        out = out.reshape(B, S, d)
        return nn.Dense(d, use_bias=False, name="o_proj")(out)


class AggregatedAttention(nn.Module):
    """Aggregate 4x4 → attention on reduced tokens → upsample → MLP residual
    (EfficientLoFTRAggregatedAttention)."""

    cfg: ELoFTRConfig

    @nn.compact
    def __call__(self, x, source, rope):
        # x/source: (B, H, W, D) feature maps (NHWC).
        c = self.cfg
        d = c.hidden_size
        B, H, W, _ = x.shape
        q = nn.Conv(
            d,
            (c.q_aggregation_kernel_size,) * 2,
            strides=(c.q_aggregation_stride,) * 2,
            padding="VALID",
            feature_group_count=d,
            use_bias=False,
            name="q_aggregation",
        )(x)
        kv = nn.max_pool(
            source,
            (c.kv_aggregation_kernel_size,) * 2,
            strides=(c.kv_aggregation_stride,) * 2,
            padding="VALID",
        )
        norm = nn.LayerNorm(name="agg_norm")
        qn = norm(q)
        kvn = norm(kv)
        _, ah, aw, _ = qn.shape
        attn_out = ELoFTRAttention(c, name="attention")(
            qn.reshape(B, ah * aw, d), kvn.reshape(B, ah * aw, d), rope
        )
        attn_out = attn_out.reshape(B, ah, aw, d)
        # Bilinear x kernel_size upsample (align_corners=False semantics).
        up = jax.image.resize(
            attn_out,
            (B, ah * c.q_aggregation_kernel_size,
             aw * c.q_aggregation_kernel_size, d),
            method="bilinear",
        )
        up = up[:, :H, :W]
        inter = jnp.concatenate([x, up], axis=-1)
        h = nn.Dense(2 * d, use_bias=False, name="fc1")(inter)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Dense(d, use_bias=False, name="fc2")(h)
        h = nn.LayerNorm(name="mlp_norm")(h)
        return x + h


class LocalFeatureTransformerLayer(nn.Module):
    cfg: ELoFTRConfig

    @nn.compact
    def __call__(self, f0, f1, rope):
        self_attn = AggregatedAttention(self.cfg, name="self_attention")
        cross_attn = AggregatedAttention(self.cfg, name="cross_attention")
        f0 = self_attn(f0, f0, rope)
        f1 = self_attn(f1, f1, rope)
        # Sequential cross attention: f1 sees the UPDATED f0 (upstream
        # behaviour, see zju3dv/MatchAnything#26). No RoPE on cross.
        f0 = cross_attn(f0, f1, None)
        f1 = cross_attn(f1, f0, None)
        return f0, f1


class OutConvBlock(nn.Module):
    hidden: int  # residual channel count (= output channels)
    inter: int  # intermediate channel count (= input channels)

    @nn.compact
    def __call__(self, x, residual):
        r = nn.Conv(self.inter, (1, 1), use_bias=False, name="out_conv1")(
            residual
        )
        r = r + x
        # out_conv2's BatchNorm is folded into the conv bias at conversion.
        r = nn.Conv(self.inter, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, name="out_conv2")(r)
        r = nn.leaky_relu(r, negative_slope=0.01)
        r = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="out_conv3")(r)
        B, H, W, C = r.shape
        return jax.image.resize(r, (B, H * 2, W * 2, C), method="bilinear")


class FineFusion(nn.Module):
    cfg: ELoFTRConfig

    @nn.compact
    def __call__(self, coarse, residuals):
        # coarse: (B, hc, wc, D); residuals: [1/2 map, 1/4 map] (NHWC).
        dims = self.cfg.fine_fusion_dims  # e.g. (256, 128, 64)
        x = nn.Conv(dims[0], (1, 1), use_bias=False, name="out_conv")(coarse)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
        res = list(reversed(residuals))  # [1/4 map, 1/2 map]
        for i in range(1, len(dims)):
            x = OutConvBlock(
                dims[i], dims[i - 1], name=f"out_conv_layer{i - 1}"
            )(x, res[i - 1])
        return x  # full resolution, dims[-1] channels


class EfficientLoFTRFlax(nn.Module):
    """Backbone + coarse transformer + fine fusion; returns the coarse
    feature maps of both images and the full-resolution fine maps."""

    cfg: ELoFTRConfig = ELoFTRConfig()

    @nn.compact
    def __call__(self, img0, img1):
        # imgs: (H, W) grayscale in [0, 1].
        c = self.cfg
        x = jnp.stack([img0, img1])[..., None]  # (2, H, W, 1)
        feats = RepVGGBackbone(c, name="backbone")(x)
        *residuals, coarse = feats
        _, hc, wc, _ = coarse.shape
        agg_h = (
            hc - c.q_aggregation_kernel_size
        ) // c.q_aggregation_stride + 1
        agg_w = (
            wc - c.q_aggregation_kernel_size
        ) // c.q_aggregation_stride + 1
        rope = _rope_embeddings(c, agg_h, agg_w)
        f0 = coarse[0:1]
        f1 = coarse[1:2]
        for i in range(c.num_attention_layers):
            f0, f1 = LocalFeatureTransformerLayer(c, name=f"layer{i}")(
                f0, f1, rope
            )
        coarse_out = jnp.concatenate([f0, f1], axis=0)  # (2, hc, wc, D)
        fine = FineFusion(c, name="fine_fusion")(
            coarse_out / jnp.sqrt(jnp.asarray(c.hidden_size, jnp.float32)),
            residuals,
        )
        return coarse_out, fine


def _unfold_windows(fmap, kernel: int, stride: int, pad: int):
    """(H, W, C) -> (L, kernel*kernel, C) sliding windows, torch-unfold
    ordering (row-major within the window)."""
    H, W, C = fmap.shape
    if pad:
        fmap = jnp.pad(fmap, ((pad, pad), (pad, pad), (0, 0)))
    out_h = (H + 2 * pad - kernel) // stride + 1
    out_w = (W + 2 * pad - kernel) // stride + 1
    i0 = (jnp.arange(out_h) * stride)[:, None] + jnp.arange(kernel)[None, :]
    j0 = (jnp.arange(out_w) * stride)[:, None] + jnp.arange(kernel)[None, :]
    rows = fmap[i0]  # (out_h, kernel, Wp, C)
    win = rows[:, :, j0]  # (out_h, kernel, out_w, kernel, C)
    win = win.transpose(0, 2, 1, 3, 4).reshape(
        out_h * out_w, kernel * kernel, C
    )
    return win


@functools.partial(jax.jit, static_argnames=("model",))
def _eloftr_core(params, img0, img1, model: EfficientLoFTRFlax):
    """Full matching pipeline; dense per-coarse-cell-of-img0 outputs."""
    c = model.cfg
    coarse, fine = model.apply(params, img0, img1)
    _, hc, wc, d = coarse.shape
    S = hc * wc

    # --- Coarse matching (dual softmax + mutual NN + border removal).
    hp = jax.lax.Precision.HIGHEST
    f0 = coarse[0].reshape(S, d) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    f1 = coarse[1].reshape(S, d) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    sim = jnp.matmul(f0, f1.T, precision=hp) / c.coarse_matching_temperature
    conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)
    thr_mask = conf > c.coarse_matching_threshold
    b = c.coarse_matching_border_removal
    if b > 0:
        ii = jnp.arange(S)
        inner = (
            (ii // wc >= b) & (ii // wc < hc - b)
            & (ii % wc >= b) & (ii % wc < wc - b)
        )
        thr_mask = thr_mask & inner[:, None] & inner[None, :]
    max0 = jnp.max(conf, axis=1, keepdims=True)
    max1 = jnp.max(conf, axis=0, keepdims=True)
    mask = thr_mask & (conf == max0) & (conf == max1)
    masked = conf * mask
    score0 = jnp.max(masked, axis=1)
    match_j = jnp.argmax(masked, axis=1)
    ok = score0 > 0

    # --- Fine windows: img0 8x8 aligned windows, img1 10x10 (+1 halo).
    k = c.fine_kernel_size
    win0 = _unfold_windows(fine[0], k, k, 0)  # (S, k*k, C)
    win1 = _unfold_windows(fine[1], k + 2, k, 1)  # (S, (k+2)^2, C)
    win1 = jnp.take(win1, match_j, axis=0)

    slice_dim = c.fine_matching_slice_dim
    c_first = win0.shape[-1] - slice_dim
    a0 = win0[..., :c_first] / jnp.sqrt(jnp.asarray(c_first, jnp.float32))
    a1 = win1[..., :c_first] / jnp.sqrt(jnp.asarray(c_first, jnp.float32))
    fc = jnp.einsum("spc,sqc->spq", a0, a1, precision=hp)
    fc = jax.nn.softmax(fc, axis=1) * jax.nn.softmax(fc, axis=2)
    fc = fc.reshape(S, k * k, k + 2, k + 2)[..., 1:-1, 1:-1]
    fc = fc.reshape(S, k * k * k * k)
    best = jnp.argmax(fc, axis=-1)
    idx0 = best // (k * k)
    idx1 = best % (k * k)

    # Window-relative offsets (centre-of-window convention): grid - k/2 + .5
    off = (
        jnp.stack(
            jnp.meshgrid(jnp.arange(k), jnp.arange(k), indexing="ij")[::-1],
            axis=-1,
        ).reshape(k * k, 2).astype(jnp.float32)
        - (k // 2)
        + 0.5
    )  # (k*k, [x, y])
    d0 = jnp.take(off, idx0, axis=0)
    d1 = jnp.take(off, idx1, axis=0)

    ii = jnp.arange(S)
    scale = img0.shape[0] / hc  # = 8 for the canonical config
    kp0 = jnp.stack([(ii % wc), (ii // wc)], axis=-1).astype(jnp.float32)
    kp1 = jnp.stack([(match_j % wc), (match_j // wc)], axis=-1).astype(
        jnp.float32
    )
    u0v0 = kp0 * scale + d0
    u1v1 = kp1 * scale + d1

    # --- Second stage: 3x3 spatial expectation on the 8-d slice.
    b0 = win0[..., c_first:]
    b1 = win1[..., c_first:] / jnp.sqrt(jnp.asarray(slice_dim, jnp.float32))
    sc = jnp.einsum("spc,sqc->spq", b0, b1, precision=hp)  # (S, k², (k+2)²)
    sc_sel = jnp.take_along_axis(sc, idx0[:, None, None], axis=1)[:, 0]
    sc_grid = sc_sel.reshape(S, k + 2, k + 2)
    ci = idx1 // k + 1  # +1: the (k+2) window pads 1 around the k window
    cj = idx1 % k + 1
    dy, dx = jnp.meshgrid(
        jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
    )
    yy = ci[:, None, None] + dy[None]
    xx = cj[:, None, None] + dx[None]
    local = sc_grid[jnp.arange(S)[:, None, None], yy, xx]  # (S, 3, 3)
    prob = jax.nn.softmax(
        (local / c.fine_matching_regress_temperature).reshape(S, 9), axis=-1
    ).reshape(S, 3, 3)
    gx, gy = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, 3), jnp.linspace(-1.0, 1.0, 3), indexing="xy"
    )
    ex = jnp.sum(prob * gx[None], axis=(1, 2))
    ey = jnp.sum(prob * gy[None], axis=(1, 2))
    u1v1 = u1v1 + jnp.stack([ex, ey], axis=-1) * (3 // 2)

    return u0v0[:, 0], u0v0[:, 1], u1v1[:, 0], u1v1[:, 1], score0, ok


def eloftr_match(
    params,
    img0: np.ndarray,
    img1: np.ndarray,
    *,
    model: EfficientLoFTRFlax | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(M, 4) [u0 v0 u1 v1] pixel matches + (M,) confidences."""
    model = model or EfficientLoFTRFlax()
    g0 = np.asarray(img0, np.float32)
    g1 = np.asarray(img1, np.float32)
    if g0.ndim == 3:
        g0 = g0[..., 0]
        g1 = g1[..., 0]
    if g0.max() > 1.5:
        g0 = g0 / 255.0
        g1 = g1 / 255.0
    # Pad to multiples of 32 (1/8 coarse then 4x aggregation).
    H = -(-g0.shape[0] // 32) * 32
    W = -(-g0.shape[1] // 32) * 32
    g0 = np.pad(g0, ((0, H - g0.shape[0]), (0, W - g0.shape[1])))
    g1 = np.pad(g1, ((0, H - g1.shape[0]), (0, W - g1.shape[1])))
    u0, v0, u1, v1, confs, ok = _eloftr_core(
        params, jnp.asarray(g0), jnp.asarray(g1), model
    )
    ok = np.asarray(ok)
    out = np.stack(
        [np.asarray(u0), np.asarray(v0), np.asarray(u1), np.asarray(v1)],
        axis=1,
    )[ok]
    return out, np.asarray(confs)[ok]


# --------------------------------------------------------------------------
# Weight conversion from the torch (transformers) EfficientLoFTR layout.
# --------------------------------------------------------------------------


def _fold_bn(w, bn_w, bn_b, bn_mean, bn_var, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding conv (torch OIHW)."""
    scale = bn_w / np.sqrt(bn_var + eps)
    return w * scale[:, None, None, None], bn_b - bn_mean * scale


def _fuse_repvgg_block(sd, prefix, in_ch, out_ch, stride, eps=1e-5):
    """Reparameterise conv3x3+BN / conv1x1+BN / identity-BN into one biased
    3x3 conv (exact for inference). Returns HWIO kernel + bias."""
    w3, b3 = _fold_bn(
        np.asarray(sd[f"{prefix}.conv1.conv.weight"], np.float32),
        np.asarray(sd[f"{prefix}.conv1.norm.weight"], np.float32),
        np.asarray(sd[f"{prefix}.conv1.norm.bias"], np.float32),
        np.asarray(sd[f"{prefix}.conv1.norm.running_mean"], np.float32),
        np.asarray(sd[f"{prefix}.conv1.norm.running_var"], np.float32),
        eps,
    )
    w1, b1 = _fold_bn(
        np.asarray(sd[f"{prefix}.conv2.conv.weight"], np.float32),
        np.asarray(sd[f"{prefix}.conv2.norm.weight"], np.float32),
        np.asarray(sd[f"{prefix}.conv2.norm.bias"], np.float32),
        np.asarray(sd[f"{prefix}.conv2.norm.running_mean"], np.float32),
        np.asarray(sd[f"{prefix}.conv2.norm.running_var"], np.float32),
        eps,
    )
    w = w3.copy()
    w[:, :, 1:2, 1:2] += w1
    b = b3 + b1
    if in_ch == out_ch and stride == 1 and f"{prefix}.identity.weight" in sd:
        gid = np.asarray(sd[f"{prefix}.identity.weight"], np.float32)
        bid = np.asarray(sd[f"{prefix}.identity.bias"], np.float32)
        mid = np.asarray(sd[f"{prefix}.identity.running_mean"], np.float32)
        vid = np.asarray(sd[f"{prefix}.identity.running_var"], np.float32)
        scale = gid / np.sqrt(vid + eps)
        for ch in range(out_ch):
            w[ch, ch, 1, 1] += scale[ch]
        b = b + bid - mid * scale
    return np.transpose(w, (2, 3, 1, 0)), b  # OIHW -> HWIO


def _conv_hwio(t):
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _dense(t):
    return np.transpose(np.asarray(t, np.float32))


def load_torch_eloftr(
    state_dict_or_path, cfg: ELoFTRConfig | None = None
) -> tuple[dict, ELoFTRConfig]:
    """Convert a torch EfficientLoFTR checkpoint (the ``transformers``
    ``EfficientLoFTRForKeypointMatching`` layout — the published conversion
    of the upstream ``eloftr_outdoor.ckpt``) into Flax params.

    Accepts a state dict, a ``.pt``/``.bin``/``.safetensors`` path, or a
    directory containing one.

    Returns (params, config) ready for :class:`EfficientLoFTRFlax`.
    """
    import os.path as osp

    sd = state_dict_or_path
    if isinstance(sd, (str, bytes)):
        path = str(sd)
        if osp.isdir(path):
            for name in (
                "model.safetensors",
                "pytorch_model.bin",
                "pytorch_model.pt",
            ):
                if osp.exists(osp.join(path, name)):
                    path = osp.join(path, name)
                    break
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd = load_file(path)
        else:
            from fusion4landslide_tpu.models.convert import (
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(path)
    sd = {
        k.removeprefix("matcher."): v
        for k, v in sd.items()
    }
    # Infer architecture from the state dict.
    import re

    stage_blocks: dict[int, int] = {}
    stage_out: dict[int, int] = {}
    for k in sd:
        m = re.match(
            r"efficientloftr\.backbone\.stages\.(\d+)\.blocks\.(\d+)\."
            r"conv1\.conv\.weight",
            k,
        )
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            stage_blocks[s] = max(stage_blocks.get(s, 0), b + 1)
            if b == 0:
                stage_out[s] = int(np.asarray(sd[k]).shape[0])
    n_layers = (
        max(
            int(m.group(1))
            for k in sd
            if (m := re.match(
                r"efficientloftr\.local_feature_transformer\.layers\.(\d+)\.",
                k,
            ))
        )
        + 1
    )
    n_stages = len(stage_blocks)
    base = cfg or ELoFTRConfig()
    cfg = dataclasses.replace(
        base,
        stage_num_blocks=tuple(stage_blocks[s] for s in range(n_stages)),
        out_features=tuple(stage_out[s] for s in range(n_stages)),
        stage_stride=tuple(base.stage_stride[:n_stages]),
        hidden_size=stage_out[n_stages - 1],
        num_attention_layers=n_layers,
    )

    params: dict = {}

    # Backbone.
    bb: dict = {}
    in_ch = 1
    for s in range(n_stages):
        for b in range(cfg.stage_num_blocks[s]):
            stride = cfg.stage_stride[s] if b == 0 else 1
            out_ch = cfg.out_features[s]
            w, bias = _fuse_repvgg_block(
                sd,
                f"efficientloftr.backbone.stages.{s}.blocks.{b}",
                in_ch,
                out_ch,
                stride,
            )
            bb[f"stage{s}_block{b}"] = {
                "conv": {"kernel": w, "bias": bias}
            }
            in_ch = out_ch
    params["backbone"] = bb

    # Transformer layers.
    def _agg_attention(prefix):
        out = {
            "q_aggregation": {
                "kernel": _conv_hwio(sd[f"{prefix}.aggregation.q_aggregation.weight"])
            },
            "agg_norm": {
                "scale": np.asarray(sd[f"{prefix}.aggregation.norm.weight"], np.float32),
                "bias": np.asarray(sd[f"{prefix}.aggregation.norm.bias"], np.float32),
            },
            "attention": {
                name: {"kernel": _dense(sd[f"{prefix}.attention.{name}.weight"])}
                for name in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "fc1": {"kernel": _dense(sd[f"{prefix}.mlp.fc1.weight"])},
            "fc2": {"kernel": _dense(sd[f"{prefix}.mlp.fc2.weight"])},
            "mlp_norm": {
                "scale": np.asarray(sd[f"{prefix}.mlp.layer_norm.weight"], np.float32),
                "bias": np.asarray(sd[f"{prefix}.mlp.layer_norm.bias"], np.float32),
            },
        }
        return out

    for i in range(cfg.num_attention_layers):
        p = f"efficientloftr.local_feature_transformer.layers.{i}"
        params[f"layer{i}"] = {
            "self_attention": _agg_attention(f"{p}.self_attention"),
            "cross_attention": _agg_attention(f"{p}.cross_attention"),
        }

    # Fine fusion.
    ff: dict = {
        "out_conv": {
            "kernel": _conv_hwio(sd["refinement_layer.out_conv.weight"])
        }
    }
    n_out_layers = len(cfg.fine_fusion_dims) - 1
    for i in range(n_out_layers):
        p = f"refinement_layer.out_conv_layers.{i}"
        w2, b2 = _fold_bn(
            np.asarray(sd[f"{p}.out_conv2.weight"], np.float32),
            np.asarray(sd[f"{p}.batch_norm.weight"], np.float32),
            np.asarray(sd[f"{p}.batch_norm.bias"], np.float32),
            np.asarray(sd[f"{p}.batch_norm.running_mean"], np.float32),
            np.asarray(sd[f"{p}.batch_norm.running_var"], np.float32),
        )
        ff[f"out_conv_layer{i}"] = {
            "out_conv1": {"kernel": _conv_hwio(sd[f"{p}.out_conv1.weight"])},
            "out_conv2": {
                "kernel": np.transpose(w2, (2, 3, 1, 0)),
                "bias": b2,
            },
            "out_conv3": {"kernel": _conv_hwio(sd[f"{p}.out_conv3.weight"])},
        }
    params["fine_fusion"] = ff

    params = jax.tree.map(jnp.asarray, {"params": params})
    return params, cfg


# --------------------------------------------------------------------------
# Flax-native weight serialisation (in-environment trained checkpoints,
# image.eloftr_train — mirrors image.roma.save_roma_weights).
# --------------------------------------------------------------------------


def save_eloftr_weights(path: str, params, cfg: ELoFTRConfig) -> None:
    """Serialise trained parameters + config as a numpy ``.npz`` of
    flattened leaves (no external deps)."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    arrays["__cfg__"] = np.frombuffer(
        repr(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_eloftr_weights(path: str):
    """Load (params, cfg) written by :func:`save_eloftr_weights`."""
    import ast

    from flax.traverse_util import unflatten_dict

    data = np.load(path, allow_pickle=False)
    cfg_dict = ast.literal_eval(bytes(data["__cfg__"]).decode())
    for k in ("stage_num_blocks", "out_features", "stage_stride"):
        cfg_dict[k] = tuple(cfg_dict[k])
    cfg = ELoFTRConfig(**cfg_dict)
    flat = {
        tuple(k.split("/")): jnp.asarray(v)
        for k, v in data.items()
        if k != "__cfg__"
    }
    return unflatten_dict(flat), cfg
