"""Classic-LoFTR conversion parity against a torch oracle.

The oracle below re-implements the *upstream* zju3dv/LoFTR forward pass
(backbone ResNetFPN_8_2, sinusoidal position encoding, shared
self/cross linear-attention transformer, FinePreprocess conditioning,
spatial-expectation fine matching) with upstream attribute names, so its
``state_dict()`` has exactly the published checkpoint layout
(``outdoor_ds.ckpt``). Converting that state dict with
``convert_classic_loftr`` and running :class:`ClassicLoFTR` must
reproduce the oracle's coarse features, confidence matrix and sub-pixel
matches — which is precisely what conversion of the real checkpoint
requires (the reference consumes the published LoFTR family per crop
pair, src/coarse_to_fine_matching_base.py:1059-1233)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from fusion4landslide_tpu.image.loftr_classic import (  # noqa: E402
    ClassicLoFTR,
    ClassicLoFTRConfig,
    classic_loftr_match,
    convert_classic_loftr,
    is_classic_loftr_state_dict,
)


def conv1x1(i, o, stride=1):
    return nn.Conv2d(i, o, 1, stride, 0, bias=False)


def conv3x3(i, o, stride=1):
    return nn.Conv2d(i, o, 3, stride, 1, bias=False)


class BasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(in_planes, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                conv1x1(in_planes, planes, stride=stride),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    def __init__(self, initial_dim=128, block_dims=(128, 196, 256)):
        super().__init__()
        self.conv1 = nn.Conv2d(1, initial_dim, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        self.relu = nn.ReLU(inplace=True)
        self.in_planes = initial_dim
        self.layer1 = self._make_layer(block_dims[0], 1)
        self.layer2 = self._make_layer(block_dims[1], 2)
        self.layer3 = self._make_layer(block_dims[2], 2)
        self.layer3_outconv = conv1x1(block_dims[2], block_dims[2])
        self.layer2_outconv = conv1x1(block_dims[1], block_dims[2])
        self.layer2_outconv2 = nn.Sequential(
            conv3x3(block_dims[2], block_dims[2]),
            nn.BatchNorm2d(block_dims[2]),
            nn.LeakyReLU(),
            conv3x3(block_dims[2], block_dims[1]),
        )
        self.layer1_outconv = conv1x1(block_dims[0], block_dims[1])
        self.layer1_outconv2 = nn.Sequential(
            conv3x3(block_dims[1], block_dims[1]),
            nn.BatchNorm2d(block_dims[1]),
            nn.LeakyReLU(),
            conv3x3(block_dims[1], block_dims[0]),
        )

    def _make_layer(self, dim, stride):
        layers = [
            BasicBlock(self.in_planes, dim, stride),
            BasicBlock(dim, dim, 1),
        ]
        self.in_planes = dim
        return nn.Sequential(*layers)

    def forward(self, x):
        x0 = self.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_out_2x = F.interpolate(
            x3_out, scale_factor=2.0, mode="bilinear", align_corners=True
        )
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_out_2x)
        x2_out_2x = F.interpolate(
            x2_out, scale_factor=2.0, mode="bilinear", align_corners=True
        )
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_out_2x)
        return x3_out, x1_out


class LoFTREncoderLayer(nn.Module):
    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.mlp = nn.Sequential(
            nn.Linear(d_model * 2, d_model * 2, bias=False),
            nn.ReLU(True),
            nn.Linear(d_model * 2, d_model, bias=False),
        )
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        Q = F.elu(q) + 1.0
        K = F.elu(k) + 1.0
        v_length = v.size(1)
        values = v / v_length
        KV = torch.einsum("nshd,nshv->nhdv", K, values)
        Z = 1.0 / (
            torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6
        )
        msg = (
            torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
        ).contiguous()
        msg = self.merge(msg.view(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.mlp(torch.cat([x, msg], dim=2))
        msg = self.norm2(msg)
        return x + msg


class LocalFeatureTransformer(nn.Module):
    def __init__(self, d_model, nhead, layer_names):
        super().__init__()
        self.layer_names = list(layer_names)
        self.layers = nn.ModuleList(
            [LoFTREncoderLayer(d_model, nhead) for _ in self.layer_names]
        )

    def forward(self, feat0, feat1):
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                feat0 = layer(feat0, feat0)
                feat1 = layer(feat1, feat1)
            else:
                feat0 = layer(feat0, feat1)
                feat1 = layer(feat1, feat0)
        return feat0, feat1


class FinePreprocess(nn.Module):
    def __init__(self, d_model_c=256, d_model_f=128):
        super().__init__()
        self.down_proj = nn.Linear(d_model_c, d_model_f, bias=True)
        self.merge_feat = nn.Linear(2 * d_model_f, d_model_f, bias=True)


class TorchLoFTR(nn.Module):
    """Upstream-named container so state_dict() matches outdoor_ds.ckpt."""

    def __init__(self, coarse_pairs=4, fine_pairs=1):
        super().__init__()
        self.backbone = ResNetFPN_8_2()
        self.loftr_coarse = LocalFeatureTransformer(
            256, 8, ["self", "cross"] * coarse_pairs
        )
        self.loftr_fine = LocalFeatureTransformer(
            128, 8, ["self", "cross"] * fine_pairs
        )
        self.fine_preprocess = FinePreprocess()


def _pos_enc_legacy(h, w, d_model=256):
    """Upstream PositionEncodingSine with temp_bug_fix=False."""
    pe = torch.zeros((d_model, h, w))
    y_pos = torch.ones((h, w)).cumsum(0).float().unsqueeze(0)
    x_pos = torch.ones((h, w)).cumsum(1).float().unsqueeze(0)
    div_term = torch.exp(
        torch.arange(0, d_model // 2, 2).float()
        * (-math.log(10000.0) / d_model // 2)
    )
    div_term = div_term[:, None, None]
    pe[0::4, :, :] = torch.sin(x_pos * div_term)
    pe[1::4, :, :] = torch.cos(x_pos * div_term)
    pe[2::4, :, :] = torch.sin(y_pos * div_term)
    pe[3::4, :, :] = torch.cos(y_pos * div_term)
    return pe[None]


@torch.no_grad()
def oracle_forward(model: TorchLoFTR, g0, g1, thr=0.0, border_rm=2,
                   temperature=0.1, W=5):
    """The upstream LoFTR.forward match pipeline (eval, dual-softmax)."""
    x0 = torch.from_numpy(g0)[None, None]
    x1 = torch.from_numpy(g1)[None, None]
    (c0, f0), (c1, f1) = model.backbone(x0), model.backbone(x1)
    _, d, hc, wc = c0.shape
    pe = _pos_enc_legacy(hc, wc, d)
    t0 = (c0 + pe).flatten(2).transpose(1, 2)  # (1, L, C)
    t1 = (c1 + pe).flatten(2).transpose(1, 2)
    t0, t1 = model.loftr_coarse(t0, t1)

    n0 = t0 / t0.shape[-1] ** 0.5
    n1 = t1 / t1.shape[-1] ** 0.5
    sim = torch.einsum("nlc,nsc->nls", n0, n1) / temperature
    conf = F.softmax(sim, 1) * F.softmax(sim, 2)
    mask = conf > thr
    mask = (
        mask
        * (conf == conf.max(dim=2, keepdim=True)[0])
        * (conf == conf.max(dim=1, keepdim=True)[0])
    )
    # mask_border(bd): zero all entries within bd cells of either border.
    m = mask.view(1, hc, wc, hc, wc)
    bd = border_rm
    keep = torch.zeros_like(m)
    keep[:, bd:hc - bd, bd:wc - bd, bd:hc - bd, bd:wc - bd] = True
    mask = (m & keep).view(1, hc * wc, hc * wc)
    b_ids, i_ids, j_ids = torch.nonzero(mask[0], as_tuple=False).new_empty(
        (0, 3)
    ).T if mask.sum() == 0 else (
        torch.zeros(int(mask.sum()), dtype=torch.long),
        torch.nonzero(mask[0], as_tuple=False)[:, 0],
        torch.nonzero(mask[0], as_tuple=False)[:, 1],
    )
    mconf = conf[0, i_ids, j_ids]

    # FinePreprocess (cat_c_feat=True).
    stride = 4
    f0u = F.unfold(f0, kernel_size=(W, W), stride=stride, padding=W // 2)
    f0u = f0u.view(1, f0.shape[1], W * W, -1).permute(0, 3, 2, 1)
    f1u = F.unfold(f1, kernel_size=(W, W), stride=stride, padding=W // 2)
    f1u = f1u.view(1, f1.shape[1], W * W, -1).permute(0, 3, 2, 1)
    w0 = f0u[b_ids, i_ids]
    w1 = f1u[b_ids, j_ids]
    cwin = model.fine_preprocess.down_proj(
        torch.cat([t0[b_ids, i_ids], t1[b_ids, j_ids]], 0)
    )
    merged = model.fine_preprocess.merge_feat(
        torch.cat(
            [
                torch.cat([w0, w1], 0),
                cwin[:, None, :].expand(-1, W * W, -1),
            ],
            -1,
        )
    )
    w0, w1 = merged.chunk(2, dim=0)
    w0, w1 = model.loftr_fine(w0, w1)

    # FineMatching.
    C = w0.shape[-1]
    centre = w0[:, (W * W) // 2, :]
    simf = torch.einsum("mc,mrc->mr", centre, w1) / C ** 0.5
    heat = F.softmax(simf, dim=1).view(-1, W, W)
    gy, gx = torch.meshgrid(
        torch.linspace(-1.0, 1.0, W), torch.linspace(-1.0, 1.0, W),
        indexing="ij",
    )
    ex = (heat * gx[None]).sum(dim=(1, 2))
    ey = (heat * gy[None]).sum(dim=(1, 2))
    mk0 = torch.stack([i_ids % wc, i_ids // wc], 1).float() * 8.0
    mk1 = (
        torch.stack([j_ids % wc, j_ids // wc], 1).float() * 8.0
        + torch.stack([ex, ey], 1) * (W // 2) * 2.0
    )
    return t0[0], t1[0], conf[0], mk0, mk1, mconf


@pytest.fixture(scope="module")
def oracle_and_converted():
    torch.manual_seed(0)
    model = TorchLoFTR().eval()
    # Non-trivial BN statistics so folding is actually exercised.
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.uniform_(-0.2, 0.2)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    assert is_classic_loftr_state_dict(sd)
    params, cfg = convert_classic_loftr(sd)
    return model, params, cfg


def test_coarse_feature_parity(oracle_and_converted, rng):
    """Backbone + position encoding + coarse transformer agree with the
    upstream torch forward after BN folding."""
    import jax.numpy as jnp

    model, params, cfg = oracle_and_converted
    g0 = rng.uniform(0, 1, size=(64, 64)).astype(np.float32)
    g1 = rng.uniform(0, 1, size=(64, 64)).astype(np.float32)
    t0o, t1o, conf_o, *_ = oracle_forward(model, g0, g1)

    flax_model = ClassicLoFTR(cfg)
    t0, t1, _, _, (hc, wc) = flax_model.apply(
        params, jnp.asarray(g0), jnp.asarray(g1)
    )
    np.testing.assert_allclose(
        np.asarray(t0[0]), t0o.numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(t1[0]), t1o.numpy(), rtol=2e-3, atol=2e-3
    )


def test_full_match_parity(oracle_and_converted, rng):
    """End-to-end matches (coarse mutual dual-softmax + fine
    spatial-expectation refinement) coincide with the oracle."""
    model, params, cfg = oracle_and_converted
    g0 = rng.uniform(0, 1, size=(64, 64)).astype(np.float32)
    g1 = np.roll(g0, 3, axis=1) + rng.uniform(
        0, 0.05, size=(64, 64)
    ).astype(np.float32)
    _, _, _, mk0_o, mk1_o, _ = oracle_forward(model, g0, g1)
    uv, conf = classic_loftr_match(
        params, g0, g1, model=ClassicLoFTR(cfg), match_threshold=0.0
    )
    # Same match set (keyed by the coarse source cell) ...
    key_o = {tuple(map(int, k)) for k in mk0_o.numpy()}
    key_f = {tuple(map(int, k)) for k in uv[:, :2]}
    inter = key_o & key_f
    assert len(inter) >= 0.95 * max(len(key_o), 1)
    # ... and the same sub-pixel refinement.
    o = {tuple(map(int, a)): b for a, b in zip(mk0_o.numpy(), mk1_o.numpy())}
    f = {tuple(map(int, a)): b for a, b in zip(uv[:, :2], uv[:, 2:4])}
    diffs = [np.abs(o[k] - f[k]).max() for k in inter]
    assert np.median(diffs) < 0.05


def test_converter_rejects_unknown_layout():
    with pytest.raises((KeyError, ValueError)):
        convert_classic_loftr({"backbone.conv1.weight": np.zeros((1,))})


def test_registry_dispatches_classic_checkpoint(
    oracle_and_converted, tmp_path, rng
):
    """matcher='loftr' with a provisioned upstream-layout checkpoint runs
    the faithful conversion (reference img_matching_type: loftr)."""
    model, _params, _cfg = oracle_and_converted
    path = str(tmp_path / "outdoor_ds.ckpt")
    torch.save({"state_dict": model.state_dict()}, path)
    from fusion4landslide_tpu.image.matching import get_matcher

    g0 = rng.uniform(0, 255, size=(96, 96)).astype(np.float32)
    g1 = np.roll(g0, 2, axis=1)
    uv = get_matcher("loftr")(g0, g1, weights=path, match_threshold=0.0)
    assert uv.shape[1] == 4
    assert uv.shape[0] > 5
