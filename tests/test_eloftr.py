"""EfficientLoFTR Flax port: weight-conversion parity against the torch
oracle (``transformers.models.efficientloftr`` — the published conversion
target of the upstream ``eloftr_outdoor.ckpt``, reference README.md:85).

A randomly initialised torch ``EfficientLoFTRForKeypointMatching`` (eval
mode) is converted with ``load_torch_eloftr`` and the Flax forward must
reproduce the coarse/fine feature maps and the end matches.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fusion4landslide_tpu.image.eloftr import (  # noqa: E402
    EfficientLoFTRFlax,
    ELoFTRConfig,
    eloftr_match,
    load_torch_eloftr,
)

# Tiny config: same topology as the canonical model (4 stages, aggregated
# attention, 2-stage fine matching), scaled down for CPU test speed.
# num_attention_heads must satisfy head_dim * partial_rotary_factor ==
# hidden_size / 2 (the 2-D RoPE fills hidden_size/2 slots), as upstream.
TINY = dict(
    stage_num_blocks=[1, 1, 2, 2],
    out_features=[8, 8, 16, 32],
    stage_stride=[2, 1, 2, 2],
    hidden_size=32,
    num_attention_layers=2,
    num_attention_heads=8,
    fine_kernel_size=8,
    fine_matching_slice_dim=4,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers.models.efficientloftr import (
        EfficientLoFTRConfig,
        EfficientLoFTRForKeypointMatching,
    )

    torch.manual_seed(0)
    cfg = EfficientLoFTRConfig(**TINY, attn_implementation="eager")
    model = EfficientLoFTRForKeypointMatching(cfg)
    # The HF default init (all weights ~N(0, 0.02), BN scales included)
    # collapses activations to ~1e-14 through the ReLU/BN chain, which makes
    # parity numerically meaningless once LayerNorm re-amplifies the noise.
    # Re-initialise like a trained network: unit-ish BN scales/vars, Kaiming
    # convs/linears.
    gen = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Linear)):
            torch.nn.init.kaiming_normal_(m.weight, generator=gen)
            if m.bias is not None:
                torch.nn.init.normal_(m.bias, 0.0, 0.05, generator=gen)
        elif isinstance(m, torch.nn.BatchNorm2d):
            torch.nn.init.normal_(m.weight, 1.0, 0.1, generator=gen)
            torch.nn.init.normal_(m.bias, 0.0, 0.05, generator=gen)
            m.running_mean.normal_(0.0, 0.05, generator=gen)
            m.running_var.uniform_(0.8, 1.2, generator=gen)
        elif isinstance(m, torch.nn.LayerNorm):
            torch.nn.init.normal_(m.weight, 1.0, 0.1, generator=gen)
            torch.nn.init.normal_(m.bias, 0.0, 0.05, generator=gen)
    model.eval()
    return model


@pytest.fixture(scope="module")
def images(rng_module=None):
    rng = np.random.default_rng(3)
    h, w = 64, 96
    base = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
    # img1 = img0 shifted 8 px right (one coarse cell) with noise refill.
    img1 = np.roll(base, 8, axis=1)
    return base, img1


def _torch_forward(model, img0, img1):
    pix = torch.from_numpy(
        np.stack([img0, img1])[None, :, None].repeat(3, axis=2)
    )
    with torch.no_grad():
        out = model(pix)
        feats = model.efficientloftr(
            pix.reshape(1, 2, 3, *img0.shape)
        ).feature_maps
    return out, feats


def test_backbone_and_coarse_parity(torch_model, images):
    img0, img1 = images
    params, cfg = load_torch_eloftr(
        torch_model.state_dict(), cfg=ELoFTRConfig(fine_matching_slice_dim=4)
    )
    flax_model = EfficientLoFTRFlax(cfg)

    _, feats = _torch_forward(torch_model, img0, img1)
    coarse_t = feats[0].numpy()  # (1, 2, D, hc, wc)

    import jax.numpy as jnp

    coarse_j, fine_j = flax_model.apply(
        params, jnp.asarray(img0), jnp.asarray(img1)
    )
    coarse_j = np.asarray(coarse_j).transpose(0, 3, 1, 2)  # NHWC -> NCHW
    np.testing.assert_allclose(
        coarse_j, coarse_t[0], atol=5e-4, rtol=1e-3
    )


def test_fine_fusion_parity(torch_model, images):
    """The FPN fine-fusion weights: full-resolution fine maps must match the
    torch ``refinement_layer.forward_pyramid``."""
    img0, img1 = images
    params, cfg = load_torch_eloftr(
        torch_model.state_dict(), cfg=ELoFTRConfig(fine_matching_slice_dim=4)
    )
    flax_model = EfficientLoFTRFlax(cfg)

    _, feats = _torch_forward(torch_model, img0, img1)
    coarse_t = feats[0]  # (1, 2, D, hc, wc)
    residual_t = list(reversed(feats[1:]))
    with torch.no_grad():
        fine_t = torch_model.refinement_layer.forward_pyramid(
            coarse_t.reshape(2, *coarse_t.shape[2:])
            / cfg.hidden_size**0.5,
            residual_t,
        ).numpy()

    import jax.numpy as jnp

    _, fine_j = flax_model.apply(params, jnp.asarray(img0), jnp.asarray(img1))
    fine_j = np.asarray(fine_j).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fine_j, fine_t, atol=5e-4, rtol=1e-3)


def test_match_parity_identity_pair(torch_model, images):
    """Match-set and coordinate parity on an identical image pair. (The
    shifted case is not comparable row-by-row: the torch port's dense output
    pairs side-0 row k — indexed by image-1 cells — with side-1 row k —
    indexed by image-0 cells — which only aligns when i == j. The fine
    stages carry no weights, so the identity case fully exercises the
    converted parameters.)"""
    img0, _ = images
    params, cfg = load_torch_eloftr(
        torch_model.state_dict(), cfg=ELoFTRConfig(fine_matching_slice_dim=4)
    )
    out, _ = _torch_forward(torch_model, img0, img0.copy())
    t_idx = out.matches[0, 0].numpy()
    t_scores = out.matching_scores[0, 0].numpy()
    t_kpts = out.keypoints.numpy()
    t_valid = t_idx >= 0

    import jax.numpy as jnp

    from fusion4landslide_tpu.image.eloftr import _eloftr_core

    u0, v0, u1, v1, score, ok = _eloftr_core(
        params,
        jnp.asarray(img0),
        jnp.asarray(img0.copy()),
        EfficientLoFTRFlax(cfg),
    )
    ok = np.asarray(ok)
    # Coarse match SET and confidences must agree exactly (these exercise
    # every converted weight). For the identity pair both torch sides index
    # the same cells, so where(ok) compares directly to torch's valid rows.
    np.testing.assert_array_equal(np.where(ok)[0], np.where(t_valid)[0])
    np.testing.assert_allclose(
        np.asarray(score)[ok], t_scores[t_valid], atol=1e-4
    )
    # Sub-pixel deltas inside the 8x8 fine window differ by design: the
    # torch port's first-stage dual-softmax normalises over the keypoint
    # axis instead of the two window axes; we follow the upstream
    # (window-axes) convention. Both must stay inside the match's fine
    # window (4 px of the cell centre + 1 px second-stage shift) and the
    # identity-pair flow must be ~zero.
    h, w = img0.shape
    wc = w // 8
    ii = np.where(ok)[0]
    cx, cy = (ii % wc) * 8.0, (ii // wc) * 8.0
    assert np.abs(np.asarray(u0)[ok] - cx).max() <= 4.0
    assert np.abs(np.asarray(v0)[ok] - cy).max() <= 4.0
    flow = np.stack(
        [np.asarray(u1)[ok] - np.asarray(u0)[ok],
         np.asarray(v1)[ok] - np.asarray(v0)[ok]],
        axis=1,
    )
    assert np.abs(flow).max() < 1.0


def test_save_pretrained_directory_roundtrip(torch_model, images, tmp_path):
    """File-format contract with a REAL checkpoint download: the converter
    must consume the exact on-disk artifact ``save_pretrained`` /
    ``huggingface-cli download`` produces (model.safetensors + config.json
    directory), not just in-memory state dicts. Output parity against the
    in-memory conversion proves the serialization path end to end."""
    img0, img1 = images
    ckpt_dir = tmp_path / "efficientloftr"
    torch_model.save_pretrained(str(ckpt_dir))
    assert (ckpt_dir / "model.safetensors").exists()

    params_mem, cfg_mem = load_torch_eloftr(
        torch_model.state_dict(), cfg=ELoFTRConfig(fine_matching_slice_dim=4)
    )
    params_dsk, cfg_dsk = load_torch_eloftr(
        str(ckpt_dir), cfg=ELoFTRConfig(fine_matching_slice_dim=4)
    )
    assert cfg_dsk == cfg_mem

    m_mem, _ = eloftr_match(
        params_mem, img0, img1, model=EfficientLoFTRFlax(cfg_mem)
    )
    m_dsk, _ = eloftr_match(
        params_dsk, img0, img1, model=EfficientLoFTRFlax(cfg_dsk)
    )
    np.testing.assert_allclose(m_dsk, m_mem, atol=1e-5)

    # The matcher registry resolves the directory too (cfg key
    # img_matcher_weights -> weights= -> load_torch_eloftr).
    from fusion4landslide_tpu.image import matching as M

    uv = M.match_epoch_images(
        img0, img1, matcher="eloftr", weights=str(ckpt_dir)
    )
    assert uv.shape[1] == 4


def test_learned_matcher_falls_back_without_weights(
    images, caplog, monkeypatch
):
    """match_epoch_images with matcher='eloftr' and NO provisioned weights
    must fall back to ZNCC with a warning — random-initialised learned
    matching never runs implicitly."""
    import logging

    from fusion4landslide_tpu.image import matching as M

    # Mask any repo-shipped weights: this test covers the unprovisioned
    # path.
    monkeypatch.setattr(M, "WEIGHT_SEARCH_PATHS", ())

    img0, img1 = images
    logger = logging.getLogger("test_eloftr_fallback")
    with caplog.at_level(logging.WARNING, logger="test_eloftr_fallback"):
        out = M.match_epoch_images(
            img0, img1, matcher="eloftr", logger=logger,
            min_score=0.7, search=16,  # 32-px default leaves no grid at 64x96
        )
    assert any("falling back" in r.message for r in caplog.records)
    # ZNCC on the 8-px-shift pair produces real matches.
    assert out.shape[0] >= 10
    assert abs(np.median(out[:, 2] - out[:, 0]) - 8.0) < 1.0


def test_trained_like_weights_match_known_shift(torch_model, images):
    """End use-case: with converted weights, the matcher finds the 8-px
    shift between the image pair (flow median == shift) — the contract the
    fusion/rgb_guided pipelines rely on."""
    img0, img1 = images
    params, cfg = load_torch_eloftr(
        torch_model.state_dict(), cfg=ELoFTRConfig(fine_matching_slice_dim=4)
    )
    matches, conf = eloftr_match(
        params, img0, img1, model=EfficientLoFTRFlax(cfg)
    )
    if matches.shape[0] >= 5:  # random weights may match few cells
        du = np.median(matches[:, 2] - matches[:, 0])
        dv = np.median(matches[:, 3] - matches[:, 1])
        assert abs(du - 8.0) < 1.5
        assert abs(dv) < 1.5
