"""In-environment EfficientLoFTR training (image.eloftr_train).

The reference runs the downloaded trained checkpoint
(/root/reference/README.md:85, base:1065); with no egress here, the
compact configuration is trained on the synthetic homography curriculum
and shipped as weights/eloftr_tiny.npz (same scheme as the RoMa family).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fusion4landslide_tpu.image.eloftr import (  # noqa: E402
    EfficientLoFTRFlax,
    ELoFTRConfig,
    load_eloftr_weights,
    save_eloftr_weights,
)
from fusion4landslide_tpu.image.eloftr_train import train_eloftr  # noqa: E402
from fusion4landslide_tpu.image.roma_train import (  # noqa: E402
    TrainSettings,
    make_pair,
)

TINY = ELoFTRConfig(
    stage_num_blocks=(1, 1, 1, 1),
    out_features=(8, 8, 16, 32),
    hidden_size=32,
    num_attention_layers=1,
    fine_matching_slice_dim=4,
)


def test_weights_roundtrip(tmp_path):
    model = EfficientLoFTRFlax(TINY)
    img = np.zeros((64, 64), np.float32)
    params = model.init(jax.random.PRNGKey(0), img, img)
    path = str(tmp_path / "eloftr_tiny.npz")
    save_eloftr_weights(path, params, TINY)
    params2, cfg2 = load_eloftr_weights(path)
    assert cfg2 == TINY
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
        params,
        params2,
    )


@pytest.mark.slow  # r5 fast-suite trim: the shipped-weights recovery
# test covers the trained path fast; this drives the training loop
def test_training_reduces_coarse_ce():
    """The architecture learns: a short synthetic-homography run must cut
    the coarse matching cross-entropy substantially from random init."""
    settings = TrainSettings(
        size=64, steps=60, lr=3e-3, batch=2, max_rot=0.05, max_shift=0.15
    )
    params, cfg, history = train_eloftr(
        settings, TINY, seed=0, log_every=15
    )
    assert history[-1][0] < 0.7 * history[0][0]  # coarse CE
    assert np.isfinite(history[-1]).all()


def test_shipped_eloftr_weights_recover_warp():
    """When the repository ships trained EfficientLoFTR weights
    (weights/eloftr_tiny.npz), the registry resolves them from any cwd —
    no explicit ``weights=`` — and 'eloftr' (the reference's production
    matcher, base:1065) recovers a planted warp on a textured pair with
    no ZNCC fallback."""
    from fusion4landslide_tpu.image import matching as M

    path = M.resolve_learned_weights(None, M.WEIGHT_SEARCH_PATHS)
    if path is None or not str(path).endswith(".npz"):
        pytest.skip(
            "no shipped ELoFTR weights (train with image.eloftr_train)"
        )
    rng = np.random.default_rng(11)
    settings = TrainSettings(size=96, max_rot=0.0, max_shift=0.12)
    img0, img1, warp_gt, valid = make_pair(rng, settings)
    out = M.match_epoch_images(img0, img1, matcher="eloftr")
    assert out.shape[0] > 20
    n = settings.size
    gx = np.clip(out[:, 0].round().astype(int), 0, n - 1)
    gy = np.clip(out[:, 1].round().astype(int), 0, n - 1)
    gt = (warp_gt[gy, gx] + 1) * 0.5 * n
    err = np.linalg.norm(out[:, 2:4] - gt, axis=1)
    ok = valid[gy, gx]
    assert np.median(err[ok]) < 4.0
