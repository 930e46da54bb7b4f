"""LoFTR-family learned matcher: architecture sanity (random weights)."""

import jax
import numpy as np
import pytest

from fusion4landslide_tpu.image.loftr import LoFTRMatcher, loftr_match


@pytest.fixture(scope="module")
def model_params():
    model = LoFTRMatcher(layers=1)  # small for CPU
    dummy = np.zeros((64, 64), np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    return model, params


def test_identical_images_match_identity(model_params, rng):
    model, params = model_params
    img = rng.uniform(0, 255, size=(64, 64)).astype(np.float32)
    uv, conf = loftr_match(params, img, img, model=model, match_threshold=0.0)
    assert uv.shape[0] > 10
    # identical images: the dual-softmax argmax lands on the same coarse
    # cell for (almost) every token — random weights may flip a near-tie.
    d = np.abs(uv[:, 0] - uv[:, 2]) + np.abs(uv[:, 1] - uv[:, 3])
    assert (d < 5.0).mean() > 0.9
    assert np.median(d) < 1.0


def test_output_contract(model_params, rng):
    model, params = model_params
    a = rng.uniform(0, 255, size=(60, 70)).astype(np.float32)  # non-/8 sizes
    b = rng.uniform(0, 255, size=(60, 70)).astype(np.float32)
    uv, conf = loftr_match(params, a, b, model=model, match_threshold=0.0)
    assert uv.shape[1] == 4
    assert conf.shape[0] == uv.shape[0]
    assert (conf >= 0).all()


def test_registry_exposes_loftr():
    from fusion4landslide_tpu.image.matching import MATCHERS

    assert "loftr" in MATCHERS and "zncc" in MATCHERS
