"""Parity of Flax models + weight converters vs the reference torch modules.

The reference implementation (mounted read-only at /root/reference) is
imported as the *oracle*: same weights, same input → outputs must match.
Skipped when the reference or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference model modules with the unbuilt SWIG cores stubbed."""
    sys.path.insert(0, REF)
    # src/functions.py imports the unbuilt C++ tiling module at import time.
    stub = types.ModuleType("cpp_core.pcd_tiling.build.pcd_tiling")
    pkg = types.ModuleType("cpp_core")
    sub = types.ModuleType("cpp_core.pcd_tiling")
    build = types.ModuleType("cpp_core.pcd_tiling.build")
    build.pcd_tiling = stub
    sys.modules.setdefault("cpp_core", pkg)
    sys.modules.setdefault("cpp_core.pcd_tiling", sub)
    sys.modules.setdefault("cpp_core.pcd_tiling.build", build)
    sys.modules.setdefault("cpp_core.pcd_tiling.build.pcd_tiling", stub)
    import src.models.local_feature_descriptor as lfd
    import src.models.outlier_classifier as oc
    import src.feature_aggregation.cluster_feature_net_self_attention as agg

    yield types.SimpleNamespace(lfd=lfd, oc=oc, agg=agg)
    sys.path.remove(REF)


def test_dips_parity_random_weights(ref_modules, rng):
    """Random torch init -> convert -> identical 64-d descriptors."""
    from fusion4landslide_tpu.models import PointNetFeature, torch_to_dips_params

    tmodel = ref_modules.lfd.PointNetFeature(dim=64, l2norm=True, tnet=True)
    tmodel.eval()
    # Randomise running stats too, so eval-mode BN is non-trivial.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    x = rng.normal(size=(8, 3, 256)).astype(np.float32)  # torch layout (B,3,N)
    with torch.no_grad():
        out_t, _, _ = tmodel(torch.from_numpy(x))
    out_t = out_t.numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_to_dips_params(sd)
    jmodel = PointNetFeature()
    out_j = np.asarray(jmodel.apply(params, np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)


def test_filtering_parity_shipped_weights(ref_modules, rng):
    """Shipped outlier_classifier_best.pt through torch vs Flax."""
    from fusion4landslide_tpu.models import (
        FilteringNetwork,
        torch_to_filtering_params,
    )
    from fusion4landslide_tpu.models.convert import load_torch_checkpoint

    ckpt = os.path.join(REF, "weights", "outlier_classifier_best.pt")
    tmodel = ref_modules.oc.FilteringNetwork()
    tmodel.load_state_dict(torch.load(ckpt, map_location="cpu"))
    tmodel.eval()

    n = 200
    corr = rng.normal(size=(n, 6)).astype(np.float32)
    with torch.no_grad():
        w_t = tmodel.compute_weights(
            torch.from_numpy(corr).reshape(1, 1, n, 6)
        ).numpy()[0]

    params = torch_to_filtering_params(load_torch_checkpoint(ckpt))
    jmodel = FilteringNetwork()
    w_j = np.asarray(jmodel.apply(params, corr, np.ones(n, bool)))
    np.testing.assert_allclose(w_j, w_t, atol=1e-4)


def test_filtering_mask_equals_truncation(ref_modules, rng):
    from fusion4landslide_tpu.models import FilteringNetwork
    import jax

    model = FilteringNetwork(num_layers=2)
    corr = rng.normal(size=(50, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), corr, np.ones(50, bool))
    w_full = np.asarray(model.apply(params, corr, np.ones(50, bool)))
    padded = np.vstack([corr, 9.0 * np.ones((20, 6), np.float32)])
    mask = np.arange(70) < 50
    w_pad = np.asarray(model.apply(params, padded, mask))
    np.testing.assert_allclose(w_pad[:50], w_full, atol=1e-5)
    assert (w_pad[50:] == 0).all()


def test_aggregation_parity_shipped_weights(ref_modules, rng):
    """Shipped feat_aggregation_3d.pth: reference loop vs masked-batch Flax."""
    from fusion4landslide_tpu.models import (
        ClusterFeatureNet,
        aggregate_superpoints,
        torch_to_aggregation_params,
    )
    from fusion4landslide_tpu.models.convert import load_torch_checkpoint

    ckpt = os.path.join(REF, "weights", "feat_aggregation_3d.pth")

    class Cfg:
        input_feat_dim = 64
        hidden_feat_dim = 64
        output_feat_dim = 64
        mode = "test"

    tmodel = ref_modules.agg.ClusterFeatureNetWithAttention(Cfg())
    raw = torch.load(ckpt, map_location="cpu", weights_only=False)
    tmodel.load_state_dict(raw["state_dict"] if "state_dict" in raw else raw)
    tmodel.eval()

    n_pts, feat_dim = 300, 64
    feats = rng.normal(size=(n_pts, feat_dim)).astype(np.float32)
    coords = rng.normal(size=(n_pts, 3)).astype(np.float32)
    # 5 superpoints of varying sizes
    sizes = [40, 90, 17, 100, 53]
    idx_spt2pts = []
    start = 0
    for s in sizes:
        idx_spt2pts.append(np.arange(start, start + s))
        start += s

    with torch.no_grad():
        tf, tc = tmodel.aggregation(
            [torch.from_numpy(i) for i in idx_spt2pts],
            torch.from_numpy(feats).unsqueeze(0),
            torch.from_numpy(coords).unsqueeze(0),
            idx_pts2voxel_src=torch.arange(n_pts),
        )
    tf, tc = tf.numpy(), tc.numpy()

    # Flax path: padded member buckets.
    P = max(sizes)
    member_idx = np.zeros((len(sizes), P), np.int32)
    member_mask = np.zeros((len(sizes), P), bool)
    for i, ix in enumerate(idx_spt2pts):
        member_idx[i, : len(ix)] = ix
        member_mask[i, : len(ix)] = True
    params = torch_to_aggregation_params(load_torch_checkpoint(ckpt))
    jf, jc = aggregate_superpoints(
        params, feats, coords, member_idx, member_mask,
        model=ClusterFeatureNet(),
    )
    np.testing.assert_allclose(np.asarray(jf), tf, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jc), tc, atol=1e-5)
