"""torch checkpoint → Flax parameter conversion.

The reference ships torch ``state_dict`` checkpoints
(weights/feat_aggregation_3d.pth, weights/outlier_classifier_best.pt; DIPs
``local_feature_descriptor_best.pth`` is downloaded per README.md:85). These
converters map them onto the Flax modules in this package. Conventions:

- torch ``Linear``/1x1-conv weight (out, in[, 1, 1]) → Dense kernel (in, out),
- BatchNorm running stats become EvalBatchNorm parameters,
- Instance/Batch norms without affine/stats have no parameters (computed on
  the fly).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "torch_to_dips_params",
    "torch_to_filtering_params",
    "torch_to_aggregation_params",
]


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a torch state_dict as plain numpy arrays (CPU torch required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()}


def _dense(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    w = sd[prefix + ".weight"]
    w = w.reshape(w.shape[0], w.shape[1])  # squeeze 1x1 conv spatial dims
    return {"kernel": w.T.copy(), "bias": sd[prefix + ".bias"].copy()}


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {
        "scale": sd[prefix + ".weight"].copy(),
        "bias": sd[prefix + ".bias"].copy(),
        "mean": sd[prefix + ".running_mean"].copy(),
        "var": sd[prefix + ".running_var"].copy(),
    }


def _dips_trunk(sd: Mapping[str, np.ndarray], p: str, fc2_bn_idx: int) -> dict:
    """Shared conv/fc trunk of STN3d and PointNetFeature
    (local_feature_descriptor.py:10-29, 66-84)."""
    return {
        "conv1": _dense(sd, f"{p}conv1.0"),
        "bn1": _bn(sd, f"{p}conv1.1"),
        "conv2": _dense(sd, f"{p}conv2.0"),
        "bn2": _bn(sd, f"{p}conv2.1"),
        "conv3": _dense(sd, f"{p}conv3.0"),
        "bn3": _bn(sd, f"{p}conv3.1"),
        "fc1": _dense(sd, f"{p}fc1.0"),
        "bn4": _bn(sd, f"{p}fc1.1"),
        "fc2": _dense(sd, f"{p}fc2.0"),
        "bn5": _bn(sd, f"{p}fc2.{fc2_bn_idx}"),
    }


def torch_to_dips_params(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """PointNetFeature (+STN3d) state_dict → Flax params.

    The main net's fc2 Sequential contains a Dropout at index 1, so its
    BatchNorm sits at index 2; STN3d's at index 1
    (local_feature_descriptor.py:21-28, 81-85).
    """
    params = {
        "stn3d": {
            "trunk": _dips_trunk(sd, "stn3d.", 1),
            "fc3": _dense(sd, "stn3d.fc3.0"),
        },
        "trunk": _dips_trunk(sd, "", 2),
        "fc3": _dense(sd, "fc3.0"),
    }
    return {"params": params}


def torch_to_filtering_params(
    sd: Mapping[str, np.ndarray], num_layers: int = 12
) -> dict[str, Any]:
    """FilteringNetwork state_dict → Flax params (outlier_classifier.py:32-48;
    the Instance/Batch norms are affine-free and contribute no weights)."""
    params: dict[str, Any] = {"l1": _dense(sd, "l1")}
    for i in range(num_layers):
        params[f"block{i}"] = {
            "conv0": _dense(sd, f"l2.{i}.conv.0"),
            "conv1": _dense(sd, f"l2.{i}.conv.4"),
        }
    params["output"] = _dense(sd, "output")
    return {"params": params}


def torch_to_aggregation_params(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """ClusterFeatureNetWithAttention state_dict → Flax params
    (cluster_feature_net_self_attention.py:5-53)."""
    params = {
        "query": _dense(sd, "self_attention.query"),
        "key": _dense(sd, "self_attention.key"),
        "value": _dense(sd, "self_attention.value"),
        "fc": _dense(sd, "self_attention.fc"),
        "mlp0": _dense(sd, "mlp.0"),
        "mlp1": _dense(sd, "mlp.2"),
    }
    return {"params": params}
