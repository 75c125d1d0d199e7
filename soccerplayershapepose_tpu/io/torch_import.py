"""Torch-checkpoint → flax parameter conversion.

The reference ships trained weights as torch ``.tar`` checkpoints
(``straps_model_checkpoint.tar`` with ``best_model_state_dict`` —
``/root/reference/Python/Soccer/global_var.py:59``,
``player_recon.py:1061-1063``). This module maps a torch state dict of the
reference ``SingleInputRegressor`` (torchvision-style ResNet-18/50 encoder +
3-layer IEF head) onto the flax module tree of
``soccerplayershapepose_tpu.models.regressor.SingleInputRegressor`` so
TPU inference reproduces trained-model outputs without retraining.

Layout transforms: conv (O,I,kh,kw) → (kh,kw,I,O); linear (O,I) → (I,O);
BatchNorm weight/bias → scale/bias, running stats → batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _linear(w) -> np.ndarray:
    return np.asarray(w).transpose(1, 0)


def _to_numpy(state_dict: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def convert_resnet18_encoder(sd: Dict[str, np.ndarray], prefix: str = ""
                             ) -> Tuple[dict, dict]:
    """Torch resnet18 state dict → (flax params, batch_stats) for
    models.resnet.ResNet(BasicBlock, (2,2,2,2))."""
    params: dict = {}
    stats: dict = {}

    def bn(dst_scope: str, src: str):
        params[dst_scope] = {"scale": sd[prefix + src + ".weight"],
                             "bias": sd[prefix + src + ".bias"]}
        stats[dst_scope] = {"mean": sd[prefix + src + ".running_mean"],
                            "var": sd[prefix + src + ".running_var"]}

    params["Conv_0"] = {"kernel": _conv(sd[prefix + "conv1.weight"])}
    bn("BatchNorm_0", "bn1")

    block = 0
    for stage in range(1, 5):
        for unit in range(2):
            src = f"layer{stage}.{unit}"
            scope = f"BasicBlock_{block}"
            bparams = {"Conv_0": {"kernel": _conv(sd[prefix + src + ".conv1.weight"])},
                       "Conv_1": {"kernel": _conv(sd[prefix + src + ".conv2.weight"])}}
            bstats = {}

            def bbn(dst, s):
                bparams[dst] = {"scale": sd[prefix + s + ".weight"],
                                "bias": sd[prefix + s + ".bias"]}
                bstats[dst] = {"mean": sd[prefix + s + ".running_mean"],
                               "var": sd[prefix + s + ".running_var"]}

            bbn("BatchNorm_0", src + ".bn1")
            bbn("BatchNorm_1", src + ".bn2")
            if prefix + src + ".downsample.0.weight" in sd:
                bparams["Conv_2"] = {
                    "kernel": _conv(sd[prefix + src + ".downsample.0.weight"])}
                bbn("BatchNorm_2", src + ".downsample.1")
            params[scope] = bparams
            stats[scope] = bstats
            block += 1
    return params, stats


def convert_ief_head(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Torch IEF fc1/fc2/fc3 → flax IEFModule Dense_0/1/2 params."""
    return {
        "Dense_0": {"kernel": _linear(sd[prefix + "fc1.weight"]),
                    "bias": sd[prefix + "fc1.bias"]},
        "Dense_1": {"kernel": _linear(sd[prefix + "fc2.weight"]),
                    "bias": sd[prefix + "fc2.bias"]},
        "Dense_2": {"kernel": _linear(sd[prefix + "fc3.weight"]),
                    "bias": sd[prefix + "fc3.bias"]},
    }


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    import jax.numpy as jnp
    return jnp.asarray(tree, jnp.float32)


def convert_regressor_state_dict(state_dict: Dict) -> dict:
    """Full reference SingleInputRegressor state dict → flax variables
    ({'params', 'batch_stats'}) for the flax SingleInputRegressor."""
    sd = _to_numpy(state_dict)
    enc_params, enc_stats = convert_resnet18_encoder(sd, "image_encoder.")
    ief_params = convert_ief_head(sd, "ief_module.")
    params = {"ResNet_0": enc_params, "IEFModule_0": ief_params}
    stats = {"ResNet_0": enc_stats}
    return {"params": _to_f32(params), "batch_stats": _to_f32(stats)}


def convert_relation_state_dict(state_dict: Dict) -> dict:
    """Reference PoseRelationModule state dict → flax variables for
    ``models.relation.PoseRelationModule``.

    Handles both reference variants:

    * v0 (``regressor_relate.py``): 27 ``RelationUnit``s, key dim 8,
      keys ``relation_module.relation.{i}.{WG,WK,WQ,WV}.{weight,bias}``.
    * v1 (``regressor_relate1.py``): extra ``fc1``/``fc2`` lift layers
      (216→1024→216), 16 units of dim 64.

    The per-unit ``nn.Linear``s are stacked into the fused DenseGeneral
    heads of the flax module: torch WK.weight (dk, F) per unit → flax
    kernel (F, H, dk); torch WG.weight (1, G) per unit → flax kernel (G, H).
    """
    sd = _to_numpy(state_dict)
    pre = "relation_module.relation."
    units = sorted({int(k[len(pre):].split(".")[0])
                    for k in sd if k.startswith(pre)})
    if not units or units != list(range(len(units))):
        raise ValueError(
            "state dict does not look like a reference PoseRelationModule "
            f"(found relation unit indices {units})")
    h = len(units)

    def stack(name: str, attr: str) -> np.ndarray:
        return np.stack([sd[f"{pre}{i}.{name}.{attr}"] for i in range(h)])

    params: dict = {}
    for name in ("WK", "WQ", "WV"):
        params[name] = {
            # (H, dk, F) → (F, H, dk)
            "kernel": stack(name, "weight").transpose(2, 0, 1),
            "bias": stack(name, "bias"),                    # (H, dk)
        }
    params["WG"] = {
        "kernel": stack("WG", "weight")[:, 0, :].transpose(1, 0),  # (G, H)
        "bias": stack("WG", "bias")[:, 0],                         # (H,)
    }
    if "fc1.weight" in sd:
        params["lift"] = {"kernel": _linear(sd["fc1.weight"]),
                          "bias": sd["fc1.bias"]}
        params["proj_back"] = {"kernel": _linear(sd["fc2.weight"]),
                               "bias": sd["fc2.bias"]}
    return {"params": _to_f32(params)}


def load_straps_checkpoint(path: str, key: str = "best_model_state_dict") -> dict:
    """Load a reference ``.tar`` checkpoint file and convert it.

    Requires torch for unpickling (CPU build is available in this image).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu")
    return convert_regressor_state_dict(ckpt[key])


def load_relation_checkpoint(path: str,
                             key: str = "best_model_state_dict") -> dict:
    """Load a reference relation-module ``.tar`` checkpoint
    (``PyTorch3DTest.py:1591`` ``pose_relation.load_state_dict(...)``) and
    convert it.  Accepts either a checkpoint dict containing ``key`` or a
    bare state dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt[key] if isinstance(ckpt, dict) and key in ckpt else ckpt
    return convert_relation_state_dict(sd)
