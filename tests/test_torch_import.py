"""Torch→flax weight import parity: a torchvision ResNet-18 trunk with random
weights must produce the same pooled features as the flax encoder after
conversion (proves layout transposes + BN stat wiring)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from soccerplayershapepose_tpu.io.torch_import import (  # noqa: E402
    convert_resnet18_encoder, convert_ief_head, _to_numpy)
from soccerplayershapepose_tpu.models.resnet import resnet18  # noqa: E402


class _TorchBasicBlock(torch.nn.Module):
    """Standard ResNet basic block with torchvision state-dict naming."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.relu = torch.nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class _TorchResNet18(torch.nn.Module):
    """Torchvision-shaped ResNet-18 trunk (no torchvision in this image)."""

    def __init__(self, in_channels):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for i, w in enumerate(widths, start=1):
            blocks = torch.nn.Sequential(
                _TorchBasicBlock(cin, w, 1 if i == 1 else 2),
                _TorchBasicBlock(w, w, 1))
            setattr(self, f"layer{i}", blocks)
            cin = w

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x.mean(dim=(2, 3))


def _torch_resnet18(in_channels):
    return _TorchResNet18(in_channels).eval()


@pytest.mark.slow
def test_resnet18_feature_parity():
    torch.manual_seed(0)
    tmodel = _torch_resnet18(in_channels=18)
    # randomize BN running stats so the test actually checks their wiring
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)

    sd = _to_numpy(tmodel.state_dict())
    params, stats = convert_resnet18_encoder(sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 18).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    flax_model = resnet18()
    got = np.asarray(flax_model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))

    assert got.shape == want.shape == (2, 512)
    # XLA:CPU sometimes loads persistent-cache AOT artifacts compiled for a
    # different machine-feature set (see cpu_aot_loader warnings), which
    # perturbs conv numerics run-to-run. Weight-layout mistakes produce O(1)
    # errors, so a loose tolerance still guards the conversion.
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_ief_head_conversion_shapes():
    sd = {
        "fc1.weight": np.zeros((512, 512 + 157), np.float32),
        "fc1.bias": np.zeros((512,), np.float32),
        "fc2.weight": np.zeros((512, 512), np.float32),
        "fc2.bias": np.zeros((512,), np.float32),
        "fc3.weight": np.zeros((157, 512), np.float32),
        "fc3.bias": np.zeros((157,), np.float32),
    }
    p = convert_ief_head(sd)
    assert p["Dense_0"]["kernel"].shape == (512 + 157, 512)
    assert p["Dense_2"]["kernel"].shape == (512, 157)


def _numpy_relation_reference(f_a, boxes, units, dim_g, lift=None):
    """Independent numpy oracle of the reference PoseRelationModule math
    (regressor_relate.py:34-139 / regressor_relate1.py 16-unit variant)."""
    n = f_a.shape[0]
    x1, y1, x2, y2 = boxes.T
    cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
    w, h = x2 - x1 + 1.0, y2 - y1 + 1.0
    dx = np.log(np.maximum(np.abs((cx[:, None] - cx[None, :]) / w[:, None]), 1e-3))
    dy = np.log(np.maximum(np.abs((cy[:, None] - cy[None, :]) / h[:, None]), 1e-3))
    dw = np.log(w[:, None] / w[None, :])
    dh = np.log(h[:, None] / h[None, :])
    pos = np.stack([dx, dy, dw, dh], axis=-1)                  # (N,N,4)
    n_freq = dim_g // 8
    inv_freq = 1.0 / np.power(1000.0, np.arange(n_freq) / n_freq)
    ang = (100.0 * pos[..., None] * inv_freq).reshape(n, n, 4 * n_freq)
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)  # (N,N,dim_g)

    feats = f_a
    if lift is not None:
        feats = f_a @ lift["fc1.weight"].T + lift["fc1.bias"]

    outs = []
    for u in units:
        dk = u["WK.weight"].shape[0]
        wg = np.maximum(emb.reshape(-1, dim_g) @ u["WG.weight"].T
                        + u["WG.bias"], 0.0).reshape(n, n)
        k = feats @ u["WK.weight"].T + u["WK.bias"]
        q = feats @ u["WQ.weight"].T + u["WQ.bias"]
        v = feats @ u["WV.weight"].T + u["WV.bias"]
        logits = (k @ q.T) / np.sqrt(dk) + np.log(np.maximum(wg, 1e-6))
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        attn = e / e.sum(axis=1, keepdims=True)
        outs.append(attn @ v)
    concat = np.concatenate(outs, axis=-1) + feats
    if lift is not None:
        concat = concat @ lift["fc2.weight"].T + lift["fc2.bias"]
    return concat.reshape(n, 24, 3, 3)


def _make_relation_sd(rng, n_units, dk, dim_g, feat_dim, lift_dim=None):
    sd = {}
    d_in = lift_dim if lift_dim else feat_dim
    for i in range(n_units):
        p = f"relation_module.relation.{i}."
        sd[p + "WG.weight"] = rng.randn(1, dim_g).astype(np.float32)
        sd[p + "WG.bias"] = rng.randn(1).astype(np.float32)
        for nm in ("WK", "WQ", "WV"):
            sd[p + nm + ".weight"] = (rng.randn(dk, d_in) / np.sqrt(d_in)
                                      ).astype(np.float32)
            sd[p + nm + ".bias"] = rng.randn(dk).astype(np.float32) * 0.1
    if lift_dim:
        sd["fc1.weight"] = (rng.randn(lift_dim, feat_dim)
                            / np.sqrt(feat_dim)).astype(np.float32)
        sd["fc1.bias"] = rng.randn(lift_dim).astype(np.float32) * 0.1
        sd["fc2.weight"] = (rng.randn(feat_dim, lift_dim)
                            / np.sqrt(lift_dim)).astype(np.float32)
        sd["fc2.bias"] = rng.randn(feat_dim).astype(np.float32) * 0.1
    return sd


@pytest.mark.parametrize("variant", ["v0", "v1"])
def test_relation_import_parity(variant):
    from soccerplayershapepose_tpu.io.torch_import import (
        convert_relation_state_dict)
    from soccerplayershapepose_tpu.models.relation import PoseRelationModule

    rng = np.random.RandomState(3)
    n = 4
    f_a = rng.randn(n, 216).astype(np.float32) * 0.3
    xy = rng.uniform(0, 300, (n, 2))
    wh = rng.uniform(40, 200, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)

    if variant == "v0":
        n_units, dk, dim_g, lift_dim = 27, 8, 8, None
        mod = PoseRelationModule()
    else:
        n_units, dk, dim_g, lift_dim = 16, 64, 64, 1024
        mod = PoseRelationModule(n_relations=16, key_dim=64, geo_dim=64,
                                 lift_dim=1024)
    sd = _make_relation_sd(rng, n_units, dk, dim_g, 216, lift_dim)
    variables = convert_relation_state_dict(sd)

    units = [{k[len(f"relation_module.relation.{i}."):]: v
              for k, v in sd.items()
              if k.startswith(f"relation_module.relation.{i}.")}
             for i in range(n_units)]
    lift = ({"fc1.weight": sd["fc1.weight"], "fc1.bias": sd["fc1.bias"],
             "fc2.weight": sd["fc2.weight"], "fc2.bias": sd["fc2.bias"]}
            if lift_dim else None)
    # valid boxes (x2>x1) keep the geometry logs finite, so equal_nan in
    # assert_allclose cannot mask a broken conversion
    want = _numpy_relation_reference(f_a.astype(np.float64),
                                     boxes.astype(np.float64),
                                     units, dim_g, lift)

    assert np.isfinite(want).all()
    got = mod.apply(variables, jnp.asarray(f_a.reshape(1, n, 24, 3, 3)),
                    jnp.asarray(boxes[None]))
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-4)


def test_load_relation_checkpoint_roundtrip(tmp_path):
    from soccerplayershapepose_tpu.io.torch_import import (
        load_relation_checkpoint)
    rng = np.random.RandomState(0)
    sd = _make_relation_sd(rng, 27, 8, 8, 216)
    tsd = {k: torch.from_numpy(v) for k, v in sd.items()}
    path = str(tmp_path / "relate.tar")
    torch.save({"best_model_state_dict": tsd}, path)
    variables = load_relation_checkpoint(path)
    assert variables["params"]["WK"]["kernel"].shape == (216, 27, 8)
    assert variables["params"]["WG"]["kernel"].shape == (8, 27)
