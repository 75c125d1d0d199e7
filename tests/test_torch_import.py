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
