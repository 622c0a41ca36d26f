"""Torch -> flax converter equivalence tests (torch CPU is available)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icm_tpu.utils.torch_weights import (  # noqa: E402
    convert_conv,
    convert_conv_transpose,
    convert_linear,
)


def test_conv_equivalence():
    t = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)
    x = np.random.default_rng(0).normal(size=(1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    m = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    params = convert_conv(
        t.weight.detach().numpy(), t.bias.detach().numpy()
    )
    out = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv_transpose_equivalence():
    t = torch.nn.ConvTranspose2d(4, 6, 5, stride=2, padding=2, output_padding=1)
    x = np.random.default_rng(0).normal(size=(1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    from icm_tpu.nn import deconv

    m = deconv(6, 5, 2)
    params = convert_conv_transpose(
        t.weight.detach().numpy(), t.bias.detach().numpy()
    )
    out = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_linear_equivalence():
    t = torch.nn.Linear(5, 7)
    x = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    m = nn.Dense(7)
    params = convert_linear(t.weight.detach().numpy(), t.bias.detach().numpy())
    out = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_torchvision_resnet_converter_numeric():
    """Converted torchvision-style ResNet weights reproduce the torch
    forward numerically (basic-block config, eval-mode BN)."""
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp

    from icm_tpu.tasks.resnet import ResNetBackbone
    from icm_tpu.utils.torch_weights import convert_torchvision_resnet

    torch.manual_seed(0)

    class TBasic(tnn.Module):
        def __init__(self, cin, w, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, w, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(w)
            self.conv2 = tnn.Conv2d(w, w, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(w)
            if stride != 1 or cin != w:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, w, 1, stride, bias=False),
                    tnn.BatchNorm2d(w),
                )
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = torch.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return torch.relu(h + idt)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            widths = (64, 128, 256, 512)
            for L, w in enumerate(widths, start=1):
                cin = 64 if L == 1 else widths[L - 2]
                setattr(self, f"layer{L}", tnn.Sequential(
                    TBasic(cin, w, 1 if L == 1 else 2)
                ))

    tnet = TNet().eval()
    # randomize BN stats so the test exercises running mean/var conversion
    for m in tnet.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    xt = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        h = tnet.maxpool(torch.relu(tnet.bn1(tnet.conv1(xt))))
        feats_t = []
        for L in [1, 2, 3, 4]:
            h = getattr(tnet, f"layer{L}")[0](h)
            feats_t.append(h)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_torchvision_resnet(sd, "basic", (1, 1, 1, 1))

    model = ResNetBackbone(block="basic", layers=(1, 1, 1, 1))
    x = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))
    feats_j = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), x
    )
    for ft, fj in zip(feats_t, feats_j):
        np.testing.assert_allclose(
            ft.numpy().transpose(0, 2, 3, 1), np.asarray(fj),
            rtol=1e-4, atol=1e-4,
        )
