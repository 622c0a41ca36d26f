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
