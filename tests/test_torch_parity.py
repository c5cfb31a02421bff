"""Numeric parity vs torch (CPU) + checkpoint-importer round trips.

The reference model zoo ships torch ``.pth`` checkpoints; these tests build
small torch modules with pcdet-style naming, import their weights through
``import_torch_state_dict``, and require our flax layers to reproduce the
torch forward outputs — validating conv/BN/convT semantics AND the layout
adaptation (OIHW->HWIO etc.) in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from q3d_tpu.models.layers import Conv2d, ConvTranspose2d, BatchNorm, relu  # noqa: E402
from q3d_tpu.utils.checkpoint import import_torch_state_dict, adapt_torch_tensor  # noqa: E402


def _to_nhwc(x_nchw):
    return jnp.asarray(x_nchw.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def test_conv_bn_relu_block_parity():
    torch.manual_seed(0)
    tmod = tnn.Sequential(
        tnn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False),
        tnn.BatchNorm2d(16, eps=1e-3, momentum=0.01),
        tnn.ReLU(),
    ).eval()
    # randomize BN stats so eval mode is non-trivial
    tmod[1].running_mean.data = torch.randn(16) * 0.2
    tmod[1].running_var.data = torch.rand(16) + 0.5

    class FMod(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = Conv2d(16, 3, 2, 1, use_bias=False, name="conv")(x)
            x = BatchNorm(name="norm")(x, train)
            return relu(x)

    x = torch.randn(2, 8, 10, 10)
    fmod = FMod()
    variables = fmod.init(jax.random.PRNGKey(0), _to_nhwc(x))
    variables = import_torch_state_dict(tmod.state_dict(), variables)
    out = fmod.apply(variables, _to_nhwc(x))
    ref = tmod(x).detach().numpy()
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4, rtol=1e-4)


def test_conv_transpose_parity():
    torch.manual_seed(1)
    tconv = tnn.ConvTranspose2d(6, 12, 2, stride=2, bias=False).eval()

    class FMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvTranspose2d(12, 2, 2, 0, use_bias=False, name="deconv")(x)

    x = torch.randn(1, 6, 7, 7)
    fmod = FMod()
    variables = fmod.init(jax.random.PRNGKey(0), _to_nhwc(x))
    variables = import_torch_state_dict(tconv.state_dict(), variables)
    out = fmod.apply(variables, _to_nhwc(x))
    ref = tconv(x).detach().numpy()
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4, rtol=1e-4)


def test_conv_transpose_stride3_padding_parity():
    torch.manual_seed(2)
    tconv = tnn.ConvTranspose2d(4, 8, 4, stride=2, padding=1, bias=True).eval()

    class FMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvTranspose2d(8, 4, 2, 1, use_bias=True, name="deconv")(x)

    x = torch.randn(1, 4, 9, 9)
    fmod = FMod()
    variables = fmod.init(jax.random.PRNGKey(0), _to_nhwc(x))
    variables = import_torch_state_dict(tconv.state_dict(), variables)
    out = fmod.apply(variables, _to_nhwc(x))
    ref = tconv(x).detach().numpy()
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4, rtol=1e-4)


def test_spconv_weight_adaptation():
    # spconv2 layout (O, kd, kh, kw, I) -> ours (K, I, O)
    w = np.random.randn(32, 3, 3, 3, 16).astype(np.float32)
    ours = adapt_torch_tensor(w, (27, 16, 32))
    # element check: our row k=(kd,kh,kw) flattened k0-major
    assert ours[0, 5, 7] == w[7, 0, 0, 0, 5]
    k = 1 * 9 + 2 * 3 + 1
    assert ours[k, 3, 9] == w[9, 1, 2, 1, 3]
    # spconv1 layout (kd, kh, kw, I, O)
    w1 = np.random.randn(3, 3, 3, 16, 32).astype(np.float32)
    ours1 = adapt_torch_tensor(w1, (27, 16, 32))
    assert ours1[k, 3, 9] == w1[1, 2, 1, 3, 9]


def test_linear_bn1d_parity():
    torch.manual_seed(3)

    class TPFN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear = tnn.Linear(10, 32, bias=False)
            self.norm = tnn.BatchNorm1d(32, eps=1e-3, momentum=0.01)

        def forward(self, x):           # x: (N, P, 10)
            y = self.linear(x)
            y = self.norm(y.permute(0, 2, 1)).permute(0, 2, 1)
            return torch.relu(y).max(dim=1, keepdim=True)[0]

    tmod = TPFN().eval()
    tmod.norm.running_mean.data = torch.randn(32) * 0.1
    tmod.norm.running_var.data = torch.rand(32) + 0.5

    from q3d_tpu.models.backbones_3d.vfe.pillar_vfe import PFNLayer
    x = torch.randn(40, 16, 10)
    fmod = PFNLayer(out_channels=32, last_layer=True)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))
    variables = import_torch_state_dict(tmod.state_dict(), variables)
    out = np.asarray(fmod.apply(variables, jnp.asarray(x.numpy())))
    ref = tmod(x).detach().numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
