"""UNet-3D parity vs a torch oracle.

Builds torch modules with the reference's state_dict naming (ec*/dc*),
converts their weights with convert_torch_unet_state_dict, and checks the
JAX model reproduces the torch forward pass — validating simultaneously the
model math (conv/upconv/pool/relu/bn wiring) and the torch-checkpoint
conversion used to load the shipped segmentation weights.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D  # noqa: E402
from oai_analysis_2_tpu.models.cascade import make_unet_light4x2  # noqa: E402
from oai_analysis_2_tpu.utils.checkpoint import convert_torch_unet_state_dict  # noqa: E402


def _enc_block(cin, cout, bias, bn):
    layers = [nn.Conv3d(cin, cout, 3, padding=1, bias=bias)]
    if bn:
        layers.append(nn.BatchNorm3d(cout))
    layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def _dec_block(cin, cout, k, s, p, bias, bn):
    layers = [nn.ConvTranspose3d(cin, cout, k, stride=s, padding=p, bias=bias)]
    if bn:
        layers.append(nn.BatchNorm3d(cout))
    layers.append(nn.ReLU())
    return nn.Sequential(*layers)


class TorchUNetOracle(nn.Module):
    """Reference-architecture UNet assembled from the spec tables, with the
    reference's parameter naming so the converter's key mapping is tested."""

    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        cin = spec.in_channels
        for li, (ca, cb) in enumerate(spec.enc):
            setattr(self, f"ec{2 * li}", _enc_block(cin, ca, spec.bias, spec.batchnorm))
            setattr(self, f"ec{2 * li + 1}", _enc_block(ca, cb, spec.bias, spec.batchnorm))
            cin = cb
        self.pool = nn.MaxPool3d(2)
        L = len(spec.dec)
        cur = spec.enc[-1][1]
        for li, (cu, c1, c2) in enumerate(spec.dec):
            base = 3 * (L - li)
            skip = spec.enc[len(spec.enc) - 2 - li][1]
            setattr(self, f"dc{base}", _dec_block(cur, cu, 2, 2, 0, spec.bias, spec.batchnorm))
            setattr(self, f"dc{base - 1}", _dec_block(cu + skip, c1, 3, 1, 1, spec.bias, spec.batchnorm))
            setattr(self, f"dc{base - 2}", _dec_block(c1, c2, 3, 1, 1, spec.bias, spec.batchnorm))
            cur = c2
        self.dc0 = nn.Conv3d(cur, spec.n_classes, 1, bias=spec.bias)

    def forward(self, x):
        spec = self.spec
        skips = []
        for li in range(len(spec.enc)):
            x = getattr(self, f"ec{2 * li}")(x)
            x = getattr(self, f"ec{2 * li + 1}")(x)
            if li < len(spec.enc) - 1:
                skips.append(x)
                x = self.pool(x)
        L = len(spec.dec)
        for li in range(L):
            base = 3 * (L - li)
            up = getattr(self, f"dc{base}")(x)
            x = torch.cat([up, skips[len(skips) - 1 - li]], dim=1)
            x = getattr(self, f"dc{base - 1}")(x)
            x = getattr(self, f"dc{base - 2}")(x)
        return self.dc0(x)


def _randomize(model, seed=0):
    """Fan-in-scaled random weights: keeps activations O(1) through any depth
    so absolute tolerances stay meaningful."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 5:
                fan_in = p.shape[1] * p.shape[2] * p.shape[3] * p.shape[4]
                std = 1.5 / np.sqrt(fan_in)
            else:
                std = 0.05
            p.copy_(torch.randn(p.shape, generator=g) * std)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return model


def _compare(spec, shape_zyx=(8, 8, 8), atol=2e-4):
    oracle = _randomize(TorchUNetOracle(spec)).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_torch_unet_state_dict(sd, spec)
    model = UNet3D(spec, compute_dtype=jnp.float32, precision="highest")

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, spec.in_channels) + shape_zyx).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()  # (N, C, D, H, W)
    got = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    got = got.transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)


class TestUNetParity:
    def test_unet_full(self):
        _compare(NETWORK_SPECS["UNet"])

    def test_unet_bias_bn(self):
        _compare(NETWORK_SPECS["UNet"].replace(bias=True, batchnorm=True))

    @pytest.mark.parametrize("name", ["UNet_light1", "UNet_light2", "UNet_light3", "UNet_light4"])
    def test_light_variants(self, name):
        _compare(NETWORK_SPECS[name])

    def test_light4_2(self):
        _compare(NETWORK_SPECS["UNet_light4_2"], shape_zyx=(4, 4, 4))


class TestModelBasics:
    def test_classwise_heads_shape(self):
        spec = NETWORK_SPECS["UNetClassWise"]
        model = UNet3D(spec)
        params = model.init(jnp.asarray(np.array([0, 1], np.uint32)))
        import jax

        x = jnp.ones((1, 8, 8, 8, 1))
        out = model.apply(params, x)
        assert out.shape == (1, 8, 8, 8, 2)

    def test_cascade_runs(self):
        import jax

        cascade = make_unet_light4x2()
        params = cascade.init(jax.random.PRNGKey(0))
        out = cascade.apply(params, jnp.ones((1, 4, 4, 4, 1)))
        assert out.shape == (1, 4, 4, 4, 2)
        outs = cascade.apply(params, jnp.ones((1, 4, 4, 4, 1)), multi_output=True)
        assert len(outs) == 2

    def test_bfloat16_compute(self):
        import jax

        spec = NETWORK_SPECS["UNet_light4"]
        model = UNet3D(spec, compute_dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, jnp.ones((1, 4, 4, 4, 1)))
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()


class TestTraining:
    def test_loss_decreases(self):
        import jax
        import optax

        from oai_analysis_2_tpu.engine.training import dice_bce_loss, make_train_step

        spec = NETWORK_SPECS["UNet_light4"]
        model = UNet3D(spec)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        step = make_train_step(model, opt)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 1)), jnp.float32)
        y = (x > 0).astype(jnp.float32).repeat(2, axis=-1)
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, x, y)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
