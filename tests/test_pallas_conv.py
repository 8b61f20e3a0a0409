"""conv3d_zstack (Pallas shift-GEMM conv) vs the XLA conv oracle.

Runs in interpreter mode on the CPU test mesh — validates the tap
arrangement, halo zero-fill, K/N stacking order, bias/ReLU fusion, and
both stack_x modes against models/unet3d.conv3d (the production XLA
path, itself torch-oracle-pinned in tests/test_unet3d.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oai_analysis_2_tpu.models.unet3d import conv3d
from oai_analysis_2_tpu.ops import pallas_conv


def _ref(x, kernel, bias, relu):
    p = {"kernel": kernel}
    if bias is not None:
        p["bias"] = bias
    y = conv3d(x, p)
    if relu:
        y = jax.nn.relu(y)
    return y


def _run_interpret(x, kernel, bias=None, **kw):
    return pallas_conv.conv3d_zstack(x, kernel, bias, interpret=True, **kw)


CASES = [
    # (shape, cout, stack_x)  — shrunken versions of the production convs
    ((1, 8, 16, 16, 8), 8, False),
    ((2, 4, 8, 16, 16), 8, True),
    ((1, 8, 8, 8, 32), 16, False),
]


def test_zy_tiling_matches():
    """Interior z/y halos across grid blocks (x spans the array)."""
    rng = np.random.default_rng(1)
    shape, cout = (1, 4, 8, 16, 8), 8
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8, cout)).astype(np.float32))
    got = _run_interpret(x, k, None, out_dtype=jnp.float32, tz=2, ty=4)
    want = _ref(x, k.astype(jnp.bfloat16), None, False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("shape,cout,stack_x", CASES)
@pytest.mark.parametrize("relu,use_bias", [(False, False), (True, True)])
def test_matches_xla_conv(shape, cout, stack_x, relu, use_bias):
    rng = np.random.default_rng(0)
    cin = shape[-1]
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.5, (cout,)).astype(np.float32)) if use_bias else None

    got = _run_interpret(
        x, k, b, relu=relu, out_dtype=jnp.float32, stack_x=stack_x,
        tz=4, ty=4)
    want = _ref(x, k.astype(jnp.bfloat16), b, relu)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_tile_picker():
    assert pallas_conv._pick_tile(32, 16) == 16
    assert pallas_conv._pick_tile(20, 16) == 10
    assert pallas_conv._pick_tile(7, 16) == 7


def test_unet_wiring_routes_to_zstack(monkeypatch):
    """UNet3D(conv_impl="pallas") produces the same output as the XLA path
    and actually routes qualifying convs through conv3d_zstack (the size
    gates are relaxed so tiny CPU-testable shapes qualify; the kernel runs
    in interpret mode)."""
    from oai_analysis_2_tpu.models import unet3d
    from oai_analysis_2_tpu.ops import pallas_conv

    calls = []
    real = pallas_conv.conv3d_zstack

    def fake(x, k, b=None, **kw):
        kw["interpret"] = True
        calls.append(tuple(x.shape))
        return real(x, k, b, **kw)

    monkeypatch.setattr(pallas_conv, "conv3d_zstack", fake)
    monkeypatch.setattr(
        unet3d, "zstack_supported",
        lambda x, p, spec, train: (not train) and not spec.batchnorm
        and x.dtype == jnp.bfloat16 and p["kernel"].shape[:3] == (3, 3, 3)
        and int(p["kernel"].shape[3]) >= 8)

    spec = unet3d.NETWORK_SPECS["UNet_light4"].replace(bias=True)
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (1, 8, 16, 16, 1)), jnp.float32)
    params = unet3d.UNet3D(spec).init(jax.random.PRNGKey(0))

    want = unet3d.UNet3D(spec, compute_dtype=jnp.bfloat16,
                         conv_impl="xla").apply(params, x)
    got = unet3d.UNet3D(spec, compute_dtype=jnp.bfloat16,
                        conv_impl="pallas").apply(params, x)
    assert calls, "no conv routed through the pallas kernel"
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2)


def test_unet_conv_impl_auto_is_xla_on_cpu():
    from oai_analysis_2_tpu.models import unet3d

    m = unet3d.UNet3D(unet3d.NETWORK_SPECS["UNet_light4"], conv_impl="auto")
    assert m.conv_impl == "xla"
