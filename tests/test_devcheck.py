"""Guard: the suite must run on the virtual 8-device CPU mesh, never on the
TPU tunnel (pytest plugins import jax before conftest; conftest forces the
platform via jax.config — this test catches regressions of that setup)."""


def test_virtual_cpu_mesh_active():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    assert devices[0].platform == "cpu"
