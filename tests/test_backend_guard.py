"""Canary: the suite must run on the forced 8-device CPU mesh, not the
axon TPU tunnel (see conftest.py)."""
import jax


def test_backend_is_8_device_cpu():
    devs = jax.devices()
    assert devs[0].platform == "cpu", devs
    assert len(devs) == 8, devs
