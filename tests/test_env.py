"""Guard: tests must run on the virtual CPU mesh, never the real TPU chip."""


def test_runs_on_8_cpu_devices():
    import jax

    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests leaked onto {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
