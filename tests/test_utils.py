import json

import numpy as np
import jax.numpy as jnp

from fftisdf_tpu.utils.config import ISDFConfig
from fftisdf_tpu.utils.device import to_device, to_host, jit_take
from fftisdf_tpu.utils.logging import Logger
from fftisdf_tpu.utils import profiling


def test_config_roundtrip():
    cfg = ISDFConfig(c0=30.0, m0=(9, 9, 9), solver="svd", kmesh=(2, 2, 2))
    cfg2 = ISDFConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    kw = cfg.isdf_kwargs()
    assert kw["c0"] == 30.0 and kw["solver"] == "svd"


def test_device_transfer_roundtrip():
    rng = np.random.default_rng(0)
    for arr in (rng.standard_normal((4, 5)),
                rng.standard_normal((4, 5)) + 1j * rng.standard_normal((4, 5))):
        dev = to_device(arr)
        back = to_host(dev)
        np.testing.assert_allclose(back, arr, atol=1e-12)


def test_jit_take():
    x = to_device(np.arange(24).reshape(4, 6).astype(complex))
    np.testing.assert_allclose(to_host(jit_take(x, 2)),
                               np.arange(12, 18))


def test_logger_levels(capsys):
    import io

    buf = io.StringIO()
    log = Logger(verbose=3, stream=buf)
    log.info("visible %d", 1)
    log.debug("hidden")
    out = buf.getvalue()
    assert "visible 1" in out and "hidden" not in out


def test_profiling_phase_scope():
    with profiling.phase("unit-test-phase"):
        x = jnp.ones(4).sum()
    assert float(x) == 4.0
