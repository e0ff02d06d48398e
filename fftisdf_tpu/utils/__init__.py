from fftisdf_tpu.utils.logging import Logger  # noqa: F401
