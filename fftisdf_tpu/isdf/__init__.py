from fftisdf_tpu.isdf.kpoint import FFTISDF, ISDF  # noqa: F401
from fftisdf_tpu.isdf.eri import assemble_eri  # noqa: F401
