from fftisdf_tpu.scf.hf import KRHF, KUHF  # noqa: F401
from fftisdf_tpu.scf import integrals  # noqa: F401
