from fftisdf_tpu.scf.hf import KRHF, KUHF  # noqa: F401
from fftisdf_tpu.scf.ks import KRKS, KUKS  # noqa: F401
from fftisdf_tpu.scf import integrals  # noqa: F401
