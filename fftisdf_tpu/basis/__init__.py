from fftisdf_tpu.basis import data  # noqa: F401
from fftisdf_tpu.basis.eval import eval_ao_kpts  # noqa: F401
