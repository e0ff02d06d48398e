from fftisdf_tpu.pw.poisson import pair_potential  # noqa: F401
from fftisdf_tpu.pw.eri import get_eri_from_ao, get_ao_pairs_G  # noqa: F401
from fftisdf_tpu.pw.jk import get_jk_kpts  # noqa: F401
