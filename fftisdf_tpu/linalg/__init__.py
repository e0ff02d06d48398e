from fftisdf_tpu.linalg.pivoted_cholesky import pivoted_cholesky  # noqa: F401
from fftisdf_tpu.linalg.fft import fft3, ifft3  # noqa: F401
from fftisdf_tpu.linalg.coulomb import get_coulG  # noqa: F401
from fftisdf_tpu.linalg.solvers import solve_fitting  # noqa: F401
