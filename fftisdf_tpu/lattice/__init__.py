from fftisdf_tpu.lattice.cell import Cell  # noqa: F401
from fftisdf_tpu.lattice import kpoints, structure  # noqa: F401
