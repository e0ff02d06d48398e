from fftisdf_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from fftisdf_tpu.parallel.build import build_sharded, get_jk_sharded  # noqa: F401
