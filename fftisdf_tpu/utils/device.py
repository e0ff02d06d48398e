"""Host<->device transfer helpers that tolerate complex-hostile transports.

Some TPU transports (e.g. the axon tunnel in this environment) implement
host<->device copies only for real dtypes, and their *eager* op dispatch path
fails on complex arithmetic with ``UNIMPLEMENTED`` (the same ops compiled
under an explicit ``jax.jit`` work).  Therefore:

- complex arrays are shipped as two real transfers and recombined by a
  *jitted* kernel on device;
- device->host pulls extract real/imag with jitted kernels and recombine on
  host;
- ``jit_take`` provides jitted leading-axis indexing for complex device
  arrays (eager slicing would hit the broken eager path).

Real arrays pass straight through.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cdtype",))
def _combine(re, im, cdtype):
    return (re + 1j * im).astype(cdtype)


@partial(jax.jit, static_argnames=("shape", "dtype"))
def czeros(shape, dtype):
    """Complex (or any-dtype) zeros allocated ON DEVICE under jit — an
    eager ``jnp.zeros`` with a complex dtype broadcasts a complex host
    constant, which complex-hostile transports reject (UNIMPLEMENTED)."""
    return jnp.zeros(shape, dtype=dtype)


@jax.jit
def _real(x):
    return jnp.real(x)


@jax.jit
def _imag(x):
    return jnp.imag(x)


@jax.jit
def jit_take(a, i):
    """a[i] along the leading axis, compiled once (traced index)."""
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def to_device(x, dtype=None):
    """np/jnp array -> device array; complex inputs are shipped as two real
    transfers and recombined on device under jit."""
    if isinstance(x, jnp.ndarray):
        return x if dtype is None else x.astype(dtype)
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        out = jnp.asarray(x)
        return out if dtype is None else out.astype(dtype)
    cdtype = jnp.complex128 if (dtype in (None, jnp.complex128)
                                and x.dtype == np.complex128) else jnp.complex64
    if dtype is not None:
        cdtype = dtype
    if cdtype == jnp.complex128 and not jax.config.jax_enable_x64:
        cdtype = jnp.complex64   # silently truncated anyway; skip the warn
    rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    re = jnp.asarray(np.ascontiguousarray(x.real), dtype=rdtype)
    im = jnp.asarray(np.ascontiguousarray(x.imag), dtype=rdtype)
    return _combine(re, im, cdtype)


def to_host(x):
    """Device array -> numpy; complex arrays come back as two real pulls."""
    if np.iscomplexobj(x):
        return (np.asarray(_real(x)).astype(np.float64)
                + 1j * np.asarray(_imag(x)).astype(np.float64))
    return np.asarray(x)


def ensure_f32_matmul_precision():
    """On non-CPU backends, set jax_default_matmul_precision='highest' if
    the user has not chosen one.  Scientific f32 on TPU needs full-f32
    matmuls: the default bf16 passes cost ~170x on J/K accuracy and NaN the
    near-singular pair-gram factorizations (measured; README 'TPU notes').

    Called lazily from compute entry points (FFTISDF / KRHF construction) —
    NOT at package import: ``jax.default_backend()`` instantiates the
    backend, and an import must never grab the TPU before user code can
    switch platforms."""
    import jax

    if jax.config.jax_default_matmul_precision is None and \
            jax.default_backend() != "cpu":
        jax.config.update("jax_default_matmul_precision", "highest")


def enable_persistent_cache(path=None):
    """Persistent XLA compilation cache: first-compile costs (~minutes via
    the axon remote-compile tunnel) are paid once per shape across
    processes."""
    import os
    import jax

    path = path or os.environ.get(
        "FFTISDF_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fftisdf_tpu",
                     "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
