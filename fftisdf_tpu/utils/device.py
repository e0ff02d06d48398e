"""Host<->device transfer helpers that tolerate complex-hostile transports.

Some TPU transports (e.g. the axon tunnel in this environment) implement
host<->device copies only for real dtypes — transferring a complex array
raises ``UNIMPLEMENTED``, often surfacing asynchronously at an unrelated
later transfer.  These helpers split complex arrays into real/imag on the
side that supports them and recombine on the other side.  Real arrays pass
straight through.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def to_device(x, dtype=None):
    """np/jnp array -> device array; complex inputs are shipped as two real
    transfers and recombined on device."""
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
    rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    re = jnp.asarray(np.ascontiguousarray(x.real), dtype=rdtype)
    im = jnp.asarray(np.ascontiguousarray(x.imag), dtype=rdtype)
    return (re + 1j * im).astype(cdtype)


def to_host(x):
    """Device array -> numpy; complex arrays come back as two real pulls."""
    if np.iscomplexobj(x):
        return (np.asarray(jnp.real(x)).astype(np.float64)
                + 1j * np.asarray(jnp.imag(x)).astype(np.float64))
    return np.asarray(x)
