"""Reciprocal-space Coulomb kernel.

Native replacement for ``pyscf.pbc.tools.get_coulG`` as the reference uses it
(``/root/reference/fftisdf.py:114``, always with ``exxdiv=None``,
``fftisdf.py:142,195,438``): the 3D periodic kernel

    coulG(q)[G] = 4 pi / |q + G|^2,    coulG = 0 where |q + G| = 0.

Zeroing the divergent q+G=0 component is the ``exxdiv=None`` convention: the
G=0 Hartree term cancels against the neutralizing background; no Madelung /
probe-charge correction is applied (those are the reference's explicit
non-goals, ``fftisdf.py:392-396``).

Range separation (``omega``) — a capability the reference guards out with
NotImplementedError (``fftisdf.py:392-396``); the sign convention follows
PySCF's ``get_coulG(..., omega=...)``:

    omega = 0    full kernel            4 pi / |q+G|^2
    omega > 0    long-range  (erf)      4 pi exp(-|q+G|^2/(4 omega^2)) / |q+G|^2
    omega < 0    short-range (erfc)     4 pi (1 - exp(-|q+G|^2/(4 omega^2))) / |q+G|^2

The LR kernel keeps the 1/|q+G|^2 divergence, so its q+G=0 sample is dropped
exactly like the full kernel's.  The SR kernel is FINITE at q+G=0 — the limit
pi/omega^2 — and that value is kept (it is physical, not divergent).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _screen(absg2, omega):
    """Gaussian screening factor exp(-|q+G|^2 / (4 omega^2))."""
    return jnp.exp(-absg2 / (4.0 * omega * omega))


def _coulG_values(absg2, omega):
    """Kernel values from |q+G|^2 (omega is a static python float)."""
    ok = absg2 > 1e-12
    inv = jnp.where(ok, 4.0 * jnp.pi / jnp.where(ok, absg2, 1.0), 0.0)
    if not omega:
        return inv
    if omega > 0:          # long-range (erf): divergent q+G=0 dropped too
        return inv * _screen(absg2, omega)
    # short-range (erfc): finite pi/omega^2 limit at q+G=0
    return jnp.where(ok, inv * (1.0 - _screen(absg2, omega)),
                     jnp.pi / (omega * omega))


def get_coulG(cell, q=None, mesh=None, gv=None, omega=0.0):
    """Coulomb kernel values on the FFT grid: (ngrid,) real.

    ``omega``: range separation (see module docstring; 0 = full kernel)."""
    if gv is None:
        gv = cell.get_Gv(mesh)
    gv = jnp.asarray(gv)
    if q is not None:
        gv = gv + jnp.asarray(q)[None, :]
    absg2 = jnp.sum(gv * gv, axis=1)
    return _coulG_values(absg2, float(omega))


@partial(jax.jit, static_argnames=("omega",))
def _coulG_kernel(qs, gv, omega=0.0):
    def one(q):
        g = gv + q[None, :]
        return _coulG_values(jnp.sum(g * g, axis=1), omega)

    return jax.vmap(one)(qs)


def get_coulG_batched(cell, qs, gv, dtype=None, omega=0.0):
    """coulG for all momentum sectors at once: (nq, ngrid) real, on device.

    One jitted vmap over q instead of a per-q host loop — the host in this
    environment is single-core and nq*ngrid arrays are costly to transfer.
    (The kernel is module-level so repeated builds hit the in-process jit
    cache instead of re-tracing per call.)"""
    if dtype is not None:
        gv = jnp.asarray(gv, dtype=dtype)
        qs = jnp.asarray(qs, dtype=dtype)
    return _coulG_kernel(qs, gv, omega=float(omega))
