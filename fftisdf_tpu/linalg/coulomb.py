"""Reciprocal-space Coulomb kernel.

Native replacement for ``pyscf.pbc.tools.get_coulG`` as the reference uses it
(``/root/reference/fftisdf.py:114``, always with ``exxdiv=None``,
``fftisdf.py:142,195,438``): the 3D periodic kernel

    coulG(q)[G] = 4 pi / |q + G|^2,    coulG = 0 where |q + G| = 0.

Zeroing the divergent q+G=0 component is the ``exxdiv=None`` convention: the
G=0 Hartree term cancels against the neutralizing background; no Madelung /
probe-charge correction is applied (those are the reference's explicit
non-goals, ``fftisdf.py:392-396``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_coulG(cell, q=None, mesh=None, gv=None):
    """Coulomb kernel values on the FFT grid: (ngrid,) real."""
    if gv is None:
        gv = cell.get_Gv(mesh)
    gv = jnp.asarray(gv)
    if q is not None:
        gv = gv + jnp.asarray(q)[None, :]
    absg2 = jnp.sum(gv * gv, axis=1)
    return jnp.where(absg2 > 1e-12, 4.0 * jnp.pi / jnp.where(absg2 > 1e-12, absg2, 1.0), 0.0)


@jax.jit
def _coulG_kernel(qs, gv):
    def one(q):
        g = gv + q[None, :]
        absg2 = jnp.sum(g * g, axis=1)
        ok = absg2 > 1e-12
        return jnp.where(ok, 4.0 * jnp.pi / jnp.where(ok, absg2, 1.0), 0.0)

    return jax.vmap(one)(qs)


def get_coulG_batched(cell, qs, gv, dtype=None):
    """coulG for all momentum sectors at once: (nq, ngrid) real, on device.

    One jitted vmap over q instead of a per-q host loop — the host in this
    environment is single-core and nq*ngrid arrays are costly to transfer.
    (The kernel is module-level so repeated builds hit the in-process jit
    cache instead of re-tracing per call.)"""
    if dtype is not None:
        gv = jnp.asarray(gv, dtype=dtype)
        qs = jnp.asarray(qs, dtype=dtype)
    return _coulG_kernel(qs, gv)
