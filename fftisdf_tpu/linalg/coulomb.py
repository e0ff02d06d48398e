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
