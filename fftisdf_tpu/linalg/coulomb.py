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

Truncated kernels (``trunc``) — low-dimensional capability BEYOND the
reference (which is strictly 3D-periodic): real-space truncation of the
Coulomb interaction removes the spurious coupling to periodic images along
non-periodic directions, making total energies of isolated molecules (0D)
and slabs (2D) converge exponentially in the vacuum size instead of
algebraically.

    trunc = ("0d", rc)   spherical truncation (Spencer-Alavi 2008 /
                         Rozzi et al. 2006): v(r) = 1/r for r < rc, else 0

        v(G) = 4 pi (1 - cos(|G| rc)) / |G|^2,     v(0) = 2 pi rc^2

        Exact for densities whose pair separations stay below rc; with the
        conventional rc = L_min/2 that means charge contained in a sphere
        of diameter L/2 centered in the box.

    trunc = ("2d", rc)   slab truncation along the THIRD lattice vector
                         (Ismail-Beigi, PRB 73, 233103 (2006)):
                         v(r) = 1/r for |z| < rc, else 0, rc = Lz/2

        Gp = |G_xy|, Gz = G_z:
        v(G)          = 4 pi / G^2 [1 + e^{-Gp rc}((Gz/Gp) sin(Gz rc)
                                                   - cos(Gz rc))]   (Gp > 0)
        v(Gp=0, Gz)   = 4 pi / Gz^2 [1 - cos(Gz rc) - Gz rc sin(Gz rc)]
        v(0)          = -2 pi rc^2

        On mesh frequencies Gz rc = pi n the sin terms vanish and the
        general form reduces to the familiar 1 - e^{-Gp rc} cos(Gz rc)
        weight; the general form stays exact for shifted Gz (band paths).

Both truncated kernels are even in q+G (v(-g) = v(g)), so the build's
time-reversal halving w_{-q} = conj(w_q) still holds.  Their q+G = 0 value
is FINITE and is KEPT — truncation removes the divergence physically, so no
neutralizing-background/exxdiv convention applies (and exxdiv corrections
are meaningless with them).  Truncation composes with omega only for
omega = 0 (screened truncated kernels are not implemented — guarded).
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


def _coulG_trunc_0d(gk, rc):
    """Spherical truncation from the full q+G vectors (ng, 3)."""
    absg2 = jnp.sum(gk * gk, axis=1)
    ok = absg2 > 1e-12
    g = jnp.sqrt(jnp.where(ok, absg2, 1.0))
    v = 4.0 * jnp.pi * (1.0 - jnp.cos(g * rc)) / jnp.where(ok, absg2, 1.0)
    return jnp.where(ok, v, 2.0 * jnp.pi * rc * rc)


def _coulG_trunc_2d(gk, rc):
    """Ismail-Beigi slab truncation (non-periodic axis = cartesian z of the
    third lattice vector; see module docstring) from q+G vectors (ng, 3)."""
    gz = gk[:, 2]
    gp2 = gk[:, 0] ** 2 + gk[:, 1] ** 2
    absg2 = gp2 + gz * gz
    pok = gp2 > 1e-12
    zok = gz * gz > 1e-12
    gp = jnp.sqrt(jnp.where(pok, gp2, 1.0))
    # Gp > 0 branch (any Gz)
    vp = (4.0 * jnp.pi / jnp.where(pok, absg2, 1.0)
          * (1.0 + jnp.exp(-gp * rc)
             * ((gz / gp) * jnp.sin(gz * rc) - jnp.cos(gz * rc))))
    # Gp = 0, Gz != 0 branch
    gz2 = jnp.where(zok, gz * gz, 1.0)
    vz = (4.0 * jnp.pi / gz2
          * (1.0 - jnp.cos(gz * rc) - gz * rc * jnp.sin(gz * rc)))
    v0 = -2.0 * jnp.pi * rc * rc
    return jnp.where(pok, vp, jnp.where(zok, vz, v0))


def _coulG_vec(gk, omega, trunc):
    """Kernel values from the full q+G vectors (ng, 3).  ``trunc`` is None
    or a static ("0d"|"2d", rc) pair; truncation composes with omega=0 only
    (guarded at the callers)."""
    if trunc is None:
        return _coulG_values(jnp.sum(gk * gk, axis=1), omega)
    kind, rc = trunc
    if kind == "0d":
        return _coulG_trunc_0d(gk, float(rc))
    if kind == "2d":
        return _coulG_trunc_2d(gk, float(rc))
    raise ValueError(f"unknown truncation {kind!r} (use '0d' or '2d')")


def check_trunc(trunc, omega=0.0):
    """Validate a ``trunc`` spec (None or ('0d'|'2d', rc)); returns a
    normalized static tuple or None.  Raises on omega+truncation."""
    if trunc is None:
        return None
    kind, rc = trunc
    kind = str(kind).lower()
    if kind not in ("0d", "2d"):
        raise ValueError(f"unknown truncation {kind!r} (use '0d' or '2d')")
    if omega:
        raise NotImplementedError(
            "range separation (omega) with a truncated Coulomb kernel")
    return (kind, float(rc))


def trunc_for_cell(cell, kind):
    """Conventional truncation radius for a cell: ('0d', L_min/2) from the
    minimum interplanar height, or ('2d', Lz/2) from the third lattice
    vector's out-of-plane height.  The density must be centered and
    contained well inside the truncation region (0d: diameter < rc)."""
    import numpy as np

    kind = str(kind).lower()
    a = np.asarray(cell.a, dtype=float)
    vol = abs(np.linalg.det(a))
    heights = np.array([
        vol / np.linalg.norm(np.cross(a[(i + 1) % 3], a[(i + 2) % 3]))
        for i in range(3)])
    if kind == "0d":
        return ("0d", float(heights.min()) / 2.0)
    if kind == "2d":
        return ("2d", float(heights[2]) / 2.0)
    raise ValueError(f"unknown truncation {kind!r} (use '0d' or '2d')")


def coulG_np(gv, trunc=None):
    """Host (numpy, f64) mirror of the kernel values, for integral code that
    stays on the host regardless of the default backend (scf.integrals
    hcore assembly keeps complex128 precision there).  Bare kernel: the
    divergent q+G=0 sample is zeroed (background convention); truncated
    kernels keep their finite q+G=0 value."""
    import numpy as np

    gv = np.asarray(gv, dtype=float)
    absg2 = np.einsum("gi,gi->g", gv, gv)
    ok = absg2 > 1e-12
    safe = np.where(ok, absg2, 1.0)
    if trunc is None:
        return np.where(ok, 4.0 * np.pi / safe, 0.0)
    kind, rc = trunc
    rc = float(rc)
    if kind == "0d":
        v = 4.0 * np.pi * (1.0 - np.cos(np.sqrt(safe) * rc)) / safe
        return np.where(ok, v, 2.0 * np.pi * rc * rc)
    if kind == "2d":
        gz = gv[:, 2]
        gp2 = gv[:, 0] ** 2 + gv[:, 1] ** 2
        pok = gp2 > 1e-12
        zok = gz * gz > 1e-12
        gp = np.sqrt(np.where(pok, gp2, 1.0))
        vp = (4.0 * np.pi / np.where(pok, absg2, 1.0)
              * (1.0 + np.exp(-gp * rc)
                 * ((gz / gp) * np.sin(gz * rc) - np.cos(gz * rc))))
        gz2 = np.where(zok, gz * gz, 1.0)
        vz = (4.0 * np.pi / gz2
              * (1.0 - np.cos(gz * rc) - gz * rc * np.sin(gz * rc)))
        return np.where(pok, vp,
                        np.where(zok, vz, -2.0 * np.pi * rc * rc))
    raise ValueError(f"unknown truncation {kind!r} (use '0d' or '2d')")


def get_coulG(cell, q=None, mesh=None, gv=None, omega=0.0, trunc=None):
    """Coulomb kernel values on the FFT grid: (ngrid,) real.

    ``omega``: range separation (see module docstring; 0 = full kernel).
    ``trunc``: None | ("0d", rc) | ("2d", rc) real-space truncation."""
    if gv is None:
        gv = cell.get_Gv(mesh)
    gv = jnp.asarray(gv)
    if q is not None:
        gv = gv + jnp.asarray(q)[None, :]
    return _coulG_vec(gv, float(omega), check_trunc(trunc, omega))


@partial(jax.jit, static_argnames=("omega", "trunc"))
def _coulG_kernel(qs, gv, omega=0.0, trunc=None):
    def one(q):
        return _coulG_vec(gv + q[None, :], omega, trunc)

    return jax.vmap(one)(qs)


def get_coulG_batched(cell, qs, gv, dtype=None, omega=0.0, trunc=None):
    """coulG for all momentum sectors at once: (nq, ngrid) real, on device.

    One jitted vmap over q instead of a per-q host loop — the host in this
    environment is single-core and nq*ngrid arrays are costly to transfer.
    (The kernel is module-level so repeated builds hit the in-process jit
    cache instead of re-tracing per call.)"""
    if dtype is not None:
        gv = jnp.asarray(gv, dtype=dtype)
        qs = jnp.asarray(qs, dtype=dtype)
    return _coulG_kernel(qs, gv, omega=float(omega),
                         trunc=check_trunc(trunc, omega))
