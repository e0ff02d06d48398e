"""Native periodic GTO evaluation on real-space grids (JAX).

TPU-native replacement for PySCF's ``pbc_eval_gto("GTOval", coords, kpts=...)``
and the blocked ``_numint.block_loop`` iterator used throughout the reference
(``/root/reference/fftisdf.py:350-355,367-370``, ``fftdf-with-k.py:51,121``).

The Bloch AO at k is a lattice sum over translation images::

    phi_{k,mu}(r) = sum_T  exp(i k.T) * chi_mu(r - A_mu - T)

Design: shell metadata (centers, exponents, normalized contractions, image
lists truncated at the shell's decay radius) is assembled host-side once; the
evaluator is a single jitted function that scans over images, evaluating every
shell's primitives on the full grid block with VPU-friendly elementwise math
and accumulating the k-phases.  Grid blocks stream through ``jax.lax.map`` at
the call sites (the ISDF builder), replacing the reference's Python/C
block_loop round trips.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fftisdf_tpu.basis.gto import (
    normalized_coeffs,
    real_solid_harmonics,
    shell_rcut,
)


def _cell_geometry(cell):
    a = np.asarray(cell.a)
    corners = np.array([[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
                       dtype=np.float64) @ a
    center = corners.mean(axis=0)
    radius = np.linalg.norm(corners - center, axis=1).max()
    return center, radius


def shell_images(cell, center: np.ndarray, rcut: float) -> np.ndarray:
    """Lattice translations T with ||center + T - cell_center|| <= rcut + r_cell.

    Conservative superset of the images whose shifted Gaussian can reach the
    unit-cell grid region with value > precision."""
    a = np.asarray(cell.a)
    ccenter, cradius = _cell_geometry(cell)
    reach = rcut + cradius
    # heights of the lattice along each direction bound the integer ranges
    vol = abs(np.linalg.det(a))
    heights = np.array([
        vol / np.linalg.norm(np.cross(a[(i + 1) % 3], a[(i + 2) % 3]))
        for i in range(3)
    ])
    nmax = np.ceil((reach + np.linalg.norm(center - ccenter)) / heights).astype(int) + 1
    from fftisdf_tpu import native

    ts_native = native.enumerate_images(a, center, ccenter, reach, nmax)
    if ts_native is not None:
        return ts_native
    rng = [np.arange(-n, n + 1) for n in nmax]
    ints = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
    ts = ints.astype(np.float64) @ a
    keep = np.linalg.norm(center + ts - ccenter, axis=1) <= reach
    return ts[keep]


class ShellSpec:
    """Host-side static data for one contracted shell."""

    def __init__(self, cell, center, shell, precision):
        self.l = shell.l
        self.rpow = getattr(shell, "rpow", 0)
        self.center = np.asarray(center)
        self.exps = np.asarray(shell.exps)
        if getattr(shell, "raw", False):
            self.coeffs = np.asarray(shell.coeffs, dtype=np.float64)
        else:
            self.coeffs = normalized_coeffs(shell.l, shell.exps, shell.coeffs)
        self.nctr = self.coeffs.shape[1]
        self.nfunc = (2 * shell.l + 1) * self.nctr
        self.rcut = shell_rcut(shell.l + 2 * self.rpow, self.exps,
                               shell.coeffs, precision)
        self.images = shell_images(cell, self.center, self.rcut)


def build_shell_table(cell, precision=None, shells=None):
    """Shell table from the cell's basis, or from an explicit list of
    (center, Shell) pairs (used e.g. for GTH projector functions)."""
    precision = cell.precision if precision is None else precision
    if shells is None:
        shells = [(xyz, sh) for _, _, xyz, sh in cell.shells()]
    return [ShellSpec(cell, xyz, sh, precision) for xyz, sh in shells]


def _shell_block(coords, spec: ShellSpec, shift, dtype):
    """chi values of one shell at coords - shift: (ng, nfunc), real."""
    d = coords - jnp.asarray(spec.center + shift, dtype=dtype)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    r2 = dx * dx + dy * dy + dz * dz
    # radial part: (ng, nprim) @ (nprim, nctr)
    rad = jnp.exp(-r2[:, None] * jnp.asarray(spec.exps, dtype=dtype)[None, :])
    rad = rad @ jnp.asarray(spec.coeffs, dtype=dtype)
    for _ in range(spec.rpow):
        rad = rad * r2[:, None]
    ang = jnp.stack(real_solid_harmonics(dx, dy, dz, spec.l, jnp), axis=-1)
    # AO order within shell: contraction-major, m = -l..l inside
    chi = rad[:, :, None] * ang[:, None, :]
    return chi.reshape(coords.shape[0], spec.nfunc)


def make_evaluator(cell, kpts=None, precision=None, dtype=jnp.float64,
                   shells=None):
    """Build a jitted ``fn(coords) -> (nk, ng, nao)`` Bloch AO evaluator.

    ``kpts=None`` gives the gamma-point real evaluator ``fn(coords) -> (ng, nao)``.
    ``shells`` overrides the cell basis with explicit (center, Shell) pairs.
    """
    table = build_shell_table(cell, precision, shells)
    gamma = kpts is None
    kpts_arr = None if gamma else np.asarray(kpts)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    ainv = np.linalg.inv(np.asarray(cell.a))
    a_mat = np.asarray(cell.a)

    # group shells by identical image sets is possible; keep simple: per shell
    def eval_fn(coords):
        coords = jnp.asarray(coords, dtype=dtype)
        # wrap into the home cell: r = r0 + T, phi_k(r) = e^{ik.T} phi_k(r0).
        # Keeps the finite per-shell image lists exact for arbitrary coords.
        frac = coords @ jnp.asarray(ainv, dtype=dtype)
        shift_int = jnp.floor(frac)
        tvec = shift_int @ jnp.asarray(a_mat, dtype=dtype)
        coords = coords - tvec
        ng = coords.shape[0]
        blocks = []
        for spec in table:
            images = spec.images
            if gamma:
                acc = jnp.zeros((ng, spec.nfunc), dtype=dtype)

                def body(acc, t):
                    return acc + _shell_block(coords - t, spec, 0.0, dtype), None

                acc, _ = jax.lax.scan(body, acc, jnp.asarray(images, dtype=dtype))
            else:
                nk = len(kpts_arr)
                acc = jnp.zeros((nk, ng, spec.nfunc), dtype=cdtype)
                phases = jnp.exp(
                    1j * jnp.asarray(images @ kpts_arr.T)
                ).astype(cdtype)  # (nT, nk)

                def body(acc, tp):
                    t, ph = tp
                    chi = _shell_block(coords - t, spec, 0.0, dtype)
                    return acc + ph[:, None, None] * chi[None].astype(cdtype), None

                acc, _ = jax.lax.scan(
                    body, acc, (jnp.asarray(images, dtype=dtype), phases)
                )
            blocks.append(acc)
        out = jnp.concatenate(blocks, axis=-1)
        if not gamma:
            ptphase = jnp.exp(
                1j * (tvec @ jnp.asarray(kpts_arr.T, dtype=dtype))
            ).astype(cdtype)  # (ng, nk)
            out = out * ptphase.T[:, :, None]
        return out

    return jax.jit(eval_fn)


def eval_ao_kpts(cell, coords, kpts, precision=None, dtype=jnp.float64):
    """Convenience one-shot evaluation: (nk, ng, nao) complex Bloch AOs."""
    fn = make_evaluator(cell, kpts=kpts, precision=precision, dtype=dtype)
    return fn(jnp.asarray(coords))


def eval_ao_gamma(cell, coords, precision=None, dtype=jnp.float64):
    """Gamma-point (real) AO values: (ng, nao)."""
    fn = make_evaluator(cell, kpts=None, precision=precision, dtype=dtype)
    return fn(jnp.asarray(coords))
