"""Gaussian cube-file export of real-space fields (densities, orbitals).

The standard visualization interchange format (VMD/VESTA/Avogadro), written
from the framework's own uniform FFT grid — an observable surface the
reference never had (its PySCF driver stops at energies,
``/root/reference/fftisdf.py:437-466``).

Grid convention: the cell's C-ordered uniform mesh (last axis fastest),
which is exactly the cube format's inner-loop order, so fields reshape
without transposition.  Units are Bohr throughout (cube standard).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fftisdf_tpu.utils.device import to_host


def write_cube(path, cell, field, comment="fftisdf_tpu field",
               mesh=None):
    """Write a real scalar ``field`` (ngrid,) on the cell's uniform mesh.

    The voxel vectors are a_i / mesh_i; positive mesh counts mark Bohr
    units per the cube spec."""
    from fftisdf_tpu.basis import data as basis_data

    mesh = np.asarray(mesh if mesh is not None else cell.mesh, dtype=int)
    field = np.asarray(field, dtype=float).ravel()
    ng = int(np.prod(mesh))
    if field.size != ng:
        raise ValueError(f"field has {field.size} values, mesh wants {ng}")
    a = np.asarray(cell.a, dtype=float)
    coords = cell.atom_coords()
    lines = [comment.splitlines()[0] if comment else "fftisdf_tpu",
             "scalar field on the uniform FFT mesh (Bohr)"]
    lines.append(f"{cell.natm:5d} {0.0:12.6f} {0.0:12.6f} {0.0:12.6f}")
    for i in range(3):
        v = a[i] / mesh[i]
        lines.append(f"{int(mesh[i]):5d} {v[0]:12.6f} {v[1]:12.6f} "
                     f"{v[2]:12.6f}")
    for (sym, _), xyz in zip(cell.atom, coords):
        z = int(basis_data.ATOMIC_NUMBER[basis_data.element_symbol(sym)])
        ps = cell._pseudo.get(sym) if cell._pseudo else None
        q = float(ps.zion) if ps is not None else float(z)
        lines.append(f"{z:5d} {q:12.6f} {xyz[0]:12.6f} {xyz[1]:12.6f} "
                     f"{xyz[2]:12.6f}")
    vals = field.reshape(-1)
    for i0 in range(0, ng, 6):
        lines.append(" ".join(f"{v:13.5e}" for v in vals[i0:i0 + 6]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def read_cube(path):
    """Parse a cube file back: (cell_meta dict, field (ngrid,)).

    Round-trip helper (and test oracle): returns the mesh, voxel matrix,
    atom rows, and the flat field in file order."""
    with open(path) as f:
        lines = f.read().splitlines()
    natm = int(lines[2].split()[0])
    mesh, vox = [], []
    for i in range(3):
        parts = lines[3 + i].split()
        mesh.append(int(parts[0]))
        vox.append([float(x) for x in parts[1:4]])
    atoms = []
    for i in range(natm):
        parts = lines[6 + i].split()
        atoms.append((int(parts[0]), float(parts[1]),
                      [float(x) for x in parts[2:5]]))
    field = np.array(" ".join(lines[6 + natm:]).split(), dtype=float)
    return {"mesh": np.array(mesh), "voxels": np.array(vox),
            "atoms": atoms}, field


@jax.jit
def _rho_kernel(ao, dm):
    return jnp.einsum("kgm,kmn,kgn->g", ao, dm,
                      ao.conj()).real / ao.shape[0]


@jax.jit
def _mo_kernel(ao, c):
    return jnp.einsum("gm,m->g", ao, c)


def density_on_grid(mf, dm=None, spin=None):
    """Real-space density (ngrid,) from a converged driver's density
    matrix on its own FFT mesh.  ``spin``: None -> total density (or the
    total over both channels for unrestricted), 'diff' -> spin density
    n_a - n_b, 0/1 -> one channel."""
    from fftisdf_tpu.utils.device import to_device

    dm = np.asarray(mf.dm if dm is None else dm)
    if dm.ndim == 4:
        if spin == "diff":
            dm = dm[0] - dm[1]
        elif spin in (0, 1):
            dm = dm[spin]
        else:
            dm = dm[0] + dm[1]
    elif spin not in (None,):
        raise ValueError("spin-resolved export needs an unrestricted dm")
    dm_dev = to_device(dm.astype(np.complex128), dtype=mf._ao.dtype)
    return np.asarray(to_host(_rho_kernel(mf._ao, dm_dev)), dtype=float)


def write_density_cube(mf, path, dm=None, spin=None,
                       comment="electron density"):
    """Density (or spin density, ``spin='diff'``) -> cube file."""
    rho = density_on_grid(mf, dm=dm, spin=spin)
    return write_cube(path, mf.cell, rho, comment=comment)


def write_mo_cube(mf, path, k=0, n=0, spin=None, part="real",
                  comment=None):
    """One crystal orbital psi_{kn}(r) -> cube file.

    ``part``: 'real' | 'imag' | 'abs2'.  Bloch orbitals at k != 0 are
    complex; 'abs2' writes the gauge-invariant density of the orbital."""
    from fftisdf_tpu.utils.device import to_device

    c = mf.mo_coeff[spin] if spin in (0, 1) else mf.mo_coeff
    c_kn = np.asarray(c[k])[:, n]
    c_dev = to_device(c_kn.astype(np.complex128), dtype=mf._ao.dtype)
    psi = np.asarray(to_host(_mo_kernel(mf._ao[k], c_dev)))
    field = {"real": psi.real, "imag": psi.imag,
             "abs2": np.abs(psi) ** 2}[part]
    comment = comment or f"crystal orbital k={k} n={n} ({part})"
    return write_cube(path, mf.cell, field, comment=comment)
