"""Serialization of the ISDF build artifact.

The pair (x_k, w_q) plus selection metadata fully determines J/K/ERIs
(ref ``/root/reference/fftisdf.py:125-128``); the reference had no
checkpointing (its H5 files were temporaries — SURVEY.md section 5), so this
is the formalization: a single .npz holding the built state, reloadable
against a compatible (cell, kpts) pair.
"""
from __future__ import annotations

import numpy as np

from fftisdf_tpu.utils.device import to_device, to_host


def save_isdf_state(path, df):
    np.savez_compressed(
        path,
        x_k=to_host(df.x_k),
        wq=to_host(df.wq),
        mask=np.asarray(df.mask),
        kpts=np.asarray(df.kpts),
        kmesh=np.asarray(df.kmesh),
        mesh=np.asarray(df.cell.mesh),
        c0=df.c0,
        m0=np.asarray(df.m0),
        solver=df.solver,
        # Coulomb truncation spec ('' = none): the metric wq baked a
        # truncated kernel in, so a reload must carry it (band serving and
        # exxdiv guards read it)
        trunc_kind="" if df.trunc is None else str(df.trunc[0]),
        trunc_rc=0.0 if df.trunc is None else float(df.trunc[1]),
    )


def load_isdf_state(path, cls, cell, kpts):
    data = np.load(path, allow_pickle=False)
    if not np.allclose(data["kpts"], np.asarray(kpts), atol=1e-10):
        raise ValueError("stored k-points do not match")
    if not np.array_equal(data["mesh"], np.asarray(cell.mesh)):
        raise ValueError("stored FFT mesh does not match cell")
    trunc = None
    if "trunc_kind" in data.files and str(data["trunc_kind"]):
        trunc = (str(data["trunc_kind"]), float(data["trunc_rc"]))
    df = cls(cell=cell, kpts=np.asarray(kpts), c0=float(data["c0"]),
             m0=tuple(int(v) for v in data["m0"]),
             solver=str(data["solver"]), trunc=trunc)
    df.x_k = to_device(data["x_k"])
    df.wq = to_device(data["wq"])
    df.mask = data["mask"]
    return df


# ----------------------------------------------------------------------
# SCF checkpoint: the converged state of a scf.hf / scf.ks driver.
# The reference cached only its GDF cderi to disk
# (/root/reference/k_least_square.py:290-291); a restartable SCF state
# (density + orbitals + energies) is the framework-grade version.

def save_scf(path, mf):
    """Checkpoint a (converged or mid-run) SCF driver to one .npz.

    Stores the density matrix (the restart payload), orbital
    energies/coefficients/occupations when they are regular arrays
    (canonical-orthogonalization can make them ragged across k at tight
    cutoffs — then only the dm is stored), and scalar results.  Restart:
    ``mf.kernel(dm0=load_scf(path)["dm"])``.
    """
    assert getattr(mf, "dm", None) is not None, \
        "nothing to save: run mf.kernel() first"
    payload = {
        "driver": type(mf).__name__,
        "xc": str(getattr(mf, "xc", "")),
        "kpts": np.asarray(mf.kpts),
        "mesh": np.asarray(mf.cell.mesh),
        "dm": np.asarray(mf.dm),
        "e_tot": float(mf.e_tot),
        "e_free": float(mf.e_free if mf.e_free is not None else mf.e_tot),
        "entropy": float(getattr(mf, "entropy", 0.0)),
        "converged": bool(mf.converged),
        "smearing": float(getattr(mf, "smearing", 0.0)),
    }
    mu = getattr(mf, "mu", None)
    if mu is not None:
        payload["mu"] = np.atleast_1d(np.asarray(mu, dtype=float))
    for name in ("mo_energy", "mo_coeff", "mo_occ"):
        arr = getattr(mf, name, None)
        if arr is None:
            continue
        arr = np.asarray(arr)
        if arr.dtype != object:
            payload[name] = arr
    np.savez_compressed(path, **payload)
    return path


def load_scf(path, cell=None, kpts=None):
    """Load an SCF checkpoint -> dict.  When ``cell``/``kpts`` are given,
    the stored FFT mesh / k-points are validated against them (mismatched
    geometry makes the stored dm a silent wrong-answer restart)."""
    data = np.load(path, allow_pickle=False)
    if kpts is not None and not np.allclose(
            data["kpts"], np.asarray(kpts), atol=1e-10):
        raise ValueError("stored k-points do not match")
    if cell is not None and not np.array_equal(
            data["mesh"], np.asarray(cell.mesh)):
        raise ValueError("stored FFT mesh does not match cell")
    out = {k: data[k] for k in data.files}
    for k in ("e_tot", "e_free", "entropy", "smearing"):
        out[k] = float(out[k])
    out["converged"] = bool(out["converged"])
    out["driver"] = str(out["driver"])
    out["xc"] = str(out["xc"])
    return out
