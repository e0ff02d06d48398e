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
