"""Density of states from converged k-point SCF states.

Total DOS, Loewdin-projected DOS (per AO / per atom), and integrated DOS
from the band energies of any driver in scf.hf / scf.ks — the standard
solid-state observable the reference's PySCF driver never computed
(``/root/reference/fftisdf.py:437-466`` stops at total energies).  Host-side
f64 numpy on purpose (tiny (nk, nao) data, matches scf.analysis).

Conventions: energies in Hartree; DOS in states per Hartree per cell,
counting spin (a restricted calculation carries a factor 2, an
unrestricted one returns the two channels separately), so
``integral over all E == 2*nao`` (restricted) / ``nao`` (per spin channel).
"""
from __future__ import annotations

import numpy as np

from fftisdf_tpu.scf.analysis import _atom_offsets


def _as_band_list(mo_energy):
    """Canonicalize (nk, nmo) arrays / ragged per-k lists -> list of 1D."""
    if isinstance(mo_energy, np.ndarray) and mo_energy.ndim == 2:
        return [np.asarray(e, dtype=float) for e in mo_energy]
    return [np.asarray(e, dtype=float).ravel() for e in mo_energy]


def _broaden(de, sigma, kind):
    """Normalized broadening kernel g(de): integral over de == 1."""
    if kind == "gaussian":
        return np.exp(-(de / sigma) ** 2 / 2) / (sigma * np.sqrt(2 * np.pi))
    if kind == "lorentzian":
        return (sigma / np.pi) / (de * de + sigma * sigma)
    raise ValueError(f"unknown broadening kind {kind!r}")


def dos_from_bands(mo_energy, energies, sigma=0.02, weights=None,
                   kind="gaussian", degeneracy=1.0):
    """DOS on an energy grid from per-k band energies.

    mo_energy: (nk, nmo) array or ragged list of 1D arrays;
    weights: optional matching per-state weights (same layout; any number
    of leading component axes in each per-k entry's FIRST dims is NOT
    supported — weights[k] must be (..., nmo_k) with the band axis last);
    degeneracy: spin multiplicity folded in (2 for restricted).
    Returns (npts,) or (ncomp, npts) when weights carry a component axis.
    """
    es = _as_band_list(mo_energy)
    nk = len(es)
    energies = np.asarray(energies, dtype=float)
    out = None
    for k, ek in enumerate(es):
        g = _broaden(energies[:, None] - ek[None, :], sigma, kind)
        if weights is None:
            acc = g.sum(axis=1)
        else:
            wk = np.asarray(weights[k], dtype=float)
            acc = np.einsum("...n,en->...e", wk, g)
        out = acc if out is None else out + acc
    return out * (degeneracy / nk)


def _loewdin_weights(mo_coeff, s1e):
    """Per-k Loewdin AO weights w[k] (nao, nmo_k): |S^1/2 C|^2 columns.

    Sum over the AO axis is exactly 1 per band (C^H S C = 1), so the
    projected DOS sums to the total DOS identically."""
    from fftisdf_tpu.scf.hubbard import shalf_kpts

    sh = shalf_kpts(np.asarray(s1e))
    out = []
    for k in range(len(sh)):
        c = np.asarray(mo_coeff[k])
        out.append(np.abs(sh[k] @ c) ** 2)
    return out


def _spin_channels(mf):
    """[(mo_energy list, mo_coeff list, label), ...] per spin channel."""
    es = mf.mo_energy
    cs = mf.mo_coeff
    if np.asarray(es[0]).ndim == 2 or (isinstance(es, np.ndarray)
                                       and es.ndim == 3):
        return [(es[0], cs[0], "alpha"), (es[1], cs[1], "beta")]
    return [(es, cs, None)]


def fermi_level(mf):
    """Chemical potential of a converged driver: the smeared mu when
    present, else the HOMO/LUMO midpoint over the k-mesh."""
    mu = getattr(mf, "mu", None)
    if mu is not None:
        return float(np.mean(mu)) if np.ndim(mu) else float(mu)
    es, occs = [], []
    for ch_e, occ in zip(
            [c[0] for c in _spin_channels(mf)],
            (mf.mo_occ if np.asarray(mf.mo_occ[0]).ndim == 2
             else [mf.mo_occ])):
        es.append(np.concatenate(_as_band_list(ch_e)))
        occs.append(np.concatenate([np.asarray(o, float).ravel()
                                    for o in occ]))
    e = np.concatenate(es)
    o = np.concatenate(occs)
    homo = e[o > 1e-6].max()
    lumo_cands = e[o <= 1e-6]
    return float((homo + lumo_cands.min()) / 2) if lumo_cands.size \
        else float(homo)


def density_of_states(mf, energies=None, sigma=0.02, npts=600,
                      kind="gaussian", window=None):
    """Total DOS of a converged driver.

    Returns (energies (npts,), dos) with dos (npts,) restricted or
    (2, npts) unrestricted.  ``window``: (emin, emax) in Hartree; default
    spans the band range padded by 5 sigma."""
    assert getattr(mf, "mo_energy", None) is not None, \
        "run mf.kernel() first"
    channels = _spin_channels(mf)
    if energies is None:
        allE = np.concatenate([np.concatenate(_as_band_list(e))
                               for e, _, _ in channels])
        lo, hi = window if window is not None else (
            allE.min() - 5 * sigma, allE.max() + 5 * sigma)
        energies = np.linspace(lo, hi, npts)
    deg = 2.0 if len(channels) == 1 else 1.0
    dos = [dos_from_bands(e, energies, sigma=sigma, kind=kind,
                          degeneracy=deg) for e, _, _ in channels]
    return energies, (dos[0] if len(dos) == 1 else np.stack(dos))


def projected_dos(mf, energies=None, sigma=0.02, npts=600, kind="gaussian",
                  groupby="atom", window=None):
    """Loewdin-projected DOS on the SCF k-mesh.

    groupby: 'atom' -> (natm, npts) per channel, 'ao' -> (nao, npts).
    Returns (energies, pdos) with pdos carrying a leading spin axis for
    unrestricted drivers.  Summing pdos over its group axis reproduces
    ``density_of_states`` exactly (Loewdin weights are a resolution of
    identity per band)."""
    assert getattr(mf, "mo_energy", None) is not None, \
        "run mf.kernel() first"
    channels = _spin_channels(mf)
    if energies is None:
        energies, _ = density_of_states(mf, sigma=sigma, npts=npts,
                                        kind=kind, window=window)
    deg = 2.0 if len(channels) == 1 else 1.0
    outs = []
    for e_ch, c_ch, _ in channels:
        w = _loewdin_weights(c_ch, mf.s1e)
        if groupby == "atom":
            offs = _atom_offsets(mf.cell)
            w = [np.stack([wk[o:o + n].sum(axis=0) for _, o, n in offs])
                 for wk in w]
        elif groupby != "ao":
            raise ValueError(f"unknown groupby {groupby!r}")
        outs.append(dos_from_bands(e_ch, energies, sigma=sigma, kind=kind,
                                   weights=w, degeneracy=deg))
    return energies, (outs[0] if len(outs) == 1 else np.stack(outs))


def integrated_dos(energies, dos, e_max):
    """States below e_max: trapezoidal integral of the (possibly
    spin-stacked) DOS up to e_max."""
    energies = np.asarray(energies)
    dos = np.asarray(dos)
    m = energies <= e_max
    return np.trapezoid(dos[..., m], energies[m], axis=-1)
