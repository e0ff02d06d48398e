"""Population analysis for converged k-point SCF states.

Mulliken (dm.S diagonal) and Loewdin (S^1/2 dm S^1/2 diagonal) schemes,
k-averaged and resolved per atom — the standard observables for the
north-star NiO-AFM physics (local moments, charge transfer).  Beyond the
reference (its PySCF driver never analyzes the density,
``/root/reference/fftisdf.py:437-466``); small host-side f64 algebra, so
plain numpy on purpose.
"""
from __future__ import annotations

import numpy as np


def _atom_offsets(cell):
    """[(symbol, offset, nfunc), ...] in the package AO layout."""
    out = []
    off = 0
    for sym, _ in cell.atom:
        nfa = sum(sh.nfunc for sh in cell._basis[sym])
        out.append((sym, off, nfa))
        off += nfa
    return out


def ao_populations(cell, dm, s1e, scheme="mulliken"):
    """Per-AO populations (nspin, nao), k-averaged.

    dm: (nk, nao, nao) [restricted total density] or (2, nk, nao, nao);
    restricted input is returned as one channel holding the TOTAL
    population.  ``scheme``: 'mulliken' (Re diag(D S)) or 'loewdin'
    (diag(S^1/2 D S^1/2), basis-rotation-stable — the projector frame the
    DFT+U occupations use, scf.hubbard)."""
    dm = np.asarray(dm)
    s1e = np.asarray(s1e)
    spin_resolved = dm.ndim == 4
    dms = dm if spin_resolved else dm[None]
    nk = s1e.shape[0]
    if scheme == "mulliken":
        pop = np.einsum("skmn,knm->sm", dms, s1e).real / nk
    elif scheme == "loewdin":
        from fftisdf_tpu.scf.hubbard import shalf_kpts

        sh = shalf_kpts(s1e)
        pop = np.einsum("kpm,skmn,knp->sp", sh, dms, sh).real / nk
    else:
        raise ValueError(f"unknown population scheme {scheme!r}")
    return pop


def atom_charges_and_moments(cell, dm, s1e, scheme="mulliken"):
    """Per-atom (charges, spin moments) from a converged density.

    charge = Z_eff - n_atom (Z_eff from the pseudopotential when present);
    moment = n_alpha - n_beta (zeros for restricted input).  Returns two
    (natm,) arrays aligned with ``cell.atom``."""
    from fftisdf_tpu.basis import data as basis_data

    pop = ao_populations(cell, dm, s1e, scheme=scheme)
    spin_resolved = pop.shape[0] == 2
    charges, moments = [], []
    for sym, off, nfa in _atom_offsets(cell):
        n_s = pop[:, off:off + nfa].sum(axis=1)
        n_tot = n_s.sum()
        ps = cell._pseudo.get(sym)
        z = (float(ps.zion) if ps is not None
             else float(basis_data.ATOMIC_NUMBER[
                 basis_data.element_symbol(sym)]))
        charges.append(z - n_tot)
        moments.append(n_s[0] - n_s[1] if spin_resolved else 0.0)
    return np.asarray(charges), np.asarray(moments)


def mulliken(mf, scheme="mulliken", log=True):
    """Population analysis of a converged SCF driver: returns
    (charges (natm,), moments (natm,)) and optionally prints them."""
    assert getattr(mf, "dm", None) is not None, "run mf.kernel() first"
    charges, moments = atom_charges_and_moments(
        mf.cell, mf.dm, mf.s1e, scheme=scheme)
    if log:
        syms = [sym for sym, _ in mf.cell.atom]
        print(f"{scheme} analysis:")
        for sym, q, m in zip(syms, charges, moments):
            print(f"  {sym:4s} charge {q:+.4f}  moment {m:+.4f}")
    return charges, moments
