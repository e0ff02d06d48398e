"""Exact diagonalization (FCI) for small orbital spaces.

Determinant-basis (bitstring) construction restricted to the
(n_alpha, n_beta) particle sector — the in-package exact solver for
DMET embedding problems (scf.dmet) and for oracle-grade gates.  Spatial
orbitals with complex Hermitian one-body ``h1`` and chemists'
``(pq|rs)`` two-body integrals:

    H = sum_pq h1[p,q] sum_s  p+_s q_s
      + 1/2 sum_pqrs (pq|rs) sum_st p+_s r+_t s_t q_s

Fermionic operator strings act directly on occupation bitmasks with
exact parity signs (no matrices until the sector Hamiltonian), so the
cost is O(n^4 * dim_sector) to build and O(dim^3) to diagonalize —
practical to n ~ 8 spatial orbitals (C(8,4)^2 = 4900 determinants at
half filling).

Returns the ground-state electronic energy with spin-summed RDMs in the
conventions

    gamma[p,q]   = <p+ q>            E1 = sum h1[p,q] gamma[p,q]
    Gamma[pqrs]  = <p+ r+ s q>       E2 = 1/2 sum (pq|rs) Gamma[pqrs]

and asserts the energy rebuilt from (gamma, Gamma) equals the eigenvalue
— a built-in convention self-check (gated with random integrals in
tests/test_dmet.py).
"""
from __future__ import annotations

from itertools import combinations

import numpy as np

_MAX_ORB = 8


def _popcount_below(state, mode):
    return bin(state & ((1 << mode) - 1)).count("1")


def _apply_string(ops, state):
    """Apply a right-to-left string of (mode, create) to a bitmask.
    Returns (state', sign) or (None, 0) if annihilated."""
    sign = 1
    for mode, create in reversed(ops):
        bit = 1 << mode
        occupied = state & bit
        if (create and occupied) or (not create and not occupied):
            return None, 0
        if _popcount_below(state, mode) & 1:
            sign = -sign
        state ^= bit
    return state, sign


def _sector_basis(n, na, nb):
    """Bitmask basis: alpha modes 0..n-1, beta modes n..2n-1."""
    states = []
    for occ_a in combinations(range(n), na):
        ma = sum(1 << p for p in occ_a)
        for occ_b in combinations(range(n), nb):
            states.append(ma | sum(1 << (n + p) for p in occ_b))
    return states


def fci_ground(h1, eri, nelec):
    """Ground state in the (na, nb) sector.

    h1: (n, n) complex Hermitian; eri: (n, n, n, n) chemists' (pq|rs);
    nelec: total electron count (na = ceil, nb = floor) or (na, nb).
    Returns (e_elec, gamma, Gamma).
    """
    h1 = np.asarray(h1, dtype=complex)
    eri = np.asarray(eri, dtype=complex)
    n = h1.shape[0]
    if n > _MAX_ORB:
        raise NotImplementedError(
            f"determinant FCI here is limited to {_MAX_ORB} spatial "
            f"orbitals (got {n}); use a smaller DMET fragment")
    if isinstance(nelec, (tuple, list)):
        na, nb = int(nelec[0]), int(nelec[1])
    else:
        nb = int(nelec) // 2
        na = int(nelec) - nb
    states = _sector_basis(n, na, nb)
    index = {s: i for i, s in enumerate(states)}
    dim = len(states)

    terms1 = [(h1[p, q], p, q) for p in range(n) for q in range(n)
              if abs(h1[p, q]) > 1e-14]
    terms2 = [(eri[p, q, r, s], p, q, r, s)
              for p in range(n) for q in range(n)
              for r in range(n) for s in range(n)
              if abs(eri[p, q, r, s]) > 1e-14]

    H = np.zeros((dim, dim), dtype=complex)
    for j, st in enumerate(states):
        for val, p, q in terms1:
            for sp in (0, n):
                st2, sg = _apply_string(
                    [(p + sp, True), (q + sp, False)], st)
                if st2 is not None:
                    H[index[st2], j] += sg * val
        for val, p, q, r, s in terms2:
            for s1 in (0, n):
                for s2 in (0, n):
                    st2, sg = _apply_string(
                        [(p + s1, True), (r + s2, True),
                         (s + s2, False), (q + s1, False)], st)
                    if st2 is not None:
                        H[index[st2], j] += 0.5 * sg * val
    w, vecs = np.linalg.eigh(H)
    e0 = float(w[0])
    v = vecs[:, 0]

    gamma = np.zeros((n, n), dtype=complex)
    Gam = np.zeros((n,) * 4, dtype=complex)
    for j, st in enumerate(states):
        if abs(v[j]) < 1e-14:
            continue
        for p in range(n):
            for q in range(n):
                for sp in (0, n):
                    st2, sg = _apply_string(
                        [(p + sp, True), (q + sp, False)], st)
                    if st2 is not None:
                        gamma[p, q] += np.conj(v[index[st2]]) * sg * v[j]
        for p in range(n):
            for q in range(n):
                for r in range(n):
                    for s in range(n):
                        for s1 in (0, n):
                            for s2 in (0, n):
                                st2, sg = _apply_string(
                                    [(p + s1, True), (r + s2, True),
                                     (s + s2, False), (q + s1, False)],
                                    st)
                                if st2 is not None:
                                    Gam[p, q, r, s] += (
                                        np.conj(v[index[st2]]) * sg
                                        * v[j])
    e_check = (np.einsum("pq,pq->", h1, gamma)
               + 0.5 * np.einsum("pqrs,pqrs->", eri, Gam))
    assert abs(e_check - e0) < 1e-8 * max(1.0, abs(e0)), (e_check, e0)
    return e0, gamma, Gam
