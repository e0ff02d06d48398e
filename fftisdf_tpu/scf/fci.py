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


def _popcount64(x):
    """Vectorized popcount for int64 arrays."""
    x = x - ((x >> 1) & 0x5555555555555555)
    x = (x & 0x3333333333333333) + ((x >> 2) & 0x3333333333333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F0F0F0F0F
    return (x * 0x0101010101010101) >> 56


def _apply_string_vec(ops, states):
    """Apply a right-to-left string of (mode, create) to an int64 state
    array.  Returns (new_states, sign (+-1), valid mask) — vectorized
    over the determinant basis."""
    st = states.copy()
    sign = np.ones(len(states), dtype=np.int64)
    valid = np.ones(len(states), dtype=bool)
    for mode, create in reversed(ops):
        bit = np.int64(1 << mode)
        occupied = (st & bit) != 0
        valid &= (~occupied if create else occupied)
        parity = _popcount64(st & np.int64(bit - 1)) & 1
        sign = np.where(parity == 1, -sign, sign)
        st = st ^ bit
    return st, sign, valid


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
    states = np.array(_sector_basis(n, na, nb), dtype=np.int64)
    dim = len(states)
    order = np.argsort(states)
    sorted_states = states[order]

    def rows_of(new_states):
        pos = np.searchsorted(sorted_states, new_states)
        pos = np.clip(pos, 0, dim - 1)
        # spin-sector conservation guarantees membership; verify anyway
        assert np.array_equal(sorted_states[pos], new_states)
        return order[pos]

    cols = np.arange(dim)

    def accumulate(mat, ops, val):
        st2, sg, ok = _apply_string_vec(ops, states)
        if not ok.any():
            return
        rows = rows_of(st2[ok])
        np.add.at(mat, (rows, cols[ok]), val * sg[ok])

    H = np.zeros((dim, dim), dtype=complex)
    for p in range(n):
        for q in range(n):
            if abs(h1[p, q]) > 1e-14:
                for sp in (0, n):
                    accumulate(H, [(p + sp, True), (q + sp, False)],
                               h1[p, q])
            for r in range(n):
                for s in range(n):
                    val = eri[p, q, r, s]
                    if abs(val) > 1e-14:
                        for s1 in (0, n):
                            for s2 in (0, n):
                                accumulate(
                                    H, [(p + s1, True), (r + s2, True),
                                        (s + s2, False),
                                        (q + s1, False)], 0.5 * val)
    w, vecs = np.linalg.eigh(H)
    e0 = float(w[0])
    v = vecs[:, 0]

    def expval(ops):
        st2, sg, ok = _apply_string_vec(ops, states)
        if not ok.any():
            return 0.0
        rows = rows_of(st2[ok])
        return np.sum(np.conj(v[rows]) * sg[ok] * v[cols[ok]])

    gamma = np.zeros((n, n), dtype=complex)
    Gam = np.zeros((n,) * 4, dtype=complex)
    for p in range(n):
        for q in range(n):
            for sp in (0, n):
                gamma[p, q] += expval([(p + sp, True), (q + sp, False)])
            for r in range(n):
                for s in range(n):
                    for s1 in (0, n):
                        for s2 in (0, n):
                            Gam[p, q, r, s] += expval(
                                [(p + s1, True), (r + s2, True),
                                 (s + s2, False), (q + s1, False)])
    e_check = (np.einsum("pq,pq->", h1, gamma)
               + 0.5 * np.einsum("pqrs,pqrs->", eri, Gam))
    assert abs(e_check - e0) < 1e-8 * max(1.0, abs(e0)), (e_check, e0)
    return e0, gamma, Gam
