"""Shared SCF numerics: DIIS extrapolation and occupation assignment.

The host-loop drivers (``scf.hf``: numpy, f64, ragged per-k spectra) and the
device-resident driver (``scf.device``: jax, traced under ``jit``, static
shapes with penalty-masked columns) previously carried separate copies of
the same three pieces of math — the Pulay DIIS system, the smeared-occupation
bisection + entropy, and aufbau occupations.  This module is the single
source of truth: every core function takes the array namespace ``xp``
(``numpy`` or ``jax.numpy``) and, where a loop is needed, a ``fori``
primitive (plain Python loop on the host, ``lax.fori_loop`` under trace),
so the SAME expression graph runs eagerly in f64 and traced in f32.

The reference delegates all of this to PySCF's SCF machinery
(``/root/reference/fftisdf.py:437-466``); these drivers are original.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "fori_host", "diis_extrapolate", "adiis_coeffs", "smeared_occ",
    "aufbau_occ", "smeared_occupations", "fixed_occupations",
]


def fori_host(lo, hi, body, init):
    """Host stand-in for ``jax.lax.fori_loop`` (eager numpy path)."""
    val = init
    for i in range(lo, hi):
        val = body(i, val)
    return val


def _real_finfo(dtype):
    """finfo of the real dtype underlying a (possibly complex) dtype."""
    return np.finfo(np.dtype(dtype).type(0).real.dtype)


def diis_extrapolate(errs, focks, valid, xp):
    """Pulay-extrapolated Fock from stored (error, fock) rows.

    errs/focks: (m, L) complex rows; valid: (m,) bool mask of live slots.
    Minimizes ``|sum_i c_i err_i|^2`` subject to ``sum_i c_i = 1``.  The B
    matrix is normalized by its largest live element before a *relative*
    Tikhonov term, so the solve stays well-posed from the first iteration
    (|err| ~ 1) through convergence (|err| ~ 1e-8, B ~ 1e-16) in either
    precision; the coefficient vector is invariant under the normalization
    (the constrained minimizer of c'Bc does not see a scalar rescale of B).
    With a single live slot the constraint returns that Fock exactly, so no
    warm-up branch is needed.
    """
    m = errs.shape[0]
    b = xp.einsum("il,jl->ij", errs.conj(), errs)
    vv = valid[:, None] & valid[None, :]
    scale = xp.max(xp.where(vv, xp.abs(b), 0.0)) + _real_finfo(b.dtype).tiny
    b = b / scale
    eye_m = xp.eye(m, dtype=b.dtype)
    b = xp.where(vv, b, eye_m)           # dead slots: decoupled identity
    edge = xp.where(valid, -1.0, 0.0).astype(b.dtype)
    a = xp.concatenate([
        xp.concatenate([b, edge[:, None]], axis=1),
        xp.concatenate([edge, xp.zeros((1,), dtype=b.dtype)])[None, :],
    ], axis=0)
    a = a + 1e-12 * xp.eye(m + 1, dtype=b.dtype)
    rhs = xp.concatenate([xp.zeros((m,), dtype=b.dtype),
                          -xp.ones((1,), dtype=b.dtype)])
    coef = xp.linalg.solve(a, rhs)[:m] * valid.astype(b.dtype)
    return xp.einsum("i,il->l", coef, focks)


def adiis_coeffs(dms, focks, ref, valid, xp, fori, n_steps=400):
    """ADIIS simplex coefficients (Hu & Yang, JCP 132, 054109 (2010)).

    Pulay/CDIIS extrapolates the *error*, which is a local model: far from
    convergence (the NiO d-manifold competition: near-degenerate states
    swapping occupation between iterations) its coefficients go wild and
    the SCF limit-cycles — the round-3 artifact needed damp=0.4 and 179
    cycles.  ADIIS instead minimizes a quadratic model of the ENERGY over
    the convex hull of the stored densities,

        f(c) = 2 sum_i c_i Re<D_i - D_ref, F_ref>
             + sum_ij c_i c_j Re<D_i - D_ref, F_j - F_ref>,
        c on the simplex (c_i >= 0, sum c_i = 1),

    which is globally damped by construction (no coefficient can leave
    [0, 1]).  Drivers blend: ADIIS while the commutator error is large,
    CDIIS for the terminal quadratic phase (PySCF's DIIS policy).

    dms/focks: (m, L) flattened complex histories; ``ref`` the slot index
    of the current (D, F); valid: (m,) bool.  Solved by entropic mirror
    descent (c <- c * exp(-eta g), renormalized) — dead/zero slots are
    absorbing, every iterate is feasible, and the whole solve traces under
    ``jit`` (the device-resident driver runs this exact code; scipy-free).
    Returns c (m,) real.
    """
    m = dms.shape[0]
    rdt = _real_finfo(dms.dtype).dtype
    d_ref = dms[ref]
    f_ref = focks[ref]
    dd = dms - d_ref[None, :]
    df = focks - f_ref[None, :]
    vf = valid.astype(rdt)
    # dead slots masked to 0 BEFORE the scale normalization: their garbage
    # rows would otherwise blow up through a near-zero scale (single live
    # slot: scale ~ tiny) and 0 * exp(inf) = NaN in the multiplicative
    # update
    a = xp.real(xp.einsum("il,l->i", dd.conj(), f_ref)).astype(rdt) * vf
    b = xp.real(xp.einsum("il,jl->ij", dd.conj(), df)).astype(rdt) \
        * vf[:, None] * vf[None, :]
    # scale-invariant objective (the minimizer ignores a positive rescale;
    # the mirror-descent step size does not)
    scale = xp.max(xp.abs(a)) + xp.max(xp.abs(b)) + _real_finfo(rdt).tiny
    a = a / scale
    b = b / scale
    c0 = vf / xp.sum(vf)

    def body(t, c):
        g = (2.0 * a + (b + b.T) @ c) * vf
        g = g - xp.sum(c * g)                   # gauge: tangent of simplex
        gmax = xp.max(xp.abs(g) * vf) + _real_finfo(rdt).tiny
        eta = 2.0 / (1.0 + 0.02 * t)
        c = c * xp.exp(-eta * g / gmax) * vf
        return c / (xp.sum(c) + _real_finfo(rdt).tiny)

    return fori(0, n_steps, body, c0)


def smeared_occ(e, ok, nelec_target, sigma, method, xp, fori):
    """Fractional occupations from a bisected global chemical potential.

    e: eigenvalues, any shape; ok: same-shape bool (False = dropped /
    padded slot -> occupation exactly 0); nelec_target: the value
    ``sum(f)`` is bisected to (spin-degeneracy factors are applied by the
    caller).  Returns ``(f, entropy, mu)`` with f in [0, 1] and the
    dimensionless entropy ``S`` such that the Mermin free energy is
    ``E - sigma * S`` (per-cell 1/nk normalization is the caller's).

    90 bisection steps shrink the bracket by 2^-90 — exact to f64
    resolution; in f32 the midpoint stops moving once the bracket is below
    eps and further steps are no-ops, so one count serves both precisions.
    """
    fin = _real_finfo(e.dtype)
    f64 = fin.bits == 64
    clip = 600.0 if f64 else 60.0        # exp overflow guard per precision
    big = 1e30

    def nelec(mu):
        x = xp.clip((e - mu) / sigma, -clip, clip)
        if method == "fermi":
            f = 1.0 / (1.0 + xp.exp(x))
        else:                            # gauss
            if xp is np:
                from scipy.special import erfc
            else:
                from jax.scipy.special import erfc
            f = 0.5 * erfc(x)
        f = xp.where(ok, f, 0.0)
        return xp.sum(f), f

    def body(_, lohi):
        lo, hi = lohi
        mu = 0.5 * (lo + hi)
        n, _ = nelec(mu)
        return (xp.where(n < nelec_target, mu, lo),
                xp.where(n < nelec_target, hi, mu))

    emin = xp.min(xp.where(ok, e, big))
    emax = xp.max(xp.where(ok, e, -big))
    lo, hi = fori(0, 90, body, (emin - 45.0 * sigma, emax + 45.0 * sigma))
    mu = 0.5 * (lo + hi)
    _, f = nelec(mu)

    if method == "fermi":
        f_lo = 1e-300 if f64 else 1e-30
        f_hi = (1.0 - 1e-16) if f64 else (1.0 - 1e-7)
        fc = xp.clip(f, f_lo, f_hi)
        s = -(fc * xp.log(fc) + (1.0 - fc) * xp.log1p(-fc))
        s = xp.where(ok & (f > f_lo) & (f < f_hi), s, 0.0)
    else:
        x = (e - mu) / sigma
        s = xp.where(ok, xp.exp(-x * x) / (2.0 * xp.sqrt(xp.pi)), 0.0)
    return f, xp.sum(s), mu


def aufbau_occ(e, ok, nocc, xp):
    """0/1 occupations of the ``nocc`` lowest valid states per k row.

    e, ok: (nk, nmo); invalid slots never occupy (rank trick keeps shapes
    static for the traced caller)."""
    ee = xp.where(ok, e, 1e30)
    rank = xp.argsort(xp.argsort(ee, axis=-1), axis=-1)
    return ((rank < nocc) & ok).astype(_real_finfo(e.dtype).dtype)


# ----------------------------------------------------------------------
# Host-facing wrappers over ragged per-k spectra (lists of 1-D arrays of
# possibly differing lengths after canonical orthogonalization).

def smeared_occupations(es, nocc, sigma, method="fermi", factor=2.0):
    """Fractional occupations from a global chemical potential (host view).

    es: list of per-k (nmo_k,) eigenvalue arrays.  Returns
    ``(occs, mu, entropy)`` with ``sum_k sum_i occ[k][i] ==
    factor * nocc * nk`` (bisected to machine precision) and the
    dimensionless entropy ``S = sum_k s_k`` such that the Mermin free
    energy is ``E - sigma * S / nk``.

    The reference has no smearing (its SCF is PySCF's fixed-occupation
    KRHF); this is the standard finite-temperature extension needed for
    small-gap systems (NiO AFM) where per-k aufbau occupations dither
    between near-degenerate states across SCF iterations.
    """
    ns = [len(np.asarray(ek)) for ek in es]
    nmax = max(ns)
    e = np.full((len(es), nmax), 1e30)
    ok = np.zeros((len(es), nmax), dtype=bool)
    for i, ek in enumerate(es):
        e[i, :ns[i]] = np.asarray(ek)
        ok[i, :ns[i]] = True
    f, s, mu = smeared_occ(e, ok, float(nocc * len(es)), sigma, method,
                           np, fori_host)
    occs = [factor * f[i, :n] for i, n in enumerate(ns)]
    return occs, float(mu), factor * float(s)


def fixed_occupations(es, nocc, factor=2.0):
    """Aufbau 0/factor occupations per k row (host view, ragged input)."""
    out = []
    for ek in es:
        occ = np.zeros(len(np.asarray(ek)))
        occ[:nocc] = factor
        out.append(occ)
    return out
