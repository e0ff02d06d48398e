"""Fitting-equation solvers: the four variants the reference prototypes.

The ISDF fit solves ``A z = B`` with ``A = x4_q`` (nip x nip hermitian PSD)
and ``B = y_q^T`` (nip x ngrid), per momentum sector q.  The reference tried
four solvers (SURVEY.md section 2a #7-10):

- ``lstsq``  — LAPACK gelsy (``/root/reference/fftisdf.py:108``)
- ``pinv``   — Moore-Penrose (``fftdf-with-k.py:92-95``)
- ``svd``    — rank-truncated SVD (``fftdf-with-k-svd.py:147-164``)
- ``whiten`` — SVD-whitening of the interpolation vectors so the solve is
  diagonal (``fftdf-with-k-svd-backup.py:84-105,173-176``)

On TPU all four reduce to one eigendecomposition of the hermitian ``A``
(XLA eigh) followed by MXU matmuls; ``gelsy``'s column-pivoted QR has no TPU
advantage over eigh for hermitian systems, so eigh is the canonical kernel.
``whiten`` is exposed through :func:`whiten_basis` (it rotates x_k instead of
solving).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hermitian_solve(a, b, rcond=None, rank=None, precondition=True,
                    refine=None):
    """Solve a z = b for hermitian PSD a via eigh with spectral truncation.

    Numerical hardening for f32 devices (where the pair-density normal
    matrices are severely ill-conditioned):
    - Jacobi (two-sided diagonal) preconditioning: eigh runs on
      D a D with D = diag(a)^-1/2, collapsing the amplitude-driven part of
      the condition number;
    - fixed-precision iterative refinement (default 1 step on f32): corrects
      the truncated-eigh solve against the original matrix.

    Returns (z, numerical_rank)."""
    rdtype = jnp.real(a).dtype
    if refine is None:
        refine = 0 if rdtype == jnp.float64 else 1
    if precondition:
        dscale = jnp.real(jnp.diagonal(a))
        dmax = jnp.max(jnp.abs(dscale))
        d = jnp.where(dscale > 1e-30 * dmax,
                      1.0 / jnp.sqrt(jnp.where(dscale > 1e-30 * dmax,
                                               dscale, 1.0)), 0.0)
        a_s = a * d[:, None] * d[None, :]
    else:
        d = None
        a_s = a
    w, v = jnp.linalg.eigh(a_s)
    wmax = jnp.max(jnp.abs(w))
    if rcond is None:
        rcond = a.shape[-1] * jnp.finfo(w.dtype).eps
    cutoff = rcond * wmax
    keep = w > cutoff
    if rank is not None:
        # additionally cap the rank: keep the `rank` largest eigenvalues
        idx = jnp.argsort(w)[::-1]
        kmask = jnp.zeros_like(keep).at[idx[:rank]].set(True)
        keep = jnp.logical_and(keep, kmask)
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)

    def apply_inv(rhs):
        if d is not None:
            rhs = d[:, None] * rhs
        out = v @ (winv[:, None] * (v.conj().T @ rhs))
        if d is not None:
            out = d[:, None] * out
        return out

    z = apply_inv(b)
    for _ in range(refine):
        z = z + apply_inv(b - a @ z)
    return z, jnp.sum(keep.astype(jnp.int32))


def ridge_solve(a, b, rcond=1e-10, refine=None):
    """Tikhonov-regularized Cholesky solve: z = (a + rcond*amax*I)^-1 b.

    The smooth counterpart of spectral truncation: weak directions are damped
    instead of cut.  One potrf + two triangular solves — much cheaper than
    eigh on TPU (no QDWH iterations).  Jacobi preconditioning and optional
    iterative refinement as in hermitian_solve."""
    rdtype = jnp.real(a).dtype
    if refine is None:
        refine = 0 if rdtype == jnp.float64 else 1
    dscale = jnp.real(jnp.diagonal(a))
    dmax = jnp.max(jnp.abs(dscale))
    d = jnp.where(dscale > 1e-30 * dmax,
                  1.0 / jnp.sqrt(jnp.where(dscale > 1e-30 * dmax,
                                           dscale, 1.0)), 0.0)
    a_s = a * d[:, None] * d[None, :]
    lam = rcond * jnp.max(jnp.real(jnp.diagonal(a_s)))
    a_r = a_s + lam * jnp.eye(a.shape[-1], dtype=a.dtype)
    chol = jnp.linalg.cholesky(a_r)

    def apply_inv(rhs):
        rhs = d[:, None] * rhs
        u = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
        out = jax.scipy.linalg.solve_triangular(
            chol.conj().T, u, lower=False)
        return d[:, None] * out

    z = apply_inv(b)
    for _ in range(refine):
        z = z + apply_inv(b - a @ z)
    return z, jnp.asarray(a.shape[-1], dtype=jnp.int32)


def solve_fitting(a, b, method="lstsq", rcond=1e-10, rank=None,
                  precondition=True, refine=None):
    """Dispatch over the reference's solver variants; all TPU-native.

    a: (nip, nip) hermitian PSD; b: (nip, m).  Returns (z, rank).
    """
    if method in ("lstsq", "pinv", "eigh"):
        return hermitian_solve(a, b, rcond=rcond, rank=rank,
                               precondition=precondition, refine=refine)
    if method == "ridge":
        return ridge_solve(a, b, rcond=rcond, refine=refine)
    if method == "svd":
        u, s, vh = jnp.linalg.svd(a)
        smax = s[0]
        keep = s > rcond * smax
        if rank is not None:
            keep = jnp.logical_and(
                keep, jnp.arange(s.shape[0]) < rank
            )
        sinv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
        z = vh.conj().T @ (sinv[:, None] * (u.conj().T @ b))
        return z, jnp.sum(keep.astype(jnp.int32))
    raise ValueError(f"unknown solver {method!r}")


def whiten_basis(x_k, x4_k, rcond=1e-10):
    """SVD-whitening variant: rotate interpolation vectors into the
    eigenbasis of x4 so downstream solves become diagonal scalings
    (ref ``fftdf-with-k-svd-backup.py:84-105``).

    x_k: (nk, nip, nao); x4_k: (nk, nip, nip).
    Returns (x_rot (nk, nip, nao), scale (nk, nip)): the fitting solve for
    sector q is then ``z_q = scale[q][:, None] * y_rot_q^T``.
    """
    w, v = jnp.linalg.eigh(x4_k)  # batched over k
    keep = w > rcond * jnp.max(w, axis=-1, keepdims=True)
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    x_rot = jnp.einsum("kIm,kIJ->kJm", x_k, v.conj())
    return x_rot, winv
