"""Falsification of the reference's SVD-whitening recipe (round-2 item #8).

The reference's backup variant (``/root/reference/fftdf-with-k-svd-backup.py``)
rotates the interpolation vectors into the SVD basis of the quartic normal
matrix ``x_k <- einsum("kIm,kIJ->kJm", x_k, u_k)`` with ``u_k, s_k =
svd(x4_k)`` (``:84-105``), RECOMPUTES the RHS from the rotated vectors
through the grid sweep (``:134-144``: ``fx = f conj @ x_rot.T``, elementwise
square), and solves every sector diagonally ``z_q = (1/s_q) * y_q.T``
(``:173-176``).

PARITY.md #10 claimed this is inconsistent across sectors; the truth
(demonstrated here with the actual pipeline pieces, not prose) is stronger:
the quartic normal matrix is the *elementwise square* of the pair overlap
(``x4 = phase-transform of x2 (.) x2``), which is quadratic — not linear —
in the interpolation index.  A rotation of x therefore does NOT act as a
congruence on the recomputed quartic, so ``x4(U x) != U^H x4(x) U`` and the
diagonality assumption fails for EVERY k-mesh, gamma included.  (The script
also dies earlier on its own ``assert s_k.shape == (rank,)`` — it was an
abandoned backup; SURVEY.md section 2a #10.)

What IS exact, per sector, is whitening the *linear* solve: rotate the
ALREADY-COMPUTED RHS by the eigenbasis, ``y_rot_q = y_q v_q`` — then the
rotated normal matrix v^H x4 v is diag(w) to roundoff and the diagonal
solve is just the eigh solver (solver='svd'/'lstsq') in disguise.  That is
the semantics linalg.solvers.whiten_basis provides and the last test gates.
"""
import numpy as np
import jax.numpy as jnp

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.isdf.kpoint import _stripe_quartic
from fftisdf_tpu.linalg.solvers import whiten_basis
from fftisdf_tpu.utils.device import to_device


def _setup(kmesh):
    cell = Cell(
        a=np.diag([4.0, 4.0, 6.0]),
        atom=[("He", (2.0, 2.0, 1.5)), ("He", (2.0, 2.0, 4.0))],
        basis={"He": [Shell(l=0, exps=np.array([1.2, 0.4]),
                            coeffs=np.eye(2))]},
        pseudo=None,
        mesh=np.array([8, 8, 10]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts(kmesh)
    df = FFTISDF(cell, kpts, c0=10.0, m0=(5, 5, 7), verbose=0).build()
    phase = to_device(df.phase, dtype=jnp.complex128)
    return df.x_k, phase


def _recomputed_offdiag_ratio(x_k, phase):
    """Reference recipe: rotate x_k per sector, recompute the quartic from
    the ROTATED vectors (what the grid sweep at :134-144 does), return the
    worst relative off-diagonal weight (0 iff the diagonal solve is valid)."""
    x4_k = _stripe_quartic(x_k, phase)
    x_rot, _ = whiten_basis(x_k, x4_k)
    x4_rot = _stripe_quartic(x_rot, phase)
    worst = 0.0
    for q in range(x4_rot.shape[0]):
        a = np.asarray(x4_rot[q])
        off = a - np.diag(np.diagonal(a))
        worst = max(worst, np.abs(off).max() / np.abs(a).max())
    return worst


def test_recomputed_quartic_not_diagonal_gamma():
    """Even with a single sector the recomputed quartic is far from
    diagonal: the elementwise square breaks the congruence."""
    x_k, phase = _setup([1, 1, 1])
    ratio = _recomputed_offdiag_ratio(x_k, phase)
    assert ratio > 0.05, ratio


def test_recomputed_quartic_not_diagonal_multik():
    x_k, phase = _setup([1, 1, 2])
    ratio = _recomputed_offdiag_ratio(x_k, phase)
    assert ratio > 0.05, ratio


def test_diagonal_solve_fails_recomputed_normal_equations():
    """Through the solve: the reference's z_q = (1/s_q) y_q^T violates the
    recomputed normal equations by orders of magnitude more than a true
    least-squares solution."""
    x_k, phase = _setup([1, 1, 2])
    x4_k = _stripe_quartic(x_k, phase)
    x_rot, winv = whiten_basis(x_k, x4_k)
    x4_rot = _stripe_quartic(x_rot, phase)

    rng = np.random.default_rng(0)
    nip = x_k.shape[1]
    b = jnp.asarray(rng.standard_normal((nip, 32))
                    + 1j * rng.standard_normal((nip, 32)))
    for q in range(x4_rot.shape[0]):
        z_diag = winv[q][:, None] * b          # the reference's solve
        resid = np.abs(np.asarray(x4_rot[q] @ z_diag - b)).max()
        z_true = np.linalg.lstsq(np.asarray(x4_rot[q]), np.asarray(b),
                                 rcond=1e-10)[0]
        resid_true = np.abs(np.asarray(x4_rot[q]) @ z_true
                            - np.asarray(b)).max()
        assert resid > 10 * max(resid_true, 1e-8), (q, resid, resid_true)


def test_linear_whitening_is_exact_per_sector():
    """The consistent form: keep the computed RHS, rotate it LINEARLY by
    the eigenbasis — v^H x4 v is diagonal to roundoff and the diagonal
    solve solves the rotated equations exactly (the whiten_basis
    semantics; algebraically the eigh solver)."""
    x_k, phase = _setup([1, 1, 2])
    x4_k = _stripe_quartic(x_k, phase)
    w, v = np.linalg.eigh(np.asarray(x4_k))
    for q in range(x4_k.shape[0]):
        a_rot = v[q].conj().T @ np.asarray(x4_k[q]) @ v[q]
        off = a_rot - np.diag(np.diagonal(a_rot))
        assert np.abs(off).max() < 1e-12 * max(1.0, np.abs(a_rot).max())
