"""LS-THC with k-points: fit interpolation factors against Cholesky ERIs.

The second, independent fitting formulation of the reference
(``/root/reference/k_least_square.py``, SURVEY.md section 2a #15): instead of
fitting against the FFT Coulomb kernel, fit the 3-index Cholesky decomposition
of the ERIs ("cderi", PySCF-GDF style):

    cderi_{k1 k2}[Q, mn] ~= sum_I coul_q[Q, I] conj(x_{k1,I,m}) x_{k2,I,n}

by least squares:  coul_q = rhs_q @ pinv(zeta_q)  with
    zeta_q = (X_{k1} X_{k1}^H) (.) (X_{k2} X_{k2}^H)^*   (ref :143-158)
    rhs_q[Q, I] = sum_{mn} cderi[Q, mn] x_{k1,I,m} conj(x_{k2,I,n})  (:178-198)

Interpolation points are pooled across q by accumulating pivoted-Cholesky
pivot weights (ref :160-170).

Since PySCF's GDF is not available, the cderi oracle here is exact plane-wave
Cholesky factors: with Z12(G) = FFT[conj(phi1) phi2 e^{-iq r}](G),

    cderi_{k1 k2}[G, mn] = sqrt(vol coulG(q)[G]) / N * Z12(G)[mn]
    eri(12|34)_{mnkl} = sum_G cderi_{12}[G, mn] conj(cderi_{43}[G, lk])

(verified in tests/test_thc.py against the oracle ERIs).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fftisdf_tpu.linalg.fft import fft3
from fftisdf_tpu.linalg.coulomb import get_coulG
from fftisdf_tpu.linalg.pivoted_cholesky import pivoted_cholesky
from fftisdf_tpu.linalg.solvers import solve_fitting
from fftisdf_tpu.lattice import kpoints as kpt_mod
from fftisdf_tpu.utils.logging import Logger


def pw_cderi(cell, ao1, ao2, q, coords, mesh=None):
    """Exact plane-wave 3-index Cholesky factor (naux = ngrid).

    ``q`` must be the sector's canonical q-vector for BOTH factors of an ERI
    contraction — the bra-side factor for pair (k4, k3) is also built with
    +q, even though that pair's momentum is -q modulo a reciprocal vector
    (the G offset would otherwise shift the FFT bins and break the pairing).
    """
    mesh = cell.mesh if mesh is None else mesh
    ng, nao = ao1.shape
    rho = (ao1.conj()[:, :, None] * ao2[:, None, :]).reshape(ng, -1)
    eiqr = jnp.exp(-1j * (jnp.asarray(coords) @ jnp.asarray(q)))
    z = fft3((rho * eiqr[:, None]).T, mesh)  # (nao^2, ng)
    cg = get_coulG(cell, q=q, mesh=mesh)
    fac = jnp.sqrt(cell.vol * cg) / ng
    return (z * fac[None, :]).T.reshape(ng, nao, nao)


class LSTHC:
    """Least-squares tensor hypercontraction over k-points.

    API mirror of the reference's ``WithKPoints(LeastSquareFitting)``
    (``k_least_square.py:84-203``): configure grids implicitly (uniform
    weights folded into the AOs, as ``eval_gto`` does there), ``build()``,
    then ``coul_q`` / ``xipt_k`` hold the THC factors.
    """

    def __init__(self, cell, kpts, verbose=3, grids=None):
        self.cell = cell
        self.kpts = np.asarray(kpts)
        self.verbose = verbose
        self._log = Logger(verbose)
        self.grids = grids      # None: uniform FFT grid; else .coords/.weights
        self.coul_q = None
        self.xipt_k = None
        self.mask = None

    def fit_coords_weights(self):
        if self.grids is not None:
            return (np.asarray(self.grids.coords),
                    np.asarray(self.grids.weights))
        coords = self.cell.gen_uniform_grids()
        ng = coords.shape[0]
        return coords, np.full(ng, self.cell.vol / ng)

    def eval_gto(self, coords, kpts, weights=None):
        """sqrt(weight)-scaled Bloch AOs (the reference folds sqrt(w) into
        the AOs, k_least_square.py:104-118)."""
        from fftisdf_tpu.basis.eval import eval_ao_kpts

        if weights is None:
            weights = np.full(coords.shape[0],
                              self.cell.vol / coords.shape[0])
        return jnp.asarray(np.asarray(
            eval_ao_kpts(self.cell, coords, kpts))
            * np.sqrt(np.abs(weights))[None, :, None])

    def build(self, pivot_tol=1e-16, rcond=1e-12, row_only=False):
        """row_only=True reproduces the reference exactly: zeta/rhs built
        from the k1=0 row of pairs only (``k_least_square.py:146-158``) —
        cheaper, but pairs outside that row are only approximately
        represented (the reference's own error report shows this).  The
        default accumulates every (k1, k2) pair per sector, making the fit
        exact at full rank."""
        cell, kpts = self.cell, self.kpts
        log = self._log
        nk = len(kpts)
        coords, weights = self.fit_coords_weights()
        mesh = cell.mesh
        phi_k = self.eval_gto(coords, kpts, weights)
        nk_, ng, nao = phi_k.shape
        k2c = kpt_mod.get_kconserv2(cell, kpts)
        # the cderi oracle lives on the FFT mesh regardless of fitting grid
        fft_coords = cell.gen_uniform_grids()
        ng_fft = fft_coords.shape[0]
        from fftisdf_tpu.basis.eval import eval_ao_kpts as _eval
        ao_fft = jnp.asarray(np.asarray(_eval(cell, fft_coords, kpts)))

        k1_range = [0] if row_only else range(nk)
        z_q = np.zeros((nk, ng, ng), dtype=np.complex128)
        for k1 in k1_range:
            p1 = np.asarray(phi_k[k1])
            for k2 in range(nk):
                q = k2c[k1, k2]
                p2 = np.asarray(phi_k[k2])
                z_q[q] += (p1.conj() @ p1.T) * (p2 @ p2.conj().T)

        # pivot pooling across q (ref :160-170)
        ww = np.zeros(ng)
        for q in range(nk):
            L, piv, rank, hist = pivoted_cholesky(jnp.asarray(z_q[q]),
                                                  tol=pivot_tol)
            rank = int(rank)
            piv = np.asarray(piv)[:rank]
            ww[piv] += np.asarray(hist)[:rank]
            log.info("LSTHC: q=%d pivot rank %d / %d", q, rank, ng)
        mm = np.where(ww > 1e-16)[0]
        nip = len(mm)
        log.info("LSTHC: pooled nip = %d", nip)
        self.mask = mm

        zeta_q = jnp.asarray(z_q[:, mm][:, :, mm])
        xipt_k = phi_k[:, jnp.asarray(mm), :]

        # RHS from the cderi oracle (ref :178-198)
        naux = ng_fft
        rhs = np.zeros((nk, naux, nip), dtype=np.complex128)
        for k1 in k1_range:
            for k2 in range(nk):
                q = k2c[k1, k2]
                cderi = pw_cderi(cell, ao_fft[k1], ao_fft[k2],
                                 kpts[q], fft_coords, mesh)
                rhs[q] += np.einsum(
                    "Qmn,Im,In->QI",
                    np.asarray(cderi).reshape(naux, nao, nao),
                    np.asarray(xipt_k[k1]), np.asarray(xipt_k[k2]).conj(),
                    optimize=True)

        # per-q pinv solve (ref :200-203)
        coul_q = []
        for q in range(nk):
            z, _ = solve_fitting(zeta_q[q], jnp.asarray(rhs[q]).T,
                                 method="pinv", rcond=rcond)
            coul_q.append(np.asarray(z).T)
        self.coul_q = np.asarray(coul_q)
        self.xipt_k = xipt_k
        return self

    def cderi_sol(self, k1, k2):
        """THC-reconstructed cderi for the pair (k1, k2)."""
        q = kpt_mod.get_kconserv2(self.cell, self.kpts)[k1, k2]
        return np.einsum("QI,Im,In->Qmn", self.coul_q[q],
                         np.asarray(self.xipt_k[k1]).conj(),
                         np.asarray(self.xipt_k[k2]), optimize=True)

    def error_report(self):
        """Per-(k1,k2) max/frobenius cderi errors (ref :205-238)."""
        cell, kpts = self.cell, self.kpts
        from fftisdf_tpu.basis.eval import eval_ao_kpts as _eval

        coords = cell.gen_uniform_grids()
        ao_fft = jnp.asarray(np.asarray(_eval(cell, coords, kpts)))
        k2c = kpt_mod.get_kconserv2(cell, kpts)
        out = []
        for k1 in range(len(kpts)):
            for k2 in range(len(kpts)):
                # canonical sector q-vector (see pw_cderi docstring)
                vq = kpts[k2c[k1, k2]]
                ref = np.asarray(pw_cderi(
                    cell, ao_fft[k1], ao_fft[k2],
                    vq, coords, cell.mesh))
                sol = self.cderi_sol(k1, k2)
                err1 = abs(ref - sol).max()
                err2 = np.linalg.norm(ref - sol)
                self._log.info("k1 = %d, k2 = %d, Max: %6.4e, Mean: %6.4e",
                               k1, k2, err1, err2)
                out.append((k1, k2, err1, err2))
        return out
