"""Bethe-Salpeter equation (Tamm-Dancoff) optical excitations on the
ISDF state — the GW+BSE production method for absorption spectra and
exciton binding in solids (Rohlfing & Louie, PRB 62, 4927 (2000)).

The reference repo has no correlated-spectroscopy capability at all; here
every electron-hole coupling collapses onto the nip x nip interpolation
(fitting) space of the SAME FFTISDF build that served the SCF:

    A_{(k)ia,(k')jb} = (E^QP_{a,k+q} - E^QP_{i,k}) delta_{k k', ij, ab}
        + 2 (a k+q, i k | j k', b k'+q)/nk         [bare exchange; singlet]
        - W^0_{(a b),(j i)}/nk                     [statically screened
                                                    direct term]

The exchange (Coulomb) term is exactly the TDA Coulomb piece; the direct
term is exactly the TDA exact-exchange piece with the bare metric w_q
replaced by the statically screened one

    W_q(0) = w_q + w_q chi0_q(0) (1 - w_q chi0_q(0))^{-1} w_q,

where chi0_q(0) is the omega = 0 slice of the RPA polarizability in the
fitting space — the same per-sector object scf.gw samples along the
imaginary axis (``gw._sigma_q_contrib``: there m(I-m)^{-1} w builds the
CORRELATION part W_c; the BSE direct term keeps the bare w_q head too,
which at hyb = 1 and chi0 = 0 reduces BSE exactly to CIS — gated).

Quasiparticle energies: pass ``qp_energy`` (e.g. from ``scf.gw.g0w0``) to
replace the mean-field eigenvalues in the diagonal; default keeps the
mean-field spectrum (useful for gating and for "BSE@DFT" quick looks).

Oscillator strengths: BSE eigenvectors share the TDA flat layout, so
``scf.tddft.oscillator_strengths`` applies unchanged.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fftisdf_tpu.utils.device import to_device, to_host, jit_take
from fftisdf_tpu.scf.tddft import (_ka_map, _mo_setup, _coul_piece,
                                   _exch_piece, _mul, _scale, _axpy,
                                   davidson)
from fftisdf_tpu.scf import gw as gw_mod


@jax.jit
def _static_w_q(pair_amp, delta, wq, inv_nk):
    """Statically screened sector metric W_q(0) = w + m (I - m)^{-1} w,
    m = w chi0_q(0), chi0 built exactly as scf.gw does at omega = 0."""
    g = -4.0 / delta
    chi = inv_nk * ((pair_amp * g[None, :].astype(pair_amp.dtype))
                    @ pair_amp.T)
    m = wq @ chi
    eye = jnp.eye(wq.shape[0], dtype=wq.dtype)
    return wq + m @ jnp.linalg.solve(eye - m, wq)


def static_w(df, mf, qp_energy=None):
    """The (nk, nip, nip) statically screened Coulomb metric W_q(0).

    chi0 uses the mean-field occ/virt energies by default (standard
    GW+BSE practice screens with the RPA of the mean-field system);
    ``qp_energy`` switches the polarizability poles to QP energies
    (eigenvalue-self-consistent screening)."""
    nk = df.nkpt
    mo_c = np.asarray(mf.mo_coeff)
    mo_e = np.asarray(mf.mo_energy if qp_energy is None else qp_energy)
    mo_o = np.asarray(mf.mo_occ)
    assert mo_c.ndim == 3, "restricted (KRHF/KRKS) reference required"
    nocc = int(round(mo_o[0].sum() / 2))
    k2c = df.kconserv2()
    _, xo, xv = gw_mod._mo_blocks(df, mo_c, nocc)
    rdt = jnp.float64 if df.x_k.dtype == jnp.complex128 else jnp.float32
    inv_nk = jnp.asarray(1.0 / nk, dtype=rdt)

    parts = []
    for q in range(nk):
        blocks, deltas = [], []
        for ki in range(nk):
            ka = int(np.nonzero(k2c[ki] == q)[0][0])
            blocks.append(gw_mod._pair_mat(xo[ki], xv[ka]))
            deltas.append((mo_e[ka][nocc:][None, :]
                           - mo_e[ki][:nocc][:, None]).ravel())
        pair_amp = jnp.concatenate(blocks, axis=1)
        delta = to_device(np.concatenate(deltas), dtype=rdt)
        parts.append(_static_w_q(pair_amp, delta, jit_take(df.wq, q),
                                 inv_nk))
    return jax.jit(lambda *a: jnp.stack(a))(*parts)


class BSEOperator:
    """Matrix-free BSE-TDA operator at momentum-transfer index q.

    ``mf``: converged restricted reference (KRHF/KRKS, insulating);
    ``df``: the built FFTISDF; ``qp_energy``: optional (nk, nmo) QP
    eigenvalues for the diagonal (``scf.gw.g0w0`` output); ``wqs``: a
    precomputed static W tensor (built once via :func:`static_w` when
    absent); ``singlet=False`` drops the bare exchange term (triplet
    excitons — only the screened direct term binds them)."""

    def __init__(self, mf, df, q=0, singlet=True, qp_energy=None,
                 wqs=None):
        kpts = np.asarray(mf.kpts)
        nk = len(kpts)
        self.nk, self.q, self.singlet = nk, int(q), bool(singlet)
        mo_c, mo_e, nocc = _mo_setup(mf)
        if qp_energy is not None:
            mo_e = np.asarray(qp_energy)
            assert mo_e.shape == (nk, mo_c.shape[-1]), \
                "qp_energy must be (nk, nmo)"
        nao, nmo = mo_c.shape[1:]
        self.nocc, self.nvir = nocc, nmo - nocc
        k2c = df.kconserv2()
        self.ka_of = _ka_map(k2c, self.q)
        self.delta = np.stack([
            mo_e[self.ka_of[ki]][None, nocc:] - mo_e[ki][:nocc, None]
            for ki in range(nk)])                       # (nk, no, nv)
        cdt = df.x_k.dtype
        self._cdt = cdt
        xo, xva = [], []
        for ki in range(nk):
            xk = jit_take(df.x_k, ki)
            xa = jit_take(df.x_k, int(self.ka_of[ki]))
            co = to_device(mo_c[ki][:, :nocc], dtype=cdt)
            cv = to_device(mo_c[self.ka_of[ki]][:, nocc:], dtype=cdt)
            xo.append(jax.jit(lambda a, b: a @ b)(xk, co))
            xva.append(jax.jit(lambda a, b: a @ b)(xa, cv))
        self.xo = jax.jit(lambda *a: jnp.stack(a))(*xo)
        self.xva = jax.jit(lambda *a: jnp.stack(a))(*xva)
        self.wq = df.wq
        self.wqs = static_w(df, mf) if wqs is None else wqs
        self.qc = int(k2c[self.ka_of[0], 0])
        self.qx = to_device(k2c.astype(np.int32))
        rdt = jnp.float64 if cdt == jnp.complex128 else jnp.float32
        self._delta_dev = to_device(self.delta.astype(float), dtype=rdt)
        self.shape = (nk, nocc, self.nvir)
        self.size = nk * nocc * self.nvir

    def matvec(self, x):
        flat = np.asarray(x).ndim == 1
        xd = to_device(np.asarray(x).reshape(self.shape).astype(complex),
                       dtype=self._cdt)
        terms = [_mul(self._delta_dev, xd)]
        if self.singlet:
            terms.append(_coul_piece(self.xo, self.xva,
                                     jit_take(self.wq, self.qc), xd,
                                     self.nk))
        # screened direct term: the TDA exchange piece through W_q(0)
        terms.append(_exch_piece(self.xo, self.xva, self.wqs, self.qx,
                                 xd, self.nk))
        y = _axpy(*terms)
        out = to_host(y)
        return out.ravel() if flat else out

    def dense(self):
        n = self.size
        a = np.empty((n, n), dtype=complex)
        e = np.zeros(n, dtype=complex)
        for j in range(n):
            e[j] = 1.0
            a[:, j] = self.matvec(e)
            e[j] = 0.0
        return a


def bse(mf, df, q=0, nroots=5, singlet=True, qp_energy=None, tol=1e-6,
        max_cycle=200, dense=None, wqs=None):
    """Lowest BSE-TDA excitations at momentum-transfer index q.

    Returns (omega (nroots,), info dict with the operator, eigenvectors,
    and hermiticity diagnostic).  Compose with ``scf.gw.g0w0`` for the
    full GW+BSE recipe:

        qp, _ = gw.g0w0(df, mf)               # (nk, nmo)
        w, info = bse(mf, df, qp_energy=qp)
    """
    op = BSEOperator(mf, df, q=q, singlet=singlet, qp_energy=qp_energy,
                     wqs=wqs)
    if dense is None:
        dense = op.size <= 800
    if dense:
        a = op.dense()
        herm = float(np.abs(a - a.conj().T).max())
        w, x = np.linalg.eigh(0.5 * (a + a.conj().T))
        sel = slice(None, nroots) if nroots else slice(None)
        return w[sel], {"op": op, "nonhermiticity": herm, "dense": True,
                        "x": x[:, sel]}
    w, x, conv = davidson(op.matvec, op.delta.ravel(), op.size,
                          nroots=nroots, tol=tol, max_cycle=max_cycle)
    return w, {"op": op, "converged": conv, "x": x, "dense": False}
