"""G0W0 quasiparticle energies on the ISDF factorization.

Third correlated-method consumer of the (x_k, w_q) artifact (after
scf.mp2 and scf.rpa): the screened interaction lives entirely in the
nip x nip interpolation space,

    Wc_q(iw) = w_q chi_q(iw) (1 - w_q chi_q(iw))^{-1} w_q,
    chi_q(iw) = (1/nk) sum_p g_p(iw) A[:, p] A[:, p]^T,

with the same pair amplitudes ``A_{I,(k,ia)} = conj(xo_k)_Ii xv_{k+q}_Ia``
and ring factor ``g_p = -4 Delta_p / (Delta_p^2 + w^2)`` as scf.rpa (the
RPA determinant gate pins chi's normalization; the supercell-consistency
gate in tests/test_gw.py pins the 1/nk front factor below).  The correlation
self-energy is sampled on the imaginary axis,

    Sigma^c_{n,k}(iw) = -(1/(2 pi nk)) sum_q int_0^inf dw' sum_m
        [B^T Wc_q(iw') conj(B)]_{nm} * 2(iw - e_m) / ((iw - e_m)^2 + w'^2),
    B_{I,m} = conj(x_k c_n)_I (x_{k+q} c_m)_I,   e_m relative to eps_F,

then analytically continued to the real axis with a Thiele/Pade
continued fraction and the QP equation solved by Newton:

    e_QP = e_mf + Re Sigma^c(e_QP - eps_F) + <n| Sigma_x - v_xc^eff |n>.

For a KRHF reference the static correction vanishes identically; for
KRKS (incl. hybrids and +U) it is -(1-hyb)/2 <vk> - <vxc> - <vU>.

The reference has no correlated methods at all (its embedding transform,
``/root/reference/fftisdf.py:230-294``, is dead code); this module plus
scf.rpa/mp2/cc completes the MP2 -> RPA -> CC -> GW ladder on the same
compressed ERI state.  Frequency integration and pair conventions:
ref ``/root/reference/fftisdf.py:125-128`` (the (x, w) contract).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fftisdf_tpu.scf.rpa import _freq_grid
from fftisdf_tpu.utils.device import to_device, to_host, jit_take


# ----------------------------------------------------------------------
# Pade / Thiele analytic continuation (host-side; arrays are tiny)
# ----------------------------------------------------------------------

def pade_thiele(z, f):
    """Continued-fraction coefficients interpolating f(z) at the nodes z.

    Thiele reciprocal-difference recursion; returns (a, z) with a[0] =
    f(z[0]) and the model
        C(x) = a0 / (1 + a1 (x-z0) / (1 + a2 (x-z1) / (1 + ...))).
    """
    z = np.asarray(z, dtype=complex)
    f = np.asarray(f, dtype=complex)
    n = len(z)
    g = np.zeros((n, n), dtype=complex)
    g[0] = f
    for i in range(1, n):
        g[i, i:] = (g[i - 1, i - 1] - g[i - 1, i:]) / (
            (z[i:] - z[i - 1]) * g[i - 1, i:])
    return np.diag(g).copy(), z


def pade_eval(coeffs, x):
    """Evaluate the Thiele continued fraction at (array of) points x."""
    a, z = coeffs
    x = np.asarray(x, dtype=complex)
    n = len(a)
    # backward recurrence: t_n = 1, t_k = 1 + a_{k+1} (x - z_k) / t_{k+1}
    t = np.ones_like(x)
    for k in range(n - 2, -1, -1):
        t = 1.0 + a[k + 1] * (x - z[k]) / t
    return a[0] / t


# ----------------------------------------------------------------------
# nip-space Sigma^c(iw) sampling
# ----------------------------------------------------------------------

@jax.jit
def _sigma_q_contrib(pair_amp, delta, wq, bmat, omega, inv_nk):
    """Per-sector screened matrix elements on the w' quadrature grid.

    pair_amp: (nip, npair); delta: (npair,) > 0; wq: (nip, nip);
    bmat: (nip, nb) pair vectors conj(x_k c_n) * (x_{k+q} c_m).
    Returns (nw, nb) complex: [B^T Wc_q(iw') conj(B)] per frequency.
    """
    eye = jnp.eye(wq.shape[0], dtype=wq.dtype)

    def one_freq(om):
        g = -4.0 * delta / (delta * delta + om * om)
        chi = inv_nk * ((pair_amp * g[None, :].astype(pair_amp.dtype))
                        @ pair_amp.T)
        m = wq @ chi
        wc = m @ jnp.linalg.solve(eye - m, wq)
        return jnp.sum(bmat * (wc @ bmat.conj()), axis=0)

    return jax.lax.map(one_freq, omega)


@jax.jit
def _proj(x, c):
    return x @ c


@jax.jit
def _pair_mat(a, b):
    """(nip, na), (nip, nb) -> (nip, na*nb) pair vectors conj(a)*b."""
    return (a.conj()[:, :, None] * b[:, None, :]).reshape(a.shape[0], -1)


def _mo_blocks(df, mo_c, nocc):
    """MO-projected interpolation vectors per k: full, occ, virt."""
    nk = df.nkpt
    xm, xo, xv = [], [], []
    for k in range(nk):
        x = jit_take(df.x_k, k)
        c = to_device(mo_c[k], dtype=df.x_k.dtype)
        xm.append(_proj(x, c))
        xo.append(xm[-1][:, :nocc])
        xv.append(xm[-1][:, nocc:])
    return xm, xo, xv


def sigma_c_iw(df, mf, orbs=None, nw=40):
    """Sample Sigma^c_{n,k} on the imaginary axis.

    Returns (sigma (nk, nsel, nw) complex, iw_nodes (nw,), efermi, orbs).
    The iw sampling nodes coincide with the w' quadrature nodes (both the
    Gauss-Legendre map of scf.rpa), so oracle comparisons share grids.
    """
    nk = df.nkpt
    mo_c = np.asarray(mf.mo_coeff)
    mo_e = np.asarray(mf.mo_energy)
    mo_o = np.asarray(mf.mo_occ)
    assert mo_c.ndim == 3, "restricted (KRHF/KRKS) reference required"
    nocc = int(round(mo_o[0].sum() / 2))
    nmo = mo_c.shape[-1]
    assert np.allclose(mo_o, mo_o.round()), \
        "fractional occupations (smearing) unsupported in G0W0"
    if orbs is None:
        orbs = list(range(nmo))
    orbs = list(orbs)
    nsel = len(orbs)

    efermi = 0.5 * (mo_e[:, nocc - 1].max() + mo_e[:, nocc:].min())
    k2c = df.kconserv2()
    xm, xo, xv = _mo_blocks(df, mo_c, nocc)

    omega, weight = _freq_grid(nw)
    rdt = jnp.float64 if df.x_k.dtype == jnp.complex128 else jnp.float32
    om_d = jnp.asarray(omega, dtype=rdt)
    inv_nk = jnp.asarray(1.0 / nk, dtype=rdt)

    # frequency-convolution kernel K[j, l, m-at-kp] built per (q, k) below
    iw = omega  # sampling nodes on the imaginary axis

    sigma = np.zeros((nk, nsel, nw), dtype=complex)
    for q in range(nk):
        blocks, deltas = [], []
        partner = np.empty(nk, dtype=int)
        for ki in range(nk):
            ka = int(np.nonzero(k2c[ki] == q)[0][0])
            partner[ki] = ka
            blocks.append(_pair_mat(xo[ki], xv[ka]))
            deltas.append((mo_e[ka][nocc:][None, :]
                           - mo_e[ki][:nocc][:, None]).ravel())
        pair_amp = jnp.concatenate(blocks, axis=1)
        delta = to_device(np.concatenate(deltas), dtype=rdt)

        for k in range(nk):
            kp = int(partner[k])
            csel = to_device(mo_c[k][:, orbs], dtype=df.x_k.dtype)
            xn = _proj(jit_take(df.x_k, k), csel)
            bmat = _pair_mat(xn, xm[kp])
            contrib = np.asarray(to_host(_sigma_q_contrib(
                pair_amp, delta, jit_take(df.wq, q), bmat, om_d, inv_nk)))
            contrib = contrib.reshape(nw, nsel, nmo)
            em = mo_e[kp] - efermi
            # K[j, l, m] = wt_j * 2 (iw_l - e_m) / ((iw_l - e_m)^2 + w'_j^2)
            a = 1j * iw[:, None] - em[None, :]            # (nl, nmo)
            kern = (weight[:, None, None] * 2.0 * a[None, :, :]
                    / (a[None, :, :] ** 2 + omega[:, None, None] ** 2))
            sigma[k] += np.einsum("jnm,jlm->nl", contrib, kern)
    sigma *= -1.0 / (2.0 * np.pi * nk)
    return sigma, iw, efermi, orbs


# ----------------------------------------------------------------------
# static corrections (exchange minus reference xc) and the QP equation
# ----------------------------------------------------------------------

def _static_correction(df, mf, orbs):
    """<n| Sigma_x - v_xc^eff |n> per (k, n); exactly zero for KRHF."""
    mo_c = np.asarray(mf.mo_coeff)
    spec = getattr(mf, "_spec", None)
    if spec is None:
        return np.zeros((len(mo_c), len(orbs)))
    from fftisdf_tpu.scf.hf import _build_dm

    hyb = spec.hyb
    dm = np.asarray(_build_dm(np.asarray(mf.mo_coeff),
                              np.asarray(mf.mo_occ)))
    dm_dev = to_device(dm.astype(np.complex128), dtype=df.x_k.dtype)
    _, vk = df.get_jk(dm_dev, with_j=False, exxdiv=mf.exxdiv)
    vk = np.asarray(to_host(vk))
    _, vxc, _ = mf._xc_eval(mf._dm_device(dm[None]), nspin=1)
    corr_mat = -0.5 * (1.0 - hyb) * vk - vxc[0]
    if getattr(spec, "hyb_sr", 0.0):
        # screened-hybrid reference (HSE06): its Fock carried
        # -0.5*hyb_sr*K_SR, which is part of v_xc^eff, not of Sigma_x
        _, vk_sr = df.get_jk(dm_dev, with_j=False, omega=-spec.omega)
        corr_mat = corr_mat + 0.5 * spec.hyb_sr * np.asarray(to_host(vk_sr))
    if getattr(mf, "_hub_sites", None) is not None:
        _, vu = mf._hubbard_eu_vu(np.stack([dm, dm]) * 0.5)
        corr_mat = corr_mat - vu[0]
    nk = len(mo_c)
    out = np.empty((nk, len(orbs)))
    for k in range(nk):
        c = mo_c[k][:, orbs]
        out[k] = np.einsum("mp,mn,np->p", c.conj(), corr_mat[k], c).real
    return out


def _solve_qp(e_mf, corr, model, efermi, tol=1e-8, maxiter=100):
    """Newton solve of e = e_mf + corr + Re Sigma~(e - eF); returns (e, Z)."""
    e = e_mf
    h = 1e-4
    z_fac = 1.0
    for _ in range(maxiter):
        s0 = pade_eval(model, np.array([e - efermi])).real[0]
        sp = pade_eval(model, np.array([e - efermi + h])).real[0]
        sm = pade_eval(model, np.array([e - efermi - h])).real[0]
        ds = (sp - sm) / (2.0 * h)
        f = e - e_mf - corr - s0
        df_ = 1.0 - ds
        z_fac = 1.0 / max(df_, 1e-2)
        step = f / df_ if abs(df_) > 1e-2 else f
        e_new = e - np.clip(step, -0.5, 0.5)
        if abs(e_new - e) < tol:
            return e_new, min(max(z_fac, 0.0), 1.5)
        e = e_new
    return e, min(max(z_fac, 0.0), 1.5)


def g0w0(df, mf, orbs=None, nw=40, npade=18):
    """G0W0 quasiparticle energies from a converged KRHF/KRKS reference.

    Returns (e_qp (nk, nsel), info) with info carrying 'z' factors,
    'sigma_iw' samples, 'efermi', 'orbs', and the static 'correction'.
    """
    sigma, iw, efermi, orbs = sigma_c_iw(df, mf, orbs=orbs, nw=nw)
    corr = _static_correction(df, mf, orbs)
    mo_e = np.asarray(mf.mo_energy)
    nk, nsel, _ = sigma.shape

    # Pade nodes: spread over the low-frequency 3/4 of the grid where the
    # QP energies live; even count for a balanced continued fraction.
    npade = min(npade, nw) & ~1
    idx = np.unique(np.linspace(0, int(nw * 0.75), npade).astype(int))
    zs = 1j * iw[idx]

    e_qp = np.empty((nk, nsel))
    zfac = np.empty((nk, nsel))
    for k in range(nk):
        for n in range(nsel):
            model = pade_thiele(zs, sigma[k, n, idx])
            e_qp[k, n], zfac[k, n] = _solve_qp(
                mo_e[k][orbs[n]], corr[k, n], model, efermi)
    info = {"z": zfac, "sigma_iw": sigma, "iw": iw, "efermi": efermi,
            "orbs": orbs, "correction": corr, "nw": nw}
    return e_qp, info


# ----------------------------------------------------------------------
# dense oracles (tests): ov-pair-space quadrature and exact pole sum
# ----------------------------------------------------------------------

def sigma_c_ov_space(eri_mo, mo_energy, nocc, nw=40):
    """Gamma-point oracle: Sigma^c(iw) from explicit MO ERIs in the full
    ov pair space, same quadrature/sampling grid as :func:`sigma_c_iw`.

    Returns (sigma (nmo, nw) complex, iw, efermi)."""
    eri = np.asarray(eri_mo)
    nmo = eri.shape[0]
    eps = np.asarray(mo_energy)
    efermi = 0.5 * (eps[nocc - 1] + eps[nocc])
    em = eps - efermi
    no, nv = nocc, nmo - nocc
    nov = no * nv
    v_ov = eri[:no, no:, :no, no:].reshape(nov, nov)
    delta = (eps[no:][None, :] - eps[:no][:, None]).ravel()
    c_pm = eri[:, :, :no, no:].reshape(nmo * nmo, nov)

    omega, weight = _freq_grid(nw)
    sigma = np.zeros((nmo, nw), dtype=complex)
    eye = np.eye(nov)
    for om, wt in zip(omega, weight):
        g = -4.0 * delta / (delta * delta + om * om)
        # g (1 - v g)^{-1} is symmetric (= (g^{-1} - v)^{-1}); with real
        # orbitals C[(n,m)] = C[(m,n)], so (nm|Wc|mn) is the DIAGONAL of
        # M = (C g) (1 - v g)^{-1} C^T over the (n,m) pair index.
        u = np.linalg.solve(eye - v_ov * g[None, :], c_pm.T)   # (nov, pm)
        w_nm = np.einsum("pj,jp->p", c_pm * g[None, :], u)
        w_nm = w_nm.reshape(nmo, nmo)
        a = 1j * omega[:, None] - em[None, :]      # (nl, nmo)
        kern = wt * 2.0 * a / (a ** 2 + om ** 2)   # (nl, nmo)
        sigma += w_nm @ kern.T                     # (nmo, nl)
    return -sigma / (2.0 * np.pi), omega, efermi


def drpa_poles(eri_mo, mo_energy, nocc):
    """Exact dRPA pole decomposition of Sigma^c at the gamma point.

    Diagonalizes C = D^2 + 4 D^{1/2} v D^{1/2} (closed-shell direct RPA)
    and returns (Omega (ns,), resid (nmo, nmo, ns), efermi) such that

        Sigma^c_n(z) = sum_s [ sum_{m<no} resid[n,m,s] / (z - e_m + Om_s)
                             + sum_{m>=no} resid[n,m,s] / (z - e_m - Om_s) ]

    with e relative to efermi — the analytic real-axis oracle that gates
    the Pade continuation itself."""
    eri = np.asarray(eri_mo)
    nmo = eri.shape[0]
    eps = np.asarray(mo_energy)
    efermi = 0.5 * (eps[nocc - 1] + eps[nocc])
    no, nv = nocc, nmo - nocc
    nov = no * nv
    v_ov = eri[:no, no:, :no, no:].reshape(nov, nov)
    delta = (eps[no:][None, :] - eps[:no][:, None]).ravel()
    dhalf = np.sqrt(delta)
    cmat = np.diag(delta ** 2) + 4.0 * (dhalf[:, None] * v_ov
                                        * dhalf[None, :])
    om2, zvec = np.linalg.eigh(cmat)
    omega_s = np.sqrt(np.maximum(om2, 0.0))
    c_pm = eri[:, :, :no, no:].reshape(nmo * nmo, nov)
    r = c_pm @ (dhalf[:, None] * zvec)            # (nmo*nmo, ns)
    r = r.reshape(nmo, nmo, nov)
    resid = 2.0 * r ** 2 / np.maximum(omega_s, 1e-300)[None, None, :]
    return omega_s, resid, efermi


def sigma_c_from_poles(omega_s, resid, efermi, mo_energy, nocc, z):
    """Evaluate the pole-sum oracle at (array of) complex z (rel. eF)."""
    eps = np.asarray(mo_energy) - efermi
    z = np.asarray(z, dtype=complex)
    nmo = len(eps)
    out = np.zeros(z.shape + (nmo,), dtype=complex)
    for m in range(nmo):
        sgn = -1.0 if m < nocc else 1.0
        denom = z[..., None] - eps[m] - sgn * omega_s  # (..., ns)
        out += np.einsum("ns,...s->...n", resid[:, m, :], 1.0 / denom)
    return out
