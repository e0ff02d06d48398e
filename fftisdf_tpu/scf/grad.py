"""Analytic nuclear gradients (forces) for periodic KRHF/KUHF.

A capability far beyond the reference (a numpy/LAPACK/FFTW pipeline cannot
differentiate itself): because every term of the total energy here — Bloch AO
evaluation, the FFT kinetic matrix, the GTH local/nonlocal pseudopotential,
Ewald, and the two-electron energy (exact plane-wave or frozen-point ISDF) —
is a JAX function of the atom positions, the full force vector is ONE
reverse-mode sweep of

    L(R) = (1/nk) sum_k tr(D_k h_k(R)) + E_2e(R; D)
           - (1/nk) sum_k tr(W_k S_k(R)) + E_nn(R) + const,

the standard SCF Lagrangian at the converged density D and energy-weighted
density W_k = sum_i f_{ki} eps_{ki} c_{ki} c_{ki}^H (the -tr(W dS) term is
the Pulay force; the constant restores L(R0) = E_tot for the sanity gate).
Valid at SCF stationarity with frozen occupations (for smeared SCF this is
the Mermin free-energy force).

Two two-electron backends:
- 'pw':   exact plane-wave J/K energy (the oracle path) — use for validation
          and small systems;
- 'isdf': the ISDF approximant at a frozen interpolation-point set
          (isdf.autodiff.isdf_state_fn) — the fast path; exact derivative of
          the approximant, which differs from the exact force by the
          compression error.

Validated against central finite differences of fully re-converged SCF
energies in tests/test_forces.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fftisdf_tpu.lattice import kpoints as kpt_mod
from fftisdf_tpu.isdf.autodiff import make_evaluator_diff, isdf_state_fn
from fftisdf_tpu.linalg.fft import fft3, ifft3
from fftisdf_tpu.scf import integrals
from fftisdf_tpu.basis import data as basis_data


def ewald_fn(cell, eta=None, dtype=jnp.float64):
    """Differentiable ion-ion Ewald energy: positions (natm, 3) -> float.

    Same convention as scf.integrals.ewald (point charges + neutralizing
    background); translation/G lists are frozen at the reference geometry
    (exact for the usual sub-Angstrom displacements of force evaluation).
    Implemented as the fixed-lattice slice of the strain-differentiable
    Ewald (scf.stress.ewald_strain_fn) — one list-construction code path."""
    from fftisdf_tpu.scf.stress import ewald_strain_fn

    e_strain = ewald_strain_fn(cell, dtype=dtype, eta=eta)
    a0 = np.asarray(cell.a)
    a0_j = jnp.asarray(a0, dtype=dtype)
    a0inv_j = jnp.asarray(np.linalg.inv(a0), dtype=dtype)
    frac0_j = jnp.asarray(cell.atom_coords() @ np.linalg.inv(a0),
                          dtype=dtype)

    def energy(positions):
        return e_strain(a0_j, positions @ a0inv_j - frac0_j)

    return energy


def make_energy_fn(cell, kpts, dtype=jnp.float64, two_electron="pw",
                   mask=None, m0=None, solver="ridge", rcond=1e-10,
                   dev_mesh=None, exxdiv=None, max_memory_gb=None,
                   xc=None, hubbard=None):
    """Differentiable total-energy Lagrangian.

    Returns ``energy(positions, dm, wdm) -> float`` with
    dm (nk, nao, nao) [RHF, trace = nelec per k] or (2, nk, nao, nao) [UHF],
    wdm the matching energy-weighted density.  ``two_electron='isdf'``
    additionally needs ``mask``/``m0`` from a prior FFTISDF build.

    ``exxdiv`` must match the Fock the density was converged with: for
    'ewald' the Madelung exchange term -fac*mad/nk sum_k tr(D S D S) is part
    of the functional (its S(R) dependence is a Pulay-sized force
    contribution), and omitting it would evaluate a gradient of the WRONG
    functional at a density that is not stationary for it.

    ``xc`` switches the functional to KS-DFT (scf.ks semantics): exchange
    is scaled by the hybrid fraction (dropped entirely for pure
    functionals) and the grid Exc of the traced AO density is added — its
    position dependence (the xc Pulay force) comes for free from the same
    reverse sweep.  ``hubbard`` adds the Dudarev +U energy with the
    on-site occupations built from the TRACED overlap's S(R)^1/2
    (hubbard.sqrtm_traced — Denman-Beavers, degeneracy-safe autodiff)."""
    if exxdiv not in (None, "ewald"):
        raise NotImplementedError(f"exxdiv={exxdiv!r} gradients")
    spec = None
    if xc is not None and str(xc).strip().lower() != "hf":
        from fftisdf_tpu.scf import xc as xc_mod
        spec = xc_mod.parse_xc(xc)
        _exc_and_vxc = xc_mod.exc_and_vxc
        _exc_mgga = xc_mod.exc_and_vxc_mgga
        _ao_grad = xc_mod.bloch_ao_grad
        _get_tau = xc_mod.get_tau
    hyb = spec.hyb if spec is not None else 1.0
    # screened hybrids (HSE06): the SR exact-exchange term rides the same
    # Lagrangian with the erfc-screened kernel (omega < 0, linalg.coulomb
    # convention); its semilocal SR-wPBE partner is just another spec term
    # inside exc_and_vxc, so the xc Pulay force needs nothing extra
    hyb_sr = float(getattr(spec, "hyb_sr", 0.0)) if spec is not None else 0.0
    omg_sr = -float(spec.omega) if hyb_sr else None
    hub_sites = None
    if hubbard:
        from fftisdf_tpu.scf import hubbard as hub_mod
        hub_sites = hub_mod.build_sites(cell, hubbard)
    kpts = np.asarray(kpts)
    mad = (float(integrals.madelung(cell, kpt_mod.kpts_to_kmesh(cell, kpts)))
           if exxdiv == "ewald" else None)
    nk = len(kpts)
    coords = cell.gen_uniform_grids()
    ngrid = coords.shape[0]
    mesh = tuple(int(m) for m in cell.mesh)
    vol = float(cell.vol)
    w = vol / ngrid
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    fn_ao = make_evaluator_diff(cell, kpts=kpts, dtype=dtype)
    coords_j = jnp.asarray(coords, dtype=dtype)
    gv = cell.get_Gv(mesh)
    gv_j = jnp.asarray(gv, dtype=dtype)
    kpts_j = jnp.asarray(kpts, dtype=dtype)

    # local PSP form factors per atom (fixed); structure phases are traced
    G2 = np.einsum("gi,gi->g", gv, gv)
    vG_atoms = []
    for sym, _ in cell.atom:
        ps = cell._pseudo.get(sym)
        if ps is None:
            zc = basis_data.ATOMIC_NUMBER[basis_data.element_symbol(sym)]
            vG = np.where(G2 > 1e-12,
                          -4.0 * np.pi * zc / np.where(G2 > 1e-12, G2, 1.0),
                          0.0)
        else:
            vG = integrals.gth_vloc_G(ps, G2)
            vG[G2 <= 1e-12] = integrals.gth_vloc_G0(ps)
        vG_atoms.append(vG)
    vG_atoms = jnp.asarray(np.stack(vG_atoms), dtype=dtype)  # (natm, ng)

    # nonlocal GTH projectors: positions-traced evaluator over the projector
    # shells; each projector shell follows its (nearest) atom
    proj_shells, hmat = integrals._projector_shells(cell)
    fn_proj = (make_evaluator_diff(cell, kpts=kpts, dtype=dtype,
                                   shells=proj_shells)
               if proj_shells else None)
    hmat_j = jnp.asarray(hmat, dtype=dtype) if proj_shells else None

    e_nn = ewald_fn(cell, dtype=dtype)

    if two_electron == "isdf":
        assert mask is not None, "isdf backend needs the frozen mask"
        state = isdf_state_fn(cell, kpts, mask, m0=m0, solver=solver,
                              rcond=rcond, dtype=dtype, dev_mesh=dev_mesh,
                              max_memory_gb=max_memory_gb,
                              omegas=(omg_sr,) if hyb_sr else None)
        # phase kept as REAL host parts; the complex array is built inside
        # the trace (complex host constants embedded as jit closures
        # round-trip through the host and fail on the TPU tunnel)
        phase_host = kpt_mod.get_phase(cell, kpts,
                                       kpt_mod.kpts_to_kmesh(cell, kpts))
        phase_re = jnp.asarray(phase_host.real, dtype=dtype)
        phase_im = jnp.asarray(phase_host.imag, dtype=dtype)
    elif two_electron == "pw":
        from fftisdf_tpu.pw import jk as pw_jk
    else:
        raise ValueError(two_electron)

    def hcore_and_ovlp(positions, f_k):
        s = w * jnp.einsum("kgm,kgn->kmn", f_k.conj(), f_k)

        def kin_k(f, kpt):
            t = coords_j @ kpt
            ph = jax.lax.complex(jnp.cos(t), -jnp.sin(t)).astype(f.dtype)
            c = fft3((f * ph[:, None]).T, mesh) / ngrid
            gk = gv_j + kpt[None, :]
            g2k = (0.5 * jnp.sum(gk * gk, axis=1))
            return vol * jnp.einsum("mg,g,ng->mn", c.conj(), g2k, c)

        tmat = jax.vmap(kin_k)(f_k, kpts_j)

        gp = gv_j @ positions.T                              # (ng, natm)
        fr = jnp.einsum("ga,ag->g", jnp.cos(gp), vG_atoms)
        fi = jnp.einsum("ga,ag->g", -jnp.sin(gp), vG_atoms)
        vgrid = ifft3(jax.lax.complex(fr, fi).astype(cdtype),
                      mesh).real * (ngrid / vol)
        vloc = w * jnp.einsum("kgm,g,kgn->kmn", f_k.conj(), vgrid, f_k)

        h = tmat + vloc
        if fn_proj is not None:
            p_k = fn_proj(coords_j, positions)
            bmat = w * jnp.einsum("kgp,kgm->kpm", p_k.conj(), f_k)
            h = h + jnp.einsum("kpm,pq,kqn->kmn", bmat.conj(), hmat_j, bmat)
        return h, s

    def e2_pw(positions, f_k, dm):
        def ek_term(dmat, fac):
            """-fac * [hyb*tr(D K) + hyb_sr*tr(D K_SR)] for one channel."""
            e = 0.0
            if hyb != 0.0:
                vk = pw_jk.get_k_kpts(cell, dmat, f_k, kpts)
                e += -fac * hyb * jnp.sum(jnp.einsum(
                    "kmn,knm->k", dmat, vk)).real / nk
            if hyb_sr != 0.0:
                vk = pw_jk.get_k_kpts(cell, dmat, f_k, kpts, omega=omg_sr)
                e += -fac * hyb_sr * jnp.sum(jnp.einsum(
                    "kmn,knm->k", dmat, vk)).real / nk
            return e

        if dm.ndim == 4:
            dm_tot = dm[0] + dm[1]
            vj = pw_jk.get_j_kpts(cell, dm_tot, f_k)
            ej = 0.5 * jnp.sum(jnp.einsum(
                "kmn,knm->k", dm_tot, vj)).real / nk
            return ej + ek_term(dm[0], 0.5) + ek_term(dm[1], 0.5)
        vj = pw_jk.get_j_kpts(cell, dm, f_k)
        ej = 0.5 * jnp.sum(jnp.einsum("kmn,knm->k", dm, vj)).real / nk
        return ej + ek_term(dm, 0.25)

    def e2_isdf(positions, dm):
        x_k, wq = state(positions)
        wq_sr = None
        if hyb_sr:
            wq, wq_sr = wq[0], wq[1]    # (nker, nk, nip, nip) unpack
        from fftisdf_tpu.isdf import jk as jkm
        phase_j = jax.lax.complex(phase_re, phase_im).astype(cdtype)

        def ek_term(dm_s, fac):
            """dm_s: (nset, nk, nao, nao) spin/set-stacked densities."""
            e = 0.0
            if hyb != 0.0:
                vk = jkm.get_k_kpts(x_k, wq, phase_j, dm_s)
                e += -fac * hyb * jnp.sum(jnp.einsum(
                    "skmn,sknm->sk", dm_s, vk)).real / nk
            if hyb_sr != 0.0:
                vk = jkm.get_k_kpts(x_k, wq_sr, phase_j, dm_s)
                e += -fac * hyb_sr * jnp.sum(jnp.einsum(
                    "skmn,sknm->sk", dm_s, vk)).real / nk
            return e

        if dm.ndim == 4:
            dm_tot = dm[0] + dm[1]
            vj = jkm.get_j_kpts(x_k, wq[0], dm_tot[None])[0]
            ej = 0.5 * jnp.sum(jnp.einsum(
                "kmn,knm->k", dm_tot, vj)).real / nk
            return ej + ek_term(dm, 0.5)
        vj = jkm.get_j_kpts(x_k, wq[0], dm[None])[0]
        ej = 0.5 * jnp.sum(jnp.einsum("kmn,knm->k", dm, vj)).real / nk
        return ej + ek_term(dm[None], 0.25)

    def energy(positions, dm, wdm, w_trace):
        # remat the AO evaluation (chi residuals dominate reverse memory)
        f_k = jax.checkpoint(fn_ao)(coords_j, positions)
        h, s = hcore_and_ovlp(positions, f_k)
        dm_tot = dm[0] + dm[1] if dm.ndim == 4 else dm
        wdm_tot = wdm[0] + wdm[1] if wdm.ndim == 4 else wdm
        e1 = jnp.sum(jnp.einsum("kmn,knm->k", dm_tot, h)).real / nk
        e2 = (e2_isdf(positions, dm) if two_electron == "isdf"
              else e2_pw(positions, f_k, dm))
        if mad is not None and hyb != 0.0:
            # exxdiv='ewald' Madelung exchange: vk += mad * S D S per spin
            # channel => E += -fac*hyb*mad/nk sum tr(D S D S); S(R) traced
            sds = jnp.einsum("kmp,...kpq,kqn->...kmn", s, dm, s)
            fac = -0.5 if dm.ndim == 4 else -0.25
            e2 = e2 + fac * hyb * mad / nk * jnp.sum(
                jnp.einsum("...kmn,...knm->...k", dm, sds)).real
        if spec is not None or hub_sites is not None:
            dm_spin = dm if dm.ndim == 4 else jnp.stack([dm, dm]) * 0.5
        if spec is not None:
            # grid Exc of the traced AO density (xc Pulay force included)
            rho = jnp.einsum("kgm,skmn,kgn->sg", f_k, dm_spin,
                             f_k.conj()).real / nk
            if spec.is_mgga:
                # tau from FFT Bloch-AO gradients of the TRACED AO tensor:
                # the tau channel's Pulay force comes from the same
                # reverse sweep (the FFT and phases are position-free)
                dphi = _ao_grad(f_k, kpts_j, coords_j, gv_j, mesh)
                tau = _get_tau(dphi, dm_spin, nk)
                e2 = e2 + _exc_mgga(rho, tau, gv_j, spec, mesh, w)[0]
            else:
                e2 = e2 + _exc_and_vxc(rho, gv_j, spec, mesh, w)[0]
        if hub_sites is not None:
            from fftisdf_tpu.scf import hubbard as hub_mod
            shalf = hub_mod.sqrtm_traced(s)
            e2 = e2 + hub_mod.eu_and_vu_traced(dm_spin, shalf,
                                               hub_sites)[0]
        pulay = -jnp.sum(jnp.einsum("kmn,knm->k", wdm_tot, s)).real / nk
        return e1 + e2 + pulay + w_trace + e_nn(positions)

    return energy


def energy_weighted_dm(mf):
    """W_k = sum_i f_{ki} eps_{ki} c_{ki} c_{ki}^H from a converged SCF, and
    its trace constant sum_{k,i} f eps / nk (restores L(R0) = e_tot)."""
    def one_spin(es, cs, occs):
        wk, tr = [], 0.0
        for e, c, f in zip(es, cs, occs):
            e = np.asarray(e)
            f = np.asarray(f)
            c = np.asarray(c)
            wk.append(np.einsum("mi,i,ni->mn", c, f * e, c.conj()))
            tr += float(np.sum(f * e))
        return np.asarray(wk), tr

    nk = len(mf.kpts)
    if np.asarray(mf.dm).ndim == 4:  # UHF
        wks, tr = [], 0.0
        for s in range(2):
            wk_s, tr_s = one_spin(mf.mo_energy[s], mf.mo_coeff[s],
                                  mf.mo_occ[s])
            wks.append(wk_s)
            tr += tr_s
        return np.asarray(wks), tr / nk
    wk, tr = one_spin(mf.mo_energy, mf.mo_coeff, mf.mo_occ)
    return wk, tr / nk


def _default_dtype():
    return (jnp.float64 if jax.default_backend() == "cpu"
            and jax.config.jax_enable_x64 else jnp.float32)


def make_grad_fn(cell, kpts, two_electron="pw", df=None, dtype=None,
                 dev_mesh=None, exxdiv=None, max_memory_gb=None,
                 xc=None, hubbard=None):
    """A reusable gradient evaluator: ``fn(mf) -> (grad (natm,3), E)``.

    The value-and-grad jit is traced ONCE for the given lattice/mesh/basis
    and reused across geometries (the frozen image/translation/G lists are
    exact for sub-cell displacements), so repeated-geometry callers —
    relaxation (scf.optimize) and finite-difference Hessians (scf.hessian) —
    pay compilation only on the first call instead of per geometry.  With
    ``two_electron='isdf'`` the interpolation-point mask of ``df`` stays
    frozen across all evaluations (the derivative of one fixed approximant)."""
    from fftisdf_tpu.utils.device import to_device

    if getattr(df, "trunc", None) is not None:
        raise NotImplementedError(
            "gradients with a truncated Coulomb kernel: the traced energy "
            "is the bare-kernel functional")
    if dtype is None:
        dtype = _default_dtype()
    kw = {}
    if two_electron == "isdf":
        assert df is not None and df.mask is not None
        kw = dict(mask=df.mask, m0=df.m0, solver=df.solver, rcond=df.rcond,
                  dev_mesh=dev_mesh, max_memory_gb=max_memory_gb)
    e_fn = make_energy_fn(cell, kpts, dtype=dtype,
                          two_electron=two_electron, exxdiv=exxdiv,
                          xc=xc, hubbard=hubbard, **kw)
    vag = jax.jit(jax.value_and_grad(e_fn))
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    def _norm_xc(v):
        v = None if v is None else str(v).strip().lower()
        return None if v == "hf" else v

    def fn(mf):
        assert getattr(mf, "dm", None) is not None, "run mf.kernel() first"
        if _norm_xc(getattr(mf, "xc", None)) != _norm_xc(xc) or \
                getattr(mf, "hubbard", None) != hubbard:
            raise ValueError(
                f"mf was converged with xc={getattr(mf, 'xc', None)!r}/"
                f"hubbard={getattr(mf, 'hubbard', None)!r} but this "
                f"gradient evaluator traces xc={xc!r}/hubbard={hubbard!r}; "
                "the density is only stationary for the functional it was "
                "converged with")
        mf_ex = getattr(mf, "exxdiv", None)
        if mf_ex != exxdiv:
            raise ValueError(
                f"mf was converged with exxdiv={mf_ex!r} but this gradient "
                f"evaluator was built with exxdiv={exxdiv!r}; pass the "
                "matching exxdiv to make_grad_fn (the density is only "
                "stationary for the functional it was converged with)")
        wdm, w_trace = energy_weighted_dm(mf)
        positions = jnp.asarray(mf.cell.atom_coords(), dtype=dtype)
        dm = to_device(np.asarray(mf.dm).astype(np.complex128), dtype=cdtype)
        wdm = to_device(wdm.astype(np.complex128), dtype=cdtype)
        val, grad = vag(positions, dm, wdm,
                        jnp.asarray(w_trace, dtype=dtype))
        return np.asarray(grad), float(val)  # real transfers: tunnel-safe

    return fn


def kernel(mf, two_electron="pw", df=None, dtype=None, max_memory_gb=None):
    """Nuclear gradient dE/dR (natm, 3) of a converged KRHF/KUHF/KRKS/KUKS.

    Forces are the negative.  ``two_electron='isdf'`` differentiates the
    ISDF approximant of ``df`` (a built FFTISDF) at its frozen interpolation
    points; 'pw' differentiates the exact plane-wave energy.  The whole
    value-and-grad sweep runs under one jit (complex math never dispatches
    eagerly; complex inputs cross the host boundary via utils.device).
    ``mf.exxdiv`` is honored (the 'ewald' Madelung S-term is part of the
    traced Lagrangian), and so are ``mf.xc`` / ``mf.hubbard`` — the traced
    functional is the one the density is stationary for."""
    if getattr(mf, "trunc", None) is not None:
        raise NotImplementedError(
            "gradients with a truncated Coulomb kernel: the traced energy "
            "differentiates the bare-kernel functional, which the trunc "
            "density is not stationary for")
    return make_grad_fn(mf.cell, mf.kpts, two_electron=two_electron, df=df,
                        dtype=dtype, exxdiv=getattr(mf, "exxdiv", None),
                        xc=getattr(mf, "xc", None),
                        hubbard=getattr(mf, "hubbard", None),
                        max_memory_gb=max_memory_gb)(mf)
