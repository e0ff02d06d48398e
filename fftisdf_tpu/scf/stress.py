"""Analytic stress tensor for periodic KRHF/KUHF by reverse-mode strain.

The lattice is traced through a symmetric strain ``eps``: ``A = a0 @ (1 +
eps)`` with atoms at FIXED fractional coordinates (the standard cell-
gradient convention; internal relaxation is scf.grad's job).  At SCF
stationarity the strain derivative of the frozen-density Lagrangian

    L(eps) = (1/nk) sum_k tr(D_k h_k) + E_2e(D) - (1/nk) sum_k tr(W_k S_k)
             + E_nn + const

is the exact energy derivative (same variational + Pulay argument as the
force, docs/THEORY.md section 8), so

    sigma = (1/vol) dL/deps|_{eps=0},   P = -tr(sigma)/3 .

What makes this cheap on the discretized stack: every oscillatory phase is
a dot product of an integer/fractional pair — r.k = 2pi frac_r.frac_k,
T.k = 2pi int_T.frac_k, G.r = 2pi int_G.frac_r — and is therefore
STRAIN-INVARIANT.  All complex phase tables stay frozen host constants;
only AO values (Gaussians are fixed shapes in Cartesian space), |G|-
dependent kernels (kinetic |G+k|^2, Coulomb 4pi/|q+G|^2, GTH form factors),
volume measures, and the Ewald vector lists trace through ``eps``.  The FFTs
themselves are discrete index transforms and never see the strain.

Two-electron term: exact plane-wave (the oracle path).  An ISDF-backend
strain (frozen interpolation points) is a possible future extension; the
compression error would enter the stress exactly as it enters the force.

The reference has no derivative capability of any kind (numpy/LAPACK
pipelines cannot differentiate themselves); stress is new capability on top
of SURVEY.md section 2.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fftisdf_tpu.basis.eval import (
    build_shell_table, _group_by_center, _group_chi)
from fftisdf_tpu.basis import data as basis_data
from fftisdf_tpu.linalg.fft import fft3, ifft3
from fftisdf_tpu.scf import integrals
from fftisdf_tpu.scf.grad import energy_weighted_dm, _default_dtype


def _strain_evaluator(cell, kpts, dtype, shells=None, frac_pts=None):
    """Returns eval_fn(A, positions) -> f_k (nk, ng, nfunc) with the lattice
    matrix A traced, evaluated at ``frac_pts`` (fractional, in [0,1);
    default: the full FFT grid).  Image lists (membership) and image-phase
    tables are frozen at the reference lattice; both are exact for the
    infinitesimal strains of a derivative evaluation."""
    table = build_shell_table(cell, cell.precision, shells)
    groups = _group_by_center(cell, table, cell.precision)
    atom_xyz = [np.asarray(x) for _, x in cell.atom]
    group_atom = [
        min(range(len(atom_xyz)),
            key=lambda i: np.linalg.norm(atom_xyz[i] - g.center))
        for g in groups
    ]
    a0inv = np.linalg.inv(np.asarray(cell.a))
    kscaled = cell.get_scaled_kpts(np.asarray(kpts))
    frac_grid = (cell.gen_uniform_grids() @ a0inv if frac_pts is None
                 else np.asarray(frac_pts))
    assert np.all(frac_grid > -1e-9) and np.all(frac_grid < 1 + 1e-9)
    frac_grid_j = jnp.asarray(frac_grid, dtype=dtype)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    img_ints = [np.rint(np.asarray(g.images) @ a0inv) for g in groups]
    # T.k phases: strain-invariant host constants (integer x fractional)
    tphs = [jnp.asarray(2.0 * np.pi * ii @ kscaled.T, dtype=dtype)
            for ii in img_ints]
    img_ints_j = [jnp.asarray(ii, dtype=dtype) for ii in img_ints]

    def eval_fn(A, positions):
        coords = frac_grid_j @ A
        blocks = []
        for g, ia, ii, tph in zip(groups, group_atom, img_ints_j, tphs):
            centers = positions[ia][None, :] + ii @ A
            chi_all = _group_chi(coords, g, centers, dtype)
            out_r = jnp.einsum("gTf,Tk->kgf", chi_all, jnp.cos(tph))
            out_i = jnp.einsum("gTf,Tk->kgf", chi_all, jnp.sin(tph))
            blocks.append(jax.lax.complex(out_r, out_i).astype(cdtype))
        # frac_grid lives in [0,1): no wrap translation, no extra phase
        return jnp.concatenate(blocks, axis=-1)

    return eval_fn


def ewald_strain_fn(cell, dtype=jnp.float64, eta=None):
    """Differentiable ion-ion Ewald energy as a function of the lattice
    matrix A and fractional atom displacements dfrac (natm, 3).  eta and
    the translation/G integer lists are frozen at the reference lattice
    (the total is eta-independent; list margins cover the sub-cell moves of
    derivative evaluation and relaxation steps)."""
    charges = np.asarray(cell.atom_charges())
    vol0 = float(cell.vol)
    if eta is None:
        eta = float(np.pi / vol0 ** (2.0 / 3.0))
    a0 = np.asarray(cell.a)
    frac_atoms = np.asarray(cell.atom_coords()) @ np.linalg.inv(a0)

    rcut = np.sqrt(-np.log(1e-14) / eta)
    heights = np.array([
        vol0 / np.linalg.norm(np.cross(a0[(i + 1) % 3], a0[(i + 2) % 3]))
        for i in range(3)
    ])
    nmax = np.ceil(rcut / heights).astype(int) + 1
    rng = [np.arange(-n, n + 1) for n in nmax]
    ints_t = np.stack(np.meshgrid(*rng, indexing="ij"), -1).reshape(-1, 3)
    t0_idx = int(np.argmin(np.einsum("ti,ti->t", ints_t, ints_t)))

    gcut = 2.0 * np.sqrt(eta * -np.log(1e-14))
    bh = 2 * np.pi / np.linalg.norm(a0, axis=1)
    nmax = np.ceil(gcut / bh).astype(int) + 1
    rng = [np.arange(-n, n + 1) for n in nmax]
    ints_g = np.stack(np.meshgrid(*rng, indexing="ij"), -1).reshape(-1, 3)
    ints_g = ints_g[np.einsum("gi,gi->g", ints_g, ints_g) > 0]

    e_self = float(np.sqrt(eta / np.pi) * np.sum(charges ** 2))
    zsum2 = float(np.sum(charges)) ** 2
    z = jnp.asarray(charges, dtype=dtype)
    zz = z[:, None] * z[None, :]
    ints_t_j = jnp.asarray(ints_t, dtype=dtype)
    ints_g_j = jnp.asarray(ints_g, dtype=dtype)
    frac_j = jnp.asarray(frac_atoms, dtype=dtype)
    natm = len(charges)
    diag0 = jnp.eye(natm, dtype=bool)
    # G.r phase angles: strain-invariant (integer x fractional); the
    # traced dfrac displacement adds on top
    gp0 = jnp.asarray(2.0 * np.pi * ints_g @ frac_atoms.T, dtype=dtype)

    def energy(A, dfrac=None):
        if dfrac is None:
            dfrac = jnp.zeros((natm, 3), dtype=dtype)
        gp = gp0 + 2.0 * jnp.pi * ints_g_j @ dfrac.T
        sfr = jnp.cos(gp) @ z
        sfi = jnp.sin(gp) @ z
        sf2 = sfr * sfr + sfi * sfi
        vol = jnp.abs(jnp.linalg.det(A))
        B = 2.0 * jnp.pi * jnp.linalg.inv(A).T
        positions = (frac_j + dfrac) @ A
        ts = ints_t_j @ A
        d = positions[:, None, :] - positions[None, :, :]
        dall = d[None, :, :, :] + ts[:, None, None, :]
        r2 = jnp.sum(dall * dall, axis=-1)
        bad = jnp.zeros(r2.shape, dtype=bool).at[t0_idx].set(diag0)
        rsafe = jnp.sqrt(jnp.where(bad, 1.0, r2))
        e_real = 0.5 * jnp.sum(jnp.where(
            bad, 0.0, zz * jax.scipy.special.erfc(np.sqrt(eta) * rsafe)
            / rsafe))
        gs = ints_g_j @ B
        g2 = jnp.sum(gs * gs, axis=1)
        e_recip = (2.0 * jnp.pi / vol) * jnp.sum(
            jnp.exp(-g2 / (4.0 * eta)) / g2 * sf2)
        e_bg = jnp.pi / (2.0 * eta * vol) * zsum2
        return e_real + e_recip - e_self - e_bg

    return energy


def madelung_strain_fn(cell, kmesh, dtype=jnp.float64):
    """Strain-differentiable Madelung constant: ``mad(A) -> float`` with A
    the traced unit-cell lattice matrix.  Same physics as
    scf.integrals.madelung (probe unit charge + background on the
    kmesh-scaled Born-von-Karman lattice), built on the differentiable
    Ewald machinery so exxdiv='ewald' stress picks up d(mad)/d(eps)."""
    a0 = np.asarray(cell.a)
    km = np.asarray(kmesh, dtype=np.float64)
    a_sc0 = km[:, None] * a0

    class _Probe:
        a = a_sc0
        vol = float(abs(np.linalg.det(a_sc0)))

        @staticmethod
        def atom_charges():
            return np.array([1.0])

        @staticmethod
        def atom_coords():
            return np.zeros((1, 3))

    e_probe = ewald_strain_fn(_Probe, dtype=dtype)
    km_j = jnp.asarray(km, dtype=dtype)

    def mad(A):
        return -2.0 * e_probe(km_j[:, None] * A)

    return mad


def make_cell_energy_fn(cell, kpts, dtype=jnp.float64, two_electron="pw",
                        df=None, exxdiv=None, xc=None, hubbard=None):
    """Differentiable Lagrangian L(eps, dfrac, dm, wdm, w_trace): the
    lattice strained as A = a0 @ (1 + eps) AND atoms displaced by dfrac
    (natm, 3) in fractional coordinates.  One reverse sweep yields the
    stress (d/deps) and the forces (d/ddfrac, related to the Cartesian
    gradient by g_dfrac = A @ g_cart for row-vector conventions) — the
    engine of variable-cell relaxation (scf.optimize.relax_cell).

    ``two_electron='pw'`` (exact plane-wave) or ``'isdf'`` (the fast path):
    the frozen-interpolation-point ISDF approximant of ``df`` (a built
    FFTISDF) re-fitted under the traced deformation — the exact derivative
    of the approximant, mirroring scf.grad's force semantics.

    ``exxdiv`` must match the converged Fock (scf.grad.make_energy_fn
    docstring); under strain BOTH the Madelung constant and S trace.

    ``xc`` / ``hubbard`` switch the traced functional to KS-DFT(+U), same
    semantics as scf.grad.make_energy_fn: exchange scaled by the hybrid
    fraction (the pairwise Poisson exchange loop is skipped entirely for
    pure functionals — the dominant cost), grid Exc with STRAINED
    quadrature weight and G-vectors (the xc stress, incl. the GGA
    gradient-term strain through gv = gidx @ B), and the +U energy via
    the strained overlap's S^1/2."""
    if exxdiv not in (None, "ewald"):
        raise NotImplementedError(f"exxdiv={exxdiv!r} stress")
    spec = None
    if xc is not None and str(xc).strip().lower() != "hf":
        from fftisdf_tpu.scf import xc as xc_mod
        spec = xc_mod.parse_xc(xc)
        _exc_and_vxc = xc_mod.exc_and_vxc
        _exc_mgga = xc_mod.exc_and_vxc_mgga
        _ao_grad = xc_mod.bloch_ao_grad
        _get_tau = xc_mod.get_tau
    hyb = spec.hyb if spec is not None else 1.0
    # screened hybrids (HSE06): the SR exchange is traced with the
    # strain-dependent erfc-screened kernel — the screen factor
    # exp(-|q+G|^2/4w^2) depends on strain through the reciprocal vectors,
    # so it contributes to the stress beyond the bare 4pi/G^2 piece; the
    # finite pi/w^2 value at q+G=0 is strain-independent.  The semilocal
    # SR-wPBE term is an ordinary spec term inside exc_and_vxc.
    hyb_sr = float(getattr(spec, "hyb_sr", 0.0)) if spec is not None else 0.0
    omg_hse = float(spec.omega) if hyb_sr else None
    hub_sites = None
    if hubbard:
        from fftisdf_tpu.scf import hubbard as hub_mod
        hub_sites = hub_mod.build_sites(cell, hubbard)
    kpts = np.asarray(kpts)
    nk = len(kpts)
    mesh = tuple(int(m) for m in cell.mesh)
    ngrid = int(np.prod(mesh))
    a0 = np.asarray(cell.a)
    a0inv = np.linalg.inv(a0)
    a0_j = jnp.asarray(a0, dtype=dtype)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    kscaled = cell.get_scaled_kpts(kpts)
    frac_atoms = np.asarray(cell.atom_coords()) @ a0inv
    frac_atoms_j = jnp.asarray(frac_atoms, dtype=dtype)
    frac_grid = cell.gen_uniform_grids() @ a0inv
    gidx = np.rint(cell.get_Gv(mesh) @ a0.T / (2.0 * np.pi))
    assert np.abs(gidx - cell.get_Gv(mesh) @ a0.T / (2.0 * np.pi)).max() < 1e-6
    gidx_j = jnp.asarray(gidx, dtype=dtype)
    kscaled_j = jnp.asarray(kscaled, dtype=dtype)

    # strain-invariant phase-angle tables (all integer/fractional products)
    tk = jnp.asarray(2.0 * np.pi * frac_grid @ kscaled.T, dtype=dtype)
    ga = jnp.asarray(2.0 * np.pi * gidx @ frac_atoms.T, dtype=dtype)

    fn_ao = _strain_evaluator(cell, kpts, dtype)

    # GTH local form-factor constants per atom (strain enters through G2)
    vloc_params = []
    for sym, _ in cell.atom:
        ps = cell._pseudo.get(sym)
        if ps is None:
            zc = basis_data.ATOMIC_NUMBER[basis_data.element_symbol(sym)]
            vloc_params.append(("coulomb", float(zc), None, None, None))
        else:
            c = np.zeros(4)
            c[: len(ps.cloc)] = ps.cloc
            vloc_params.append(("gth", float(ps.zion), float(ps.rloc), c,
                                float(integrals.gth_vloc_G0(ps))))

    proj_shells, hmat = integrals._projector_shells(cell)
    fn_proj = (_strain_evaluator(cell, kpts, dtype, shells=proj_shells)
               if proj_shells else None)
    hmat_j = jnp.asarray(hmat, dtype=dtype) if proj_shells else None

    e_nn = ewald_strain_fn(cell, dtype=dtype)

    mad_fn = None
    if exxdiv == "ewald":
        from fftisdf_tpu.lattice import kpoints as kpt_mod

        mad_fn = madelung_strain_fn(
            cell, kpt_mod.kpts_to_kmesh(cell, kpts), dtype=dtype)

    if two_electron == "isdf":
        assert df is not None and df.mask is not None
        from fftisdf_tpu.lattice import kpoints as kpt_mod

        m0 = cell.mesh if df.m0 is None else df.m0
        frac_sel = (cell.gen_uniform_grids(m0) @ a0inv)[np.asarray(df.mask)]
        frac_sel = frac_sel - np.floor(frac_sel)
        fn_sel = _strain_evaluator(cell, kpts, dtype, frac_pts=frac_sel)
        kmesh = kpt_mod.kpts_to_kmesh(cell, kpts)
        phase_np = kpt_mod.get_phase(cell, kpts, kmesh)  # strain-invariant
        isdf_solver, isdf_rcond = df.solver, df.rcond
    elif two_electron != "pw":
        raise ValueError(two_electron)

    g2_is_zero = np.einsum("gi,gi->g", gidx, gidx) < 1e-12  # static G=0 mask
    g2_zero_j = jnp.asarray(g2_is_zero)
    # static q+G = 0 masks per k-pair are recomputed on the fly from
    # integer+fractional sums (strain cannot move a zero on/off zero)
    eye3 = jnp.eye(3, dtype=dtype)

    if two_electron == "isdf":
        from fftisdf_tpu.isdf.kpoint import _stripe_quartic, _rhs_block
        from fftisdf_tpu.linalg.solvers import solve_fitting
        from fftisdf_tpu.isdf import jk as jkm

        def e2_isdf(A, B, vol, positions, f_k, dm):
            cdt = f_k.dtype
            phase = jax.lax.complex(
                jnp.asarray(phase_np.real, dtype=dtype),
                jnp.asarray(phase_np.imag, dtype=dtype)).astype(cdt)
            x_k = fn_sel(A, positions)
            x4_k = _stripe_quartic(x_k, phase)
            # remat: see isdf.autodiff — bounds the reverse-sweep memory
            y = jax.checkpoint(_rhs_block)(f_k, x_k, phase)

            def per_q(args):
                x4_q, y_q, fq, tq = args
                z_q, _ = solve_fitting(x4_q, y_q.T, method=isdf_solver,
                                       rcond=isdf_rcond)
                gk = (gidx_j + fq[None, :]) @ B
                absg2 = jnp.sum(gk * gk, axis=1)
                zero = absg2 < 1e-12
                cg = jnp.where(zero, 0.0,
                               4.0 * jnp.pi / jnp.where(zero, 1.0, absg2))
                ph = jax.lax.complex(jnp.cos(tq), jnp.sin(tq)).astype(cdt)
                spec_f = fft3(z_q * ph.conj()[None, :], mesh)

                def w_of(c):
                    zeta = ifft3(spec_f * c, mesh) * ph[None, :] * (
                        vol / ngrid)
                    return zeta @ z_q.conj().T

                if hyb_sr == 0.0:
                    return w_of(cg)
                # erfc-screened SR kernel under strain: 1 - exp(-G^2/4w^2)
                # is traced through absg2(B); the q+G=0 sample pi/w^2 is
                # kernel-finite and strain-independent
                cg_sr = jnp.where(
                    zero, jnp.pi / omg_hse ** 2,
                    cg * -jnp.expm1(-absg2 / (4.0 * omg_hse ** 2)))
                return jnp.stack([w_of(cg), w_of(cg_sr)])

            from fftisdf_tpu.linalg.solvers import FIT_FACTOR_POLICY
            # remat the sector pipeline only below f64 (memory vs the
            # eps/rcond reverse noise of recomputed ill-conditioned solves
            # — see isdf.autodiff.isdf_state_fn)
            pq = (jax.checkpoint(per_q, policy=FIT_FACTOR_POLICY)
                  if dtype != jnp.float64 else per_q)
            wq = jax.lax.map(pq, (x4_k, y, kscaled_j, tk.T))
            wq_sr = None
            if hyb_sr != 0.0:
                wq, wq_sr = wq[:, 0], wq[:, 1]

            def ek_term(dm_s, fac):
                e = 0.0
                if hyb != 0.0:
                    vk = jkm.get_k_kpts(x_k, wq, phase, dm_s)
                    e += -fac * hyb * jnp.sum(jnp.einsum(
                        "skmn,sknm->sk", dm_s, vk)).real / nk
                if hyb_sr != 0.0:
                    vk = jkm.get_k_kpts(x_k, wq_sr, phase, dm_s)
                    e += -fac * hyb_sr * jnp.sum(jnp.einsum(
                        "skmn,sknm->sk", dm_s, vk)).real / nk
                return e

            if dm.ndim == 4:
                dm_t = dm[0] + dm[1]
                vj = jkm.get_j_kpts(x_k, wq[0], dm_t[None])[0]
                ej = 0.5 * jnp.sum(jnp.einsum(
                    "kmn,knm->k", dm_t, vj)).real / nk
                return ej + ek_term(dm, 0.5)
            vj = jkm.get_j_kpts(x_k, wq[0], dm[None])[0]
            ej = 0.5 * jnp.sum(jnp.einsum("kmn,knm->k", dm, vj)).real / nk
            return ej + ek_term(dm[None], 0.25)

    def energy(eps, dfrac, dm, wdm, w_trace):
        A = a0_j @ (eye3 + eps)
        B = 2.0 * jnp.pi * jnp.linalg.inv(A).T
        vol = jnp.abs(jnp.linalg.det(A))
        w = vol / ngrid
        positions = (frac_atoms_j + dfrac) @ A
        ga_t = ga + 2.0 * jnp.pi * gidx_j @ dfrac.T   # traced G.r angles
        # remat the AO evaluation: its chi residuals dominate reverse-mode
        # memory at production grid sizes
        f_k = jax.checkpoint(fn_ao)(A, positions)     # (nk, ng, nao)

        dm_tot = dm[0] + dm[1] if dm.ndim == 4 else dm
        wdm_tot = wdm[0] + wdm[1] if wdm.ndim == 4 else wdm

        # ---- kinetic: (1/nk) sum_k tr(D_k T_k)
        def kin_k(f, tcol, fk, d):
            ph = jax.lax.complex(jnp.cos(tcol), -jnp.sin(tcol)).astype(cdtype)
            c = fft3((f * ph[:, None]).T, mesh) / ngrid
            gk = (gidx_j + fk[None, :]) @ B
            g2k = 0.5 * jnp.sum(gk * gk, axis=1)
            t_mat = vol * jnp.einsum("mg,g,ng->mn", c.conj(), g2k, c)
            return jnp.einsum("mn,nm->", d, t_mat).real

        e_kin = jnp.sum(jax.vmap(kin_k)(f_k, tk.T, kscaled_j,
                                        dm_tot)) / nk

        # ---- local PSP: quadrature of the mesh density against v_loc(eps)
        gv = gidx_j @ B
        G2 = jnp.sum(gv * gv, axis=1)
        G2safe = jnp.where(g2_zero_j, 1.0, G2)
        fr = jnp.zeros(ngrid, dtype=dtype)
        fi = jnp.zeros(ngrid, dtype=dtype)
        for ia, (kind, zc, rloc, cloc, vg0) in enumerate(vloc_params):
            if kind == "coulomb":
                vG = jnp.where(g2_zero_j, 0.0, -4.0 * jnp.pi * zc / G2safe)
            else:
                x2 = G2safe * rloc ** 2
                poly = (cloc[0]
                        + cloc[1] * (3.0 - x2)
                        + cloc[2] * (15.0 - 10.0 * x2 + x2 ** 2)
                        + cloc[3] * (105.0 - 105.0 * x2 + 21.0 * x2 ** 2
                                     - x2 ** 3))
                vG_full = jnp.exp(-0.5 * x2) * (
                    -4.0 * jnp.pi * zc / G2safe
                    + np.sqrt(8.0 * np.pi ** 3) * rloc ** 3 * poly)
                vG = jnp.where(g2_zero_j, vg0, vG_full)
            fr = fr + vG * jnp.cos(ga_t[:, ia])
            fi = fi - vG * jnp.sin(ga_t[:, ia])
        vgrid = ifft3(jax.lax.complex(fr, fi).astype(cdtype),
                      mesh).real * (ngrid / vol)
        n_r = jnp.einsum("kgm,kmn,kgn->g", f_k, dm_tot,
                         f_k.conj()).real / nk
        e_loc = w * jnp.sum(n_r * vgrid)

        # ---- nonlocal PSP
        e_nl = 0.0
        if fn_proj is not None:
            p_k = fn_proj(A, positions)
            bmat = w * jnp.einsum("kgp,kgm->kpm", p_k.conj(), f_k)
            vnl = jnp.einsum("kpm,pq,kqn->kmn", bmat.conj(), hmat_j, bmat)
            e_nl = jnp.sum(jnp.einsum("kmn,knm->k", dm_tot, vnl)).real / nk

        # ---- Pulay: -(1/nk) sum_k tr(W_k S_k)
        s_k = w * jnp.einsum("kgm,kgn->kmn", f_k.conj(), f_k)
        e_pulay = -jnp.sum(jnp.einsum("kmn,knm->k", wdm_tot, s_k)).real / nk

        # ---- exxdiv='ewald': Madelung exchange, mad(A) and S(A) both traced
        e_mad = 0.0
        if mad_fn is not None and hyb != 0.0:
            sds = jnp.einsum("kmp,...kpq,kqn->...kmn", s_k, dm, s_k)
            fac = -0.5 if dm.ndim == 4 else -0.25
            e_mad = fac * hyb * mad_fn(A) / nk * jnp.sum(
                jnp.einsum("...kmn,...knm->...k", dm, sds)).real

        # ---- KS terms: grid Exc with strained weight/G-vectors, +U via
        # the strained overlap's S^1/2 (both Pulay-type stress terms)
        e_xtra = 0.0
        if spec is not None or hub_sites is not None:
            dm_spin = dm if dm.ndim == 4 else jnp.stack([dm, dm]) * 0.5
        if spec is not None:
            rho_s = jnp.einsum("kgm,skmn,kgn->sg", f_k, dm_spin,
                               f_k.conj()).real / nk
            if spec.is_mgga:
                # tau under strain: the k.r phases ride the invariant tk
                # table; strain enters through the AO values, the strained
                # G-vectors of the FFT gradient, and the strained k in the
                # (grad + ik)u term
                dphi = _ao_grad(f_k, kscaled_j @ B, None, gv, mesh,
                                angle=tk)
                tau = _get_tau(dphi, dm_spin, nk)
                e_xtra = e_xtra + _exc_mgga(rho_s, tau, gv, spec, mesh,
                                            w)[0]
            else:
                e_xtra = e_xtra + _exc_and_vxc(rho_s, gv, spec, mesh, w)[0]
        if hub_sites is not None:
            from fftisdf_tpu.scf import hubbard as hub_mod
            e_xtra = e_xtra + hub_mod.eu_and_vu_traced(
                dm_spin, hub_mod.sqrtm_traced(s_k), hub_sites)[0]

        if two_electron == "isdf":
            e_2e = e2_isdf(A, B, vol, positions, f_k, dm)
            return (e_kin + e_loc + e_nl + e_pulay + e_2e + e_mad + e_xtra
                    + w_trace + e_nn(A, dfrac))

        # ---- Hartree: (vol / 2 ngrid^2) sum_G coulG |FFT(n)|^2, G=0 dropped
        nG = fft3(n_r.astype(cdtype), mesh)
        coulG = jnp.where(g2_zero_j, 0.0, 4.0 * jnp.pi / G2safe)
        e_j = (vol / (2.0 * ngrid ** 2)) * jnp.sum(
            coulG * (nG.real ** 2 + nG.imag ** 2))

        # ---- exchange: pairwise Poisson solves, energy-only contraction
        # (omega: erfc-screened SR variant — the screen factor is traced
        # through the strained |q+G|^2, the q+G=0 value pi/omega^2 is
        # finite and strain-independent)
        def ex_pairs(dmat, omega=None):
            def pair_body(idx):
                k1 = idx // nk
                k2 = idx % nk
                ao1 = jax.lax.dynamic_index_in_dim(f_k, k1, 0, False)
                ao2 = jax.lax.dynamic_index_in_dim(f_k, k2, 0, False)
                d1 = jax.lax.dynamic_index_in_dim(dmat, k1, 0, False)
                d2 = jax.lax.dynamic_index_in_dim(dmat, k2, 0, False)
                tq = (jax.lax.dynamic_index_in_dim(tk.T, k2, 0, False)
                      - jax.lax.dynamic_index_in_dim(tk.T, k1, 0, False))
                eiqr = jax.lax.complex(jnp.cos(tq), jnp.sin(tq)).astype(
                    cdtype)
                fq = (jax.lax.dynamic_index_in_dim(kscaled_j, k2, 0, False)
                      - jax.lax.dynamic_index_in_dim(kscaled_j, k1, 0,
                                                     False))
                gk = (gidx_j + fq[None, :]) @ B
                absg2 = jnp.sum(gk * gk, axis=1)
                # q+G = 0 iff the integer+fractional index vector vanishes:
                # strain-independent, safe to recompute inside the trace
                zero = absg2 < 1e-12
                cg = jnp.where(zero, 0.0,
                               4.0 * jnp.pi / jnp.where(zero, 1.0, absg2))
                if omega is not None:
                    cg = jnp.where(
                        zero, jnp.pi / omega ** 2,
                        cg * -jnp.expm1(-absg2 / (4.0 * omega ** 2)))
                rho = (ao1.conj()[:, :, None] * ao2[:, None, :]).reshape(
                    ngrid, -1)
                work = fft3((rho * eiqr.conj()[:, None]).T, mesh) * cg
                v = (ifft3(work, mesh) * eiqr[None, :]).T.reshape(
                    ngrid, ao1.shape[1], ao1.shape[1])
                u = jnp.einsum("ls,gs->gl", d2, ao2.conj())
                return jnp.einsum("gml,gl,gn,nm->", v, u, ao1, d1).real

            return jnp.sum(jax.lax.map(
                pair_body, jnp.arange(nk * nk))) * (w / nk ** 2)

        def ex_all(dmat, fac):
            e = 0.0
            if hyb != 0.0:
                e += -fac * hyb * ex_pairs(dmat)
            if hyb_sr != 0.0:
                e += -fac * hyb_sr * ex_pairs(dmat, omega=omg_hse)
            return e

        if hyb == 0.0 and hyb_sr == 0.0:
            e_k = 0.0         # pure functional: no pairwise Poisson loop
        elif dm.ndim == 4:
            e_k = ex_all(dm[0], 0.5) + ex_all(dm[1], 0.5)
        else:
            e_k = ex_all(dm, 0.25)

        return (e_kin + e_loc + e_nl + e_pulay + e_j + e_k + e_mad + e_xtra
                + w_trace + e_nn(A, dfrac))

    return energy


def make_cell_grad_fn(cell, kpts, dtype=None, two_electron="pw", df=None,
                      exxdiv=None, xc=None, hubbard=None):
    """Reusable evaluator ``fn(mf, eps, dfrac) -> (val, dL/deps, dL/ddfrac)``.

    One value-and-grad jit, traced once at the reference lattice, serves the
    whole variable-cell relaxation trajectory (image/Ewald lists frozen at
    the reference — keep accumulated strains/displacements sub-cell, which a
    trust-radius-capped optimizer does)."""
    from fftisdf_tpu.utils.device import to_device

    if dtype is None:
        dtype = _default_dtype()
    e_fn = make_cell_energy_fn(cell, kpts, dtype=dtype,
                               two_electron=two_electron, df=df,
                               exxdiv=exxdiv, xc=xc, hubbard=hubbard)
    vag = jax.jit(jax.value_and_grad(e_fn, argnums=(0, 1)))
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    def _norm_xc(v):
        v = None if v is None else str(v).strip().lower()
        return None if v == "hf" else v

    def fn(mf, eps=None, dfrac=None):
        assert getattr(mf, "dm", None) is not None, "run mf.kernel() first"
        if _norm_xc(getattr(mf, "xc", None)) != _norm_xc(xc) or \
                getattr(mf, "hubbard", None) != hubbard:
            raise ValueError(
                f"mf was converged with xc={getattr(mf, 'xc', None)!r}/"
                f"hubbard={getattr(mf, 'hubbard', None)!r} but this cell-"
                f"gradient evaluator traces xc={xc!r}/hubbard={hubbard!r}")
        mf_ex = getattr(mf, "exxdiv", None)
        if mf_ex != exxdiv:
            raise ValueError(
                f"mf was converged with exxdiv={mf_ex!r} but this cell-"
                f"gradient evaluator was built with exxdiv={exxdiv!r}; pass "
                "the matching exxdiv to make_cell_grad_fn")
        natm = cell.natm
        eps = np.zeros((3, 3)) if eps is None else np.asarray(eps)
        dfrac = (np.zeros((natm, 3)) if dfrac is None
                 else np.asarray(dfrac))
        wdm, w_trace = energy_weighted_dm(mf)
        dm = to_device(np.asarray(mf.dm).astype(np.complex128), dtype=cdtype)
        wdm_d = to_device(wdm.astype(np.complex128), dtype=cdtype)
        val, (geps, gfrac) = vag(
            jnp.asarray(eps, dtype=dtype), jnp.asarray(dfrac, dtype=dtype),
            dm, wdm_d, jnp.asarray(w_trace, dtype=dtype))
        return float(val), np.asarray(geps), np.asarray(gfrac)

    return fn


def kernel(mf, dtype=None, two_electron="pw", df=None):
    """Stress tensor sigma (3,3) (Ha/bohr^3), pressure (Ha/bohr^3), and the
    Lagrangian value (== e_tot at eps=0, the sanity gate) of a converged
    KRHF/KUHF.  sigma > 0 components mean the cell wants to shrink.
    ``two_electron='isdf'`` differentiates the frozen-point ISDF approximant
    of ``df`` instead of the exact plane-wave energy.  ``mf.xc`` /
    ``mf.hubbard`` are honored (the traced functional is the one the
    density is stationary for)."""
    if getattr(mf, "trunc", None) is not None:
        raise NotImplementedError(
            "stress with a truncated Coulomb kernel (the traced energy is "
            "the bare-kernel functional)")
    val, g, _ = make_cell_grad_fn(mf.cell, mf.kpts, dtype=dtype,
                                  two_electron=two_electron, df=df,
                                  exxdiv=getattr(mf, "exxdiv", None),
                                  xc=getattr(mf, "xc", None),
                                  hubbard=getattr(mf, "hubbard", None))(mf)
    sigma = 0.5 * (g + g.T) / float(mf.cell.vol)
    pressure = -np.trace(sigma) / 3.0
    return sigma, float(pressure), val
