"""exxdiv='ewald' through the derivative stack.

The Madelung exchange term -fac*mad/nk sum_k tr(D S D S) is part of the
converged functional when exxdiv='ewald'; its S(R) dependence contributes a
Pulay-sized force and (with mad(A) traced) a stress term.  These gates check
the analytic sweeps against finite differences of fully re-converged
exxdiv='ewald' SCF energies, plus the mismatched-exxdiv guard (round-1
advisor finding: the derivative stack used to silently drop the term).
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import grad as scf_grad
from fftisdf_tpu.scf import stress as scf_stress
from fftisdf_tpu.scf import integrals


def he2_cell(dz=0.0, a_mat=None, box=8.0, mesh=14):
    # decontracted: 2 s functions per He -> 2 occupied + 2 virtual bands,
    # so smearing can populate fractional occupations (the discriminating
    # regime for the exxdiv Madelung force, see the slow tests)
    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.eye(2))]
    a = np.diag([box, box, box]) if a_mat is None else a_mat
    frac = np.array([[0.5, 0.5, 0.35], [0.5, 0.5, 0.65]])
    atoms = [("He", frac[0] @ a),
             ("He", frac[1] @ a + np.array([0.0, 0.0, dz]))]
    return Cell(a=a, atom=atoms, basis={"He": shells}, pseudo=None,
                mesh=np.array([mesh] * 3), unit="bohr",
                precision=1e-12).build()


def scf_he2(dz=0.0, a_mat=None, kmesh=(1, 1, 2), smearing=0.0):
    cell = he2_cell(dz, a_mat)
    mf = KRHF(cell, cell.get_kpts(list(kmesh)), exxdiv="ewald", verbose=0,
              conv_tol=1e-11, smearing=smearing)
    mf.kernel()
    assert mf.converged
    return mf


def test_exxdiv_lagrangian_matches_e_tot():
    """With the Madelung S-term in the traced Lagrangian, its value at the
    reference geometry equals the exxdiv='ewald' SCF total energy."""
    mf = scf_he2()
    g, val = scf_grad.kernel(mf, two_electron="pw")
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)
    sigma, _, sval = scf_stress.kernel(mf)
    np.testing.assert_allclose(sval, mf.e_tot, atol=1e-9)


def test_exxdiv_mismatch_raises():
    """A gradient evaluator built for one exxdiv refuses a mismatched mf
    (the density is not stationary for the other functional)."""
    mf = scf_he2()
    fn = scf_grad.make_grad_fn(mf.cell, mf.kpts, two_electron="pw",
                               exxdiv=None)
    with pytest.raises(ValueError, match="exxdiv"):
        fn(mf)
    sfn = scf_stress.make_cell_grad_fn(mf.cell, mf.kpts, exxdiv=None)
    with pytest.raises(ValueError, match="exxdiv"):
        sfn(mf)


def test_exxdiv_unsupported_raises():
    mf = scf_he2()
    with pytest.raises(NotImplementedError):
        scf_grad.make_energy_fn(mf.cell, mf.kpts, exxdiv="vcut_sph")
    with pytest.raises(NotImplementedError):
        scf_stress.make_cell_energy_fn(mf.cell, mf.kpts, exxdiv="vcut_sph")


def test_madelung_strain_fn_matches_host_constant():
    """mad(A0) reproduces scf.integrals.madelung at zero strain, and its
    strain derivative tracks finite differences of the host constant."""
    import jax
    import jax.numpy as jnp

    cell = he2_cell()
    kmesh = [1, 1, 2]
    mad_fn = scf_stress.madelung_strain_fn(cell, kmesh)
    a0 = np.asarray(cell.a)
    np.testing.assert_allclose(float(mad_fn(jnp.asarray(a0))),
                               integrals.madelung(cell, kmesh), rtol=1e-9)

    def mad_eps(e):
        return mad_fn(jnp.asarray(a0) @ (jnp.eye(3) + e))

    g = jax.grad(lambda e: mad_eps(e))(jnp.zeros((3, 3)))
    h = 1e-5
    for i, j in [(0, 0), (2, 2)]:
        ep = np.zeros((3, 3))
        ep[i, j] = h
        em = -ep

        def host_mad(e):
            lat = type("L", (), {})()
            lat.a = a0 @ (np.eye(3) + e)  # madelung only reads cell.a
            return integrals.madelung(lat, kmesh)

        fd = (host_mad(ep) - host_mad(em)) / (2 * h)
        np.testing.assert_allclose(float(g[i, j]), fd, rtol=1e-5)


@pytest.mark.slow
def test_exxdiv_forces_vs_finite_difference_smeared():
    """Analytic exxdiv='ewald' force vs central FD of the re-converged
    Mermin free energy at a SMEARED (non-idempotent) density — the
    discriminating case (round-1 advisor finding): for an idempotent D,
    tr(D S D S) = 2*nelec is constant and the Madelung force cancels
    exactly against the eigenvalue shift in W, but fractional occupations
    make it a real S(R)-dependent contribution."""
    sig = 0.6  # large sigma: strongly fractional occupations in the He2 gap
    mf0 = scf_he2(smearing=sig)
    assert np.abs(np.asarray(mf0.mo_occ)
                  - np.rint(np.asarray(mf0.mo_occ))).max() > 0.05
    g, _ = scf_grad.kernel(mf0, two_electron="pw")

    h = 2e-3
    es = [scf_he2(dz=s * h, smearing=sig).e_free for s in (+1, -1)]
    fd = (es[0] - es[1]) / (2 * h)
    np.testing.assert_allclose(g[1, 2], fd, atol=1e-6)
    np.testing.assert_allclose(g[0, 2], -g[1, 2], atol=5e-6)

    # and the term is genuinely load-bearing here: dropping it (the old,
    # silently-wrong behavior) must move the force by much more than the gate
    e_fn_wrong = scf_grad.make_energy_fn(mf0.cell, mf0.kpts, exxdiv=None)
    import jax
    import jax.numpy as jnp
    from fftisdf_tpu.scf.grad import energy_weighted_dm

    wdm, w_trace = energy_weighted_dm(mf0)
    g_wrong = jax.grad(e_fn_wrong)(
        jnp.asarray(mf0.cell.atom_coords()),
        jnp.asarray(np.asarray(mf0.dm), dtype=jnp.complex128),
        jnp.asarray(wdm, dtype=jnp.complex128), jnp.asarray(w_trace))
    assert abs(float(g_wrong[1, 2]) - fd) > 20 * abs(float(g[1, 2]) - fd)


@pytest.mark.slow
def test_exxdiv_stress_vs_finite_difference_smeared():
    """Analytic exxdiv='ewald' stress (mad(A) and S(A) both traced) vs
    central FD of the Mermin free energy over strained, re-converged
    lattices, at a smeared density (see the force test for why)."""
    sig = 0.6
    mf0 = scf_he2(smearing=sig)
    a0 = np.asarray(mf0.cell.a)
    _, g, _ = scf_stress.make_cell_grad_fn(
        mf0.cell, mf0.kpts, exxdiv="ewald")(mf0)

    h = 1e-4
    for eps_dir in [np.diag([1.0, 0, 0]), np.diag([0, 0, 1.0])]:
        es = [scf_he2(a_mat=a0 @ (np.eye(3) + s * h * eps_dir),
                      smearing=sig).e_free for s in (+1, -1)]
        fd = (es[0] - es[1]) / (2 * h)
        ana = float(np.sum(0.5 * (g + g.T) * eps_dir))
        np.testing.assert_allclose(ana, fd, atol=1e-6)
