"""SCF gates (no external quantum-chemistry code available as oracle):

- kinetic + overlap matrices vs analytic lattice-summed Gaussian integrals,
- one-electron exactness: for a 1-electron system UHF total energy equals the
  lowest generalized eigenvalue of hcore (J and K cancel identically,
  including all finite-size terms) -- a strong end-to-end test of the
  J/K/SCF machinery,
- Ewald vs the textbook cubic Madelung constant,
- the north-star gate: ISDF-driven SCF energy matches exact-plane-wave-driven
  SCF energy to < 1e-6 Ha/atom at matched compression (BASELINE.md).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.basis.gto import normalized_coeffs
from fftisdf_tpu.scf import integrals, KRHF, KUHF
from fftisdf_tpu.scf.hf import PWDF
from fftisdf_tpu.isdf import FFTISDF


def soft_cell(box=10.0, mesh=20):
    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.array([[0.4], [0.7]]))]
    return Cell(
        a=np.diag([box, box, box]),
        atom=[("He", np.full(3, box / 2)),
              ("He", np.array([box / 2, box / 2, box / 2 + 2.5]))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_kinetic_analytic():
    """T for two contracted s Gaussians vs the analytic formula
    T_ab = mu (3 - 2 mu R^2) exp(-mu R^2) (pi/(a+b))^(3/2), lattice-summed."""
    cell = soft_cell()
    kpts = np.zeros((1, 3))
    ao = eval_ao_kpts(cell, cell.gen_uniform_grids(), kpts)
    t = np.asarray(integrals.get_kinetic(cell, ao, kpts))[0]
    sh = cell._basis["He"][0]
    c = normalized_coeffs(0, sh.exps, sh.coeffs)[:, 0]
    e = np.asarray(sh.exps)
    t_ref = np.zeros((2, 2))
    centers = [np.zeros(3), np.array([0, 0, 2.5])]
    for i in range(2):
        for j in range(2):
            acc = 0.0
            for ix in range(-2, 3):
                for iy in range(-2, 3):
                    for iz in range(-2, 3):
                        R = centers[j] - centers[i] + 10.0 * np.array([ix, iy, iz])
                        r2 = R @ R
                        ee = e[:, None] + e[None, :]
                        mu = e[:, None] * e[None, :] / ee
                        s = (np.pi / ee) ** 1.5 * np.exp(-mu * r2)
                        tk = mu * (3.0 - 2.0 * mu * r2) * s
                        acc += np.einsum("p,q,pq->", c, c, tk) / (4 * np.pi)
            t_ref[i, j] = acc
    np.testing.assert_allclose(t.real, t_ref, atol=1e-7)
    np.testing.assert_allclose(t.imag, 0, atol=1e-10)


def test_ewald_nacl_madelung():
    """Rock-salt Ewald energy reproduces the NaCl Madelung constant 1.747565."""
    a = 2.0
    cell = Cell(
        a=np.eye(3) * (2 * a),
        atom=[("H", np.array(p) * a) for p in
              [(0, 0, 0), (1, 1, 0), (1, 0, 1), (0, 1, 1)]] +
             [("He", np.array(p) * a) for p in
              [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)]],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([4, 4, 4]),
        unit="bohr",
    ).build()
    # charges +1 (H) and -1 (He-as-placeholder): override
    import fftisdf_tpu.scf.integrals as I

    charges = np.array([1.0, 1, 1, 1, -1, -1, -1, -1])
    orig = Cell.atom_charges
    try:
        Cell.atom_charges = lambda self: charges
        e = I.ewald(cell)
    finally:
        Cell.atom_charges = orig
    madelung = -e * a / 4  # 4 ion pairs, nearest-neighbor distance a
    np.testing.assert_allclose(madelung, 1.747564594633, atol=1e-8)


def h_pseudo_cell(box=12.0, mesh=25):
    return Cell(
        a=np.diag([box, box, box]),
        atom=[("H", np.full(3, box / 2))],
        basis={"H": [Shell(l=0,
                           exps=np.array([4.5, 1.5, 0.5, 0.15]),
                           coeffs=np.eye(4))]},
        pseudo="gth-pade",
        spin=1,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_one_electron_uhf_exact():
    """1-electron UHF: E_tot - E_nuc must equal the lowest hcore eigenvalue
    (Hartree and exchange cancel exactly, finite-size terms included)."""
    cell = h_pseudo_cell()
    kpts = np.zeros((1, 3))
    mf = KUHF(cell, kpts, verbose=0, conv_tol=1e-10)
    e = mf.kernel()
    from fftisdf_tpu.scf.hf import _eigh_gen

    e0, _ = _eigh_gen(mf.h1e[0], mf.s1e[0])
    assert mf.converged
    np.testing.assert_allclose(e - mf.e_nuc, e0[0], atol=1e-8)


@pytest.mark.slow
def test_isdf_scf_matches_exact_scf():
    """North star (BASELINE.md): SCF with ISDF J/K vs SCF with exact
    plane-wave J/K, energies within 1e-6 Ha/atom at good compression."""
    cell = soft_cell(box=8.0, mesh=16)
    kpts = cell.get_kpts([1, 1, 2])

    mf0 = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    e0 = mf0.kernel()
    assert mf0.converged

    df = FFTISDF(cell, kpts, c0=40.0, m0=(11, 11, 11), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    mf1 = KRHF(cell, kpts, with_df=df, verbose=0, conv_tol=1e-10)
    e1 = mf1.kernel()
    assert mf1.converged
    assert abs(e1 - e0) / cell.natm < 1e-6, f"{e1} vs {e0}"


def test_krhf_he2_sanity():
    """He2 RHF in a box: converged, energy below hcore-only, reasonable."""
    cell = soft_cell(box=8.0, mesh=16)
    kpts = np.zeros((1, 3))
    mf = KRHF(cell, kpts, verbose=0)
    e = mf.kernel()
    assert mf.converged
    # sanity: electron-electron repulsion positive, total finite
    assert np.isfinite(e)
    # RHF energy should be stationary: rerunning from converged dm changes
    # nothing
    e2 = mf.kernel(dm0=mf.dm)
    np.testing.assert_allclose(e, e2, atol=1e-7)


def test_smeared_occupations_unit():
    """smeared_occupations: exact electron count, mu inside the gap for a
    gapped spectrum, entropy -> 0 in the T->0 limit, both methods."""
    from fftisdf_tpu.scf.hf import smeared_occupations

    rng = np.random.default_rng(3)
    es = [np.sort(np.concatenate([rng.uniform(-2, -1, 5),
                                  rng.uniform(1, 2, 7)]))
          for _ in range(4)]
    for method in ("fermi", "gauss"):
        occs, mu, ent = smeared_occupations(es, nocc=5, sigma=0.01,
                                            method=method, factor=2.0)
        total = sum(o.sum() for o in occs)
        np.testing.assert_allclose(total, 2.0 * 5 * 4, rtol=1e-12)
        assert -1.0 < mu < 1.0          # inside the gap
        assert 0.0 <= ent < 1e-8        # sigma << gap: entropy negligible
        for o, e in zip(occs, es):
            np.testing.assert_allclose(o[:5], 2.0, atol=1e-10)
            np.testing.assert_allclose(o[5:], 0.0, atol=1e-10)
    # metallic spectrum: fractional occupations at the Fermi level
    es_m = [np.linspace(-1, 1, 12) + 0.01 * k for k in range(4)]
    occs, mu, ent = smeared_occupations(es_m, nocc=6, sigma=0.1,
                                        method="fermi", factor=2.0)
    total = sum(o.sum() for o in occs)
    np.testing.assert_allclose(total, 2.0 * 6 * 4, rtol=1e-12)
    assert ent > 0.1
    frac = np.concatenate(occs)
    assert ((frac > 0.05) & (frac < 1.95)).any()


def test_diis_core_unit():
    """scf.core.diis_extrapolate: single-slot identity, exact linear-model
    solution, and conditioning at convergence-scale errors (B ~ 1e-16 must
    still extrapolate, not degrade to slot averaging) — the shared core runs
    identically under numpy (host driver) and traced jax (device driver)."""
    import jax
    import jax.numpy as jnp
    from fftisdf_tpu.scf.core import diis_extrapolate

    rng = np.random.default_rng(7)
    L = 30
    f1 = rng.standard_normal(L) + 1j * rng.standard_normal(L)
    e1 = rng.standard_normal(L) + 1j * rng.standard_normal(L)
    out = diis_extrapolate(e1[None], f1[None], np.ones(1, bool), np)
    np.testing.assert_allclose(out, f1, atol=1e-12)

    # linear model: err(F) affine in F -> the c minimizing |sum c_i err_i|
    # with err2 = -err1 is c = (.5, .5); scale errors down to the SCF
    # convergence regime where B entries are ~1e-16
    for scale in (1.0, 1e-8):
        errs = np.stack([scale * e1, -scale * e1])
        focks = np.stack([f1, 3.0 * f1])
        out = diis_extrapolate(errs, focks, np.ones(2, bool), np)
        np.testing.assert_allclose(out, 2.0 * f1, rtol=1e-6)

    # dead slots (ring buffer warm-up) are ignored, traced == eager
    errs3 = np.stack([e1, 0 * e1, 0 * e1])
    focks3 = np.stack([f1, 9 * f1, 9 * f1])
    valid = np.array([True, False, False])
    out_np = diis_extrapolate(errs3, focks3, valid, np)
    np.testing.assert_allclose(out_np, f1, atol=1e-12)
    out_jx = jax.jit(lambda a, b, v: diis_extrapolate(a, b, v, jnp))(
        errs3, focks3, valid)
    np.testing.assert_allclose(np.asarray(out_jx), out_np, atol=1e-10)


def test_krhf_smearing_insulating_limit():
    """sigma much smaller than the gap: smeared SCF reproduces the
    fixed-occupation SCF energy; free energy == total energy - sigma*S."""
    cell = soft_cell(box=8.0, mesh=16)
    kpts = cell.get_kpts([1, 1, 2])
    mf0 = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    e0 = mf0.kernel()
    mf1 = KRHF(cell, kpts, verbose=0, conv_tol=1e-10, smearing=1e-3)
    e1 = mf1.kernel()
    assert mf0.converged and mf1.converged
    np.testing.assert_allclose(e1, e0, atol=1e-7)
    assert mf1.e_free <= mf1.e_tot + 1e-12
    nelec = sum(o.sum() for o in mf1.mo_occ) / len(kpts)
    np.testing.assert_allclose(nelec, cell.nelectron, rtol=1e-12)


def test_uhf_symmetry_breaking_stretched_h2():
    """Stretched H2: UHF must break spin symmetry (E_UHF < E_RHF, local
    moments ~ +/-1) -- validates the AFM machinery end-to-end."""
    cell = Cell(
        a=np.diag([10.0, 10.0, 14.0]),
        atom=[("H", (5.0, 5.0, 5.0)), ("H", (5.0, 5.0, 9.0))],
        basis={"H": [Shell(l=0, exps=np.array([1.0, 0.35]),
                           coeffs=np.eye(2))]},
        pseudo="gth-pade",
        mesh=np.array([24, 24, 32]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = np.zeros((1, 3))
    mf_r = KRHF(cell, kpts, verbose=0, conv_tol=1e-9)
    e_r = mf_r.kernel()
    mf_u = KUHF(cell, kpts, verbose=0, conv_tol=1e-9,
                init_spin={0: +1.0, 1: -1.0}, spin_bias=0.5, bias_cycles=4)
    e_u = mf_u.kernel()
    assert mf_r.converged and mf_u.converged
    assert e_u < e_r - 1e-3  # symmetry broken solution is lower
    # local moments on the two H atoms are opposite and sizeable
    pop = np.zeros((2, cell.nao_nr()))
    for s in range(2):
        pop[s] = np.real(np.diag(mf_u.dm[s, 0] @ mf_u.s1e[0]))
    m0 = pop[0, :2].sum() - pop[1, :2].sum()
    m1 = pop[0, 2:].sum() - pop[1, 2:].sum()
    assert abs(m0) > 0.8 and abs(m1) > 0.8
    np.testing.assert_allclose(m0, -m1, atol=1e-4)


def test_kchunked_setup_matches_full():
    """The k-chunked s1e/h1e setup (the path that fits production cutoffs
    in HBM — the full-grid AO tensor is 7.9 GB at NiO dzvp ke=200 4x4x4)
    must reproduce the single-shot integrals exactly."""
    from fftisdf_tpu.lattice import structure

    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=40.0)
    kpts = cell.get_kpts([1, 1, 3])
    mf_full = KRHF(cell, kpts, verbose=0)
    # tiny budget -> kchunk=1 (3 chunks incl. the ragged shapes path)
    mf_chunk = KRHF(cell, kpts, verbose=0, setup_chunk_gb=1e-6)
    np.testing.assert_allclose(mf_chunk.s1e, mf_full.s1e, atol=1e-12)
    np.testing.assert_allclose(mf_chunk.h1e, mf_full.h1e, atol=1e-11)


def test_adiis_core_unit():
    """ADIIS simplex solve (scf.core.adiis_coeffs): feasibility, exactness
    on a separable QP with known minimizer, and agreement between the host
    (numpy) and traced (jax) paths."""
    import jax
    import jax.numpy as jnp
    from fftisdf_tpu.scf.core import adiis_coeffs, fori_host

    rng = np.random.default_rng(7)
    m, L = 6, 32
    dms = rng.standard_normal((m, L)) + 1j * rng.standard_normal((m, L))
    focks = rng.standard_normal((m, L)) + 1j * rng.standard_normal((m, L))
    valid = np.ones(m, dtype=bool)
    c = adiis_coeffs(dms, focks, m - 1, valid, np, fori_host)
    assert c.min() >= 0.0 and abs(c.sum() - 1.0) < 1e-10
    # the returned c is a (local) minimizer on the simplex: no single-vertex
    # move improves the quadratic model
    d_ref, f_ref = dms[m - 1], focks[m - 1]
    dd, df = dms - d_ref, focks - f_ref
    a = np.real(np.einsum("il,l->i", dd.conj(), f_ref))
    b = np.real(np.einsum("il,jl->ij", dd.conj(), df))
    f = lambda c: 2 * c @ a + c @ b @ c
    for i in range(m):
        e_i = np.eye(m)[i]
        for t in (1e-4, 1e-2):
            assert f((1 - t) * c + t * e_i) >= f(c) - 1e-9
    # traced path identical
    c_j = jax.jit(lambda d, fo, v: adiis_coeffs(d, fo, m - 1, v, jnp,
                                                jax.lax.fori_loop))(
        jnp.asarray(dms), jnp.asarray(focks), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(c_j), c, atol=1e-8)
    # dead slots stay at zero weight
    valid2 = valid.copy()
    valid2[0] = False
    c2 = adiis_coeffs(dms, focks, m - 1, valid2, np, fori_host)
    assert c2[0] == 0.0 and abs(c2.sum() - 1.0) < 1e-10


def test_adiis_reaches_same_fixed_point():
    """ADIIS-blended and CDIIS-only host SCF converge to the same energy
    (the accelerator changes the path, never the stationary point)."""
    cell = soft_cell()
    kpts = np.zeros((1, 3))
    e1 = KRHF(cell, kpts, verbose=0, conv_tol=1e-10).kernel()
    e0 = KRHF(cell, kpts, verbose=0, conv_tol=1e-10,
              adiis_switch=0.0).kernel()
    np.testing.assert_allclose(e1, e0, atol=1e-9)
