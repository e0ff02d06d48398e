"""KCCSD gates (scf.cc).

The load-bearing gate is *term-exact*: a determinant-space oracle
evaluates the CCSD residuals <Phi_ex| e^-T H e^T |Phi_0> literally —
Jordan-Wigner operator matrices on the 2^n Fock space, e^T as a finite
series (T is nilpotent) — at RANDOM complex amplitudes and RANDOM
Hermitian antisymmetrized integrals.  Any wrong term, index order,
k-label, or conjugation in scf.cc.make_step fails it; nothing about it
assumes the equations being tested.

Physical gates:
- CCSD == FCI for a 2-electron system (the CC truncation is exact), with
  FCI diagonalized from the SAME integrals (h consistent with the
  diagonal fock, ERIs from the same ISDF state);
- first iterate from the MP2 guess == scf.mp2.kmp2;
- k-mesh vs doubled-supercell consistency (the framework's k<->supercell
  duality applied to CCSD);
- closed-shell KUHF reduces to the KRHF result (spin-orbital path).
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import cc as cc_mod
from fftisdf_tpu.isdf import FFTISDF


# ----------------------------------------------------------------------
# determinant-space oracle
# ----------------------------------------------------------------------

def _jw_annihilators(n):
    """Jordan-Wigner annihilator matrices c_p on the 2^n Fock space."""
    Z = np.diag([1.0, -1.0])
    a = np.array([[0.0, 1.0], [0.0, 0.0]])   # |0><1|
    eye = np.eye(2)
    ops = []
    for p in range(n):
        m = np.array([[1.0]])
        for q in range(n):
            m = np.kron(m, Z if q < p else (a if q == p else eye))
        ops.append(m)
    return ops


class Oracle:
    """H, |0>, excitation operators, and literal CC residuals from
    (antisymmetrized integrals u, orbital energies e, nocc).  ``fock``
    overrides the diagonal: a full Hermitian one-body matrix."""

    def __init__(self, u, e, nocc, fock=None):
        n = len(e)
        self.n, self.no, self.nv = n, nocc, n - nocc
        c = _jw_annihilators(n)
        cd = [m.T for m in c]
        self.c, self.cd = c, cd
        dim = 2 ** n
        # fock f  =>  h1 = f - sum_i u[p,i,q,i]
        h1 = (np.diag(e).astype(complex) if fock is None
              else np.array(fock, dtype=complex))
        h1 -= np.einsum("piqi->pq", u[:, :nocc, :, :nocc])
        H = np.zeros((dim, dim), dtype=complex)
        for p in range(n):
            for q in range(n):
                if abs(h1[p, q]) > 0:
                    H += h1[p, q] * (cd[p] @ c[q])
        barr = np.array([[c[s] @ c[r] for r in range(n)] for s in range(n)])
        for p in range(n):
            for q in range(n):
                cpq = np.einsum("rs,srxy->xy", u[p, q], barr)
                H += 0.25 * (cd[p] @ cd[q]) @ cpq
        self.H = H
        vac = np.zeros(dim)
        vac[0] = 1.0
        psi0 = vac
        for i in range(nocc):
            psi0 = cd[i] @ psi0
        self.psi0 = psi0
        self.e_ref = np.vdot(psi0, H @ psi0)

    def t_matrix(self, t1, t2):
        n, no = self.n, self.no
        c, cd = self.c, self.cd
        T = np.zeros_like(self.H)
        for i in range(no):
            for a in range(self.nv):
                T += t1[i, a] * (cd[no + a] @ c[i])
        for i in range(no):
            for j in range(no):
                for a in range(self.nv):
                    for b in range(self.nv):
                        T += 0.25 * t2[i, j, a, b] * (
                            cd[no + a] @ cd[no + b] @ c[j] @ c[i])
        return T

    def _exp_apply(self, T, vec):
        out = vec.copy()
        term = vec
        for k in range(1, self.no + 3):
            term = T @ term / k
            out = out + term
            if np.max(np.abs(term)) == 0.0:
                break
        assert np.max(np.abs(T @ term)) < 1e-30   # nilpotency exhausted
        return out

    def residuals(self, t1, t2):
        """R1[i,a], R2[i,j,a,b], E_corr at the given amplitudes."""
        T = self.t_matrix(t1, t2)
        y = self._exp_apply(T, self.psi0)
        w = self._exp_apply(-T, self.H @ y)
        e_corr = np.vdot(self.psi0, self.H @ y) - self.e_ref
        no, nv = self.no, self.nv
        c, cd = self.c, self.cd
        r1 = np.zeros((no, nv), dtype=complex)
        r2 = np.zeros((no, no, nv, nv), dtype=complex)
        for i in range(no):
            for a in range(nv):
                bra = cd[no + a] @ c[i] @ self.psi0
                r1[i, a] = np.vdot(bra, w)
        for i in range(no):
            for j in range(no):
                for a in range(nv):
                    for b in range(nv):
                        bra = (cd[no + a] @ cd[no + b]
                               @ c[j] @ c[i] @ self.psi0)
                        r2[i, j, a, b] = np.vdot(bra, w)
        return r1, r2, e_corr


def test_packed_equations_match_reference():
    """The batched-gather production equations (_equations_packed) vs
    the trace-loop reference implementation (_equations), at nk=2 with
    random amplitudes, a random full Hermitian fock, and integrals
    carrying a random (momentum-conserving-shaped) structure."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    nk, no, nv = 2, 2, 2
    n = no + nv
    # random "U" blocks with the right antisymmetry per block is not
    # needed for an implementation-equivalence test — both codes consume
    # the same arbitrary tensor
    U = (rng.standard_normal((nk, nk, nk, n, n, n, n))
         + 1j * rng.standard_normal((nk, nk, nk, n, n, n, n))) * 0.1
    kp3 = np.empty((nk, nk, nk), dtype=np.int64)
    for a in range(nk):
        for b in range(nk):
            for c in range(nk):
                kp3[a, b, c] = (a + b - c) % nk
    t1 = 0.1 * (rng.standard_normal((nk, no, nv))
                + 1j * rng.standard_normal((nk, no, nv)))
    t2 = {}
    for a in range(nk):
        for b in range(nk):
            for c in range(nk):
                t2[a, b, c] = jnp.asarray(
                    0.1 * (rng.standard_normal((no, no, nv, nv))
                           + 1j * rng.standard_normal((no, no, nv, nv))))
    f = tuple(
        [jnp.asarray(rng.standard_normal(sh)
                     + 1j * rng.standard_normal(sh)) for _ in range(nk)]
        for sh in ((no, no), (no, nv), (nv, no), (nv, nv)))
    args = (jnp.asarray(t1), t2, f, jnp.asarray(U))
    r1_a, r2_a, e_a = cc_mod._equations(nk, no, nv, kp3)(*args)
    r1_b, r2_b, e_b = cc_mod._equations_packed(nk, no, nv, kp3)(*args)
    np.testing.assert_allclose(complex(e_a), complex(e_b), atol=1e-12)
    for k in range(nk):
        np.testing.assert_allclose(np.asarray(r1_a[k]),
                                   np.asarray(r1_b[k]), atol=1e-12)
    for key in r2_a:
        np.testing.assert_allclose(np.asarray(r2_a[key]),
                                   np.asarray(r2_b[key]), atol=1e-12,
                                   err_msg=str(key))


def test_residual_full_fock_matches_oracle():
    """_equations with a full (non-diagonal, Hermitian) one-body matrix —
    the bare-f terms and the conjugated T1 driving f[a,i] — vs the
    literal residuals."""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    no, nv = 2, 3
    n = no + nv
    u = 0.2 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])
    df_ = 0.3 * (rng.standard_normal((n, n))
                 + 1j * rng.standard_normal((n, n)))
    fock = np.diag(e) + df_ + df_.conj().T
    t1, t2 = _random_amps(no, nv, rng)

    oracle = Oracle(u, e, no, fock=fock)
    r1_o, r2_o, e_o = oracle.residuals(t1, t2)

    kp3 = np.zeros((1, 1, 1), dtype=np.int64)
    resid = cc_mod._equations(1, no, nv, kp3)
    f = ([jnp.asarray(fock[:no, :no])], [jnp.asarray(fock[:no, no:])],
         [jnp.asarray(fock[no:, :no])], [jnp.asarray(fock[no:, no:])])
    r1, r2, e_t = resid(jnp.asarray(t1)[None], {(0, 0, 0): jnp.asarray(t2)},
                        f, jnp.asarray(u)[None, None, None])
    # energy: the oracle includes the one-body de-excitation sum f_ia t1
    np.testing.assert_allclose(complex(e_t), e_o, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r1[0]), r1_o, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r2[0, 0, 0]), r2_o, atol=1e-10)


def _oracle_t3(oracle, t1, t2):
    """Literal (T) ingredients: W = <Phi3|H T2|0> (canonical diagonal
    fock, so the F_N and E0 pieces vanish on rank-3), t3d likewise from
    T1, and E(T) = <0|(T1+T2)^dag H T3c|0>."""
    no, nv = oracle.no, oracle.nv
    c, cd = oracle.c, oracle.cd
    t2vec = oracle.H @ (oracle.t_matrix(np.zeros((no, nv)), t2)
                        @ oracle.psi0)
    t1vec = oracle.H @ (oracle.t_matrix(t1, np.zeros((no,) * 2 + (nv,) * 2))
                        @ oracle.psi0)
    e = np.concatenate([np.zeros(0)])
    w = np.zeros((no,) * 3 + (nv,) * 3, dtype=complex)
    d3t3d = np.zeros_like(w)
    bras = {}
    for i in range(no):
        for j in range(no):
            for k in range(no):
                for a in range(nv):
                    for b in range(nv):
                        for cc_ in range(nv):
                            bra = (cd[no + a] @ cd[no + b] @ cd[no + cc_]
                                   @ c[k] @ c[j] @ c[i] @ oracle.psi0)
                            bras[i, j, k, a, b, cc_] = bra
                            w[i, j, k, a, b, cc_] = np.vdot(bra, t2vec)
                            d3t3d[i, j, k, a, b, cc_] = np.vdot(bra, t1vec)
    return w, d3t3d, bras


def test_t3_energy_matches_determinant_oracle():
    """The jitted (T) energy vs the literal <0|(T1+T2)^dag H T3c|0> with
    t3c = <Phi3|H T2|0>/D3, at random amplitudes and integrals."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    no, nv = 3, 3
    n = no + nv
    u = 0.2 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])
    t1, t2 = _random_amps(no, nv, rng)

    oracle = Oracle(u, e, no)
    w_o, _, _ = _oracle_t3(oracle, t1, t2)
    d3 = (e[:no, None, None, None, None, None]
          + e[None, :no, None, None, None, None]
          + e[None, None, :no, None, None, None]
          - e[None, None, None, no:, None, None]
          - e[None, None, None, None, no:, None]
          - e[None, None, None, None, None, no:])
    t3c = w_o / d3
    # T3 operator from t3c; E(T) = <0|(T1+T2)^dag H T3|0>
    T3 = np.zeros_like(oracle.H)
    c, cd = oracle.c, oracle.cd
    for i in range(no):
        for j in range(no):
            for k in range(no):
                for a in range(nv):
                    for b in range(nv):
                        for cc_ in range(nv):
                            T3 += t3c[i, j, k, a, b, cc_] / 36.0 * (
                                cd[no + a] @ cd[no + b] @ cd[no + cc_]
                                @ c[k] @ c[j] @ c[i])
    t3vec = oracle.H @ (T3 @ oracle.psi0)
    amp1 = oracle.t_matrix(t1, np.zeros_like(t2)) @ oracle.psi0
    amp2 = oracle.t_matrix(np.zeros_like(t1), t2) @ oracle.psi0
    e_t_oracle = np.vdot(amp2, t3vec) + np.vdot(amp1, t3vec)

    kp3 = np.zeros((1, 1, 1), dtype=np.int64)
    fn = cc_mod.make_t3_energy(1, no, nv, kp3, e[None, :no], e[None, no:])
    e_t = complex(fn(jnp.asarray(t1)[None], {(0, 0, 0): jnp.asarray(t2)},
                     jnp.asarray(u)[None, None, None]))
    np.testing.assert_allclose(e_t, e_t_oracle, atol=1e-10)


def _expm_nilpotent(T):
    out = np.eye(T.shape[0], dtype=complex)
    term = out
    for k in range(1, 40):
        term = term @ T / k
        out = out + term
        if np.max(np.abs(term)) == 0.0:
            break
    assert np.max(np.abs(term)) == 0.0
    return out


def test_eomee_matches_determinant_oracle():
    """eom_dense (Jacobian route) vs the literal Hbar = e^-T H e^T
    projected on the singles+doubles determinant space: the eigenvalue
    sets must coincide (basis-independent)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    no, nv = 2, 3
    n = no + nv
    u = 0.1 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])

    t1, t2, U, kp3 = _converge_random(no, nv, u, e)
    w_tensor = cc_mod.eom_dense(1, no, nv, kp3, e[None, :no], e[None, no:],
                                t1, t2, U)

    oracle = Oracle(u, e, no)
    T = oracle.t_matrix(np.asarray(t1[0]), np.asarray(t2[0, 0, 0]))
    hbar = _expm_nilpotent(-T) @ oracle.H @ _expm_nilpotent(T)
    c, cd = oracle.c, oracle.cd
    basis = []
    for i in range(no):
        for a in range(nv):
            basis.append(cd[no + a] @ c[i] @ oracle.psi0)
    for i in range(no):
        for j in range(i + 1, no):
            for a in range(nv):
                for b in range(a + 1, nv):
                    basis.append(cd[no + a] @ cd[no + b]
                                 @ c[j] @ c[i] @ oracle.psi0)
    basis = np.stack(basis, axis=1)
    m = basis.conj().T @ hbar @ basis
    e_tot = np.vdot(oracle.psi0, hbar @ oracle.psi0)
    w_oracle = np.sort_complex(np.linalg.eigvals(m) - e_tot)
    assert len(w_tensor) == len(w_oracle)
    np.testing.assert_allclose(w_tensor, w_oracle, atol=1e-9)


def _converge_random(no, nv, u, e, tol=1e-13):
    import jax.numpy as jnp

    kp3 = np.zeros((1, 1, 1), dtype=np.int64)
    step = cc_mod.make_step(1, no, nv, kp3, e[None, :no], e[None, no:])
    U = jnp.asarray(u)[None, None, None]
    d2 = (e[:no, None, None, None] + e[None, :no, None, None]
          - e[None, None, no:, None] - e[None, None, None, no:])
    t1 = jnp.zeros((1, no, nv), jnp.complex128)
    t2 = {(0, 0, 0): jnp.asarray(np.conj(u[:no, :no, no:, no:]) / d2)}
    dt = 1.0
    for _ in range(400):
        t1n, t2n, _ = step(t1, t2, U)
        dt = max(float(np.max(np.abs(np.asarray(t1n) - np.asarray(t1)))),
                 float(np.max(np.abs(np.asarray(t2n[0, 0, 0])
                                     - np.asarray(t2[0, 0, 0])))))
        t1, t2 = t1n, t2n
        if dt < tol:
            break
    assert dt < tol
    return t1, t2, U, kp3


def test_eom_qp_matches_determinant_oracle():
    """EOM-IP/EA via the phantom-orbital Jacobian vs the literal Hbar
    projected on the (N-1)/(N+1) determinant sectors."""
    rng = np.random.default_rng(17)
    no, nv = 2, 3
    n = no + nv
    u = 0.1 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])
    t1, t2, U, kp3 = _converge_random(no, nv, u, e)

    oracle = Oracle(u, e, no)
    T = oracle.t_matrix(np.asarray(t1[0]), np.asarray(t2[0, 0, 0]))
    hbar = _expm_nilpotent(-T) @ oracle.H @ _expm_nilpotent(T)
    e_tot = np.vdot(oracle.psi0, hbar @ oracle.psi0)
    c, cd = oracle.c, oracle.cd

    t2h = {(0, 0, 0): np.asarray(t2[0, 0, 0])}
    for sector in ("ip", "ea"):
        w = cc_mod.eom_qp(1, no, nv, kp3, e[None, :no], e[None, no:],
                          np.asarray(t1), t2h, u[None, None, None],
                          sector)[0]
        basis = []
        if sector == "ip":
            for i in range(no):
                basis.append(c[i] @ oracle.psi0)
            for i in range(no):
                for j in range(i + 1, no):
                    for a in range(nv):
                        basis.append(cd[no + a] @ c[j] @ c[i]
                                     @ oracle.psi0)
        else:
            for a in range(nv):
                basis.append(cd[no + a] @ oracle.psi0)
            for a in range(nv):
                for b in range(a + 1, nv):
                    for i in range(no):
                        basis.append(cd[no + a] @ cd[no + b] @ c[i]
                                     @ oracle.psi0)
        basis = np.stack(basis, axis=1)
        m = basis.conj().T @ hbar @ basis
        w_oracle = np.sort_complex(np.linalg.eigvals(m) - e_tot)
        assert len(w) == len(w_oracle)
        np.testing.assert_allclose(w, w_oracle, atol=1e-9,
                                   err_msg=sector)


def test_onerdm_matches_determinant_oracle():
    """lambda_rdm (adjoint solve + jax.grad Lagrangian density) vs the
    literal <0|(1+Lambda) e^-T p^dag q e^T |0> with Lambda solved
    independently in determinant space."""
    import jax.numpy as jnp

    rng = np.random.default_rng(29)
    no, nv = 2, 3
    n = no + nv
    u = 0.1 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])
    t1, t2, U, kp3 = _converge_random(no, nv, u, e)

    gam, _ = cc_mod.lambda_rdm(1, no, nv, kp3, e[None, :no], e[None, no:],
                               t1, t2, U)
    goo, gov, gvo, gvv = gam
    g_tensor = np.block([[goo[0], gov[0]], [gvo[0], gvv[0]]])

    # determinant-space Lambda: basis-column operators, A lam = -b
    oracle = Oracle(u, e, no)
    labels, bmat = cc_mod._amp_basis(1, no, nv, kp3)
    n1 = no * nv
    ops = []
    for col in bmat.T:
        ops.append(oracle.t_matrix(col[:n1].reshape(no, nv),
                                   col[n1:].reshape(no, no, nv, nv)))
    T = oracle.t_matrix(np.asarray(t1[0]), np.asarray(t2[0, 0, 0]))
    expT, expmT = _expm_nilpotent(T), _expm_nilpotent(-T)
    hbar = expmT @ oracle.H @ expT
    m = len(ops)
    b = np.array([np.vdot(oracle.psi0, hbar @ op @ oracle.psi0)
                  for op in ops])
    A = np.empty((m, m), dtype=complex)
    for nu, opn in enumerate(ops):
        comm = hbar @ opn - opn @ hbar
        for mu, opm in enumerate(ops):
            A[nu, mu] = np.vdot(oracle.psi0, opm.T @ comm @ oracle.psi0)
    lam_o = np.linalg.solve(A, -b)
    lam_mat = sum(lam_o[mu] * ops[mu].T for mu in range(m))
    left = (np.eye(hbar.shape[0]) + lam_mat).conj().T @ oracle.psi0

    g_oracle = np.empty((n, n), dtype=complex)
    for p in range(n):
        for q in range(n):
            v = expmT @ (oracle.cd[p] @ (oracle.c[q]
                                         @ (expT @ oracle.psi0)))
            g_oracle[p, q] = np.vdot(left, v)
    np.testing.assert_allclose(g_tensor, g_oracle, atol=1e-9)
    # trace = particle number, exactly
    np.testing.assert_allclose(np.trace(g_tensor).real, no, atol=1e-9)


@pytest.mark.parametrize("no,nv", [(2, 3), (3, 2)])
def test_rdm2_matches_determinant_oracle(no, nv):
    """lambda_rdm2 (autodiff Lagrangian + analytic driving part) vs the
    literal <(1+Lambda) e^-T p+ q+ s r e^T> with the determinant-space
    Lambda — and the energy rebuilt from (gamma, Gamma).  The (3, 2)
    case has 3 electrons (CCSD inexact), pinning the genuinely
    non-Hermitian parts of the unrelaxed density."""
    rng = np.random.default_rng(37)
    n = no + nv
    u = 0.1 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])
    t1, t2, U, kp3 = _converge_random(no, nv, u, e)

    gam1_blocks, lam = cc_mod.lambda_rdm(
        1, no, nv, kp3, e[None, :no], e[None, no:], t1, t2, U)
    gam2 = cc_mod.lambda_rdm2(1, no, nv, kp3, e[None, :no],
                              e[None, no:], t1, t2, U, lam=lam)[0, 0, 0]

    # oracle Lambda (independent solve) + literal 2-density
    oracle = Oracle(u, e, no)
    labels, bmat = cc_mod._amp_basis(1, no, nv, kp3)
    n1 = no * nv
    ops = [oracle.t_matrix(col[:n1].reshape(no, nv),
                           col[n1:].reshape(no, no, nv, nv))
           for col in bmat.T]
    T = oracle.t_matrix(np.asarray(t1[0]), np.asarray(t2[0, 0, 0]))
    expT, expmT = _expm_nilpotent(T), _expm_nilpotent(-T)
    hbar = expmT @ oracle.H @ expT
    m = len(ops)
    b = np.array([np.vdot(oracle.psi0, hbar @ op @ oracle.psi0)
                  for op in ops])
    A = np.empty((m, m), dtype=complex)
    for nu, opn in enumerate(ops):
        comm = hbar @ opn - opn @ hbar
        for mu, opm in enumerate(ops):
            A[nu, mu] = np.vdot(oracle.psi0, opm.T @ comm @ oracle.psi0)
    lam_o = np.linalg.solve(A, -b)
    lam_mat = sum(lam_o[mu] * ops[mu].T for mu in range(m))
    left = (np.eye(hbar.shape[0]) + lam_mat).conj().T @ oracle.psi0

    c, cd = oracle.c, oracle.cd
    g2_o = np.empty((n,) * 4, dtype=complex)
    base = expT @ oracle.psi0
    for p in range(n):
        for q in range(n):
            for r in range(n):
                for s in range(n):
                    v = cd[p] @ (cd[q] @ (c[s] @ (c[r] @ base)))
                    g2_o[p, q, r, s] = np.vdot(left, expmT @ v)
    np.testing.assert_allclose(gam2, g2_o, atol=1e-9)

    # energy rebuilt from the densities == E_HF-det + E_corr
    goo, gov, gvo, gvv = gam1_blocks
    g1 = np.block([[goo[0], gov[0]], [gvo[0], gvv[0]]])
    h1 = np.diag(e).astype(complex)
    h1 -= np.einsum("piqi->pq", u[:, :no, :, :no])
    e_tot = (np.einsum("pq,pq->", h1, g1)
             + 0.25 * np.einsum("pqrs,pqrs->", u, gam2))
    e_ref = np.vdot(oracle.psi0, oracle.H @ oracle.psi0)
    _, _, e_corr_dev = cc_mod.make_step(
        1, no, nv, kp3, e[None, :no], e[None, no:])(t1, t2, U)
    np.testing.assert_allclose(e_tot, e_ref + complex(e_corr_dev),
                               atol=1e-9)


def _random_u(n, rng):
    """Random antisymmetrized integrals with physical symmetries:
    v[pqrs]=v[qpsr] (exchange), v[pqrs]=conj(v[rspq]) (hermitian);
    u = v - v.transpose(0,1,3,2)."""
    a = rng.standard_normal((n,) * 4) + 1j * rng.standard_normal((n,) * 4)
    a = a + a.transpose(1, 0, 3, 2)
    v = a + a.transpose(2, 3, 0, 1).conj()
    return v - v.transpose(0, 1, 3, 2)


def _random_amps(no, nv, rng):
    t1 = 0.1 * (rng.standard_normal((no, nv))
                + 1j * rng.standard_normal((no, nv)))
    r = 0.1 * (rng.standard_normal((no, no, nv, nv))
               + 1j * rng.standard_normal((no, no, nv, nv)))
    t2 = (r - r.transpose(1, 0, 2, 3)
          - r.transpose(0, 1, 3, 2) + r.transpose(1, 0, 3, 2))
    return t1, t2


def test_step_matches_determinant_oracle():
    """Every tensor term (including conjugation placement) vs the literal
    <Phi_ex| e^-T H e^T |0> residual at random amplitudes/integrals."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    no, nv = 2, 3
    n = no + nv
    u = 0.2 * _random_u(n, rng)
    e = np.concatenate([-1.0 - rng.random(no), 1.0 + rng.random(nv)])
    t1, t2 = _random_amps(no, nv, rng)

    oracle = Oracle(u, e, no)
    r1_o, r2_o, e_o = oracle.residuals(t1, t2)

    kp3 = np.zeros((1, 1, 1), dtype=np.int64)
    step = cc_mod.make_step(1, no, nv, kp3, e[None, :no], e[None, no:])
    t2d = {(0, 0, 0): jnp.asarray(t2)}
    t1n, t2n, e_t = step(jnp.asarray(t1)[None], t2d, jnp.asarray(u)[None, None, None])

    d1 = e[:no, None] - e[None, no:]
    d2 = (e[:no, None, None, None] + e[None, :no, None, None]
          - e[None, None, no:, None] - e[None, None, None, no:])
    r1_t = d1 * (np.asarray(t1n[0]) - t1)
    r2_t = d2 * (np.asarray(t2n[0, 0, 0]) - t2)

    np.testing.assert_allclose(complex(e_t), e_o, atol=1e-10)
    np.testing.assert_allclose(r1_t, r1_o, atol=1e-10)
    np.testing.assert_allclose(r2_t, r2_o, atol=1e-10)


# ----------------------------------------------------------------------
# physical gates
# ----------------------------------------------------------------------

def h2_cell(nz=1, lz=7.0):
    atoms = []
    for i in range(nz):
        atoms += [("H", (3.0, 3.0, 1.8 + lz * i)),
                  ("H", (3.0, 3.0, 3.2 + lz * i))]
    return Cell(
        a=np.diag([6.0, 6.0, lz * nz]),
        atom=atoms,
        basis={"H": [Shell(l=0, exps=np.array([1.2, 0.4]),
                           coeffs=np.eye(2))]},
        pseudo="gth-pade",
        mesh=np.array([14, 14, int(14 * nz * lz / 6) // 2 * 2 + 1]),
        unit="bohr",
        precision=1e-12,
    ).build()


def _df_mf(cell, kpts, m0=(11, 11, 13)):
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=m0, verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    return df, mf


def test_kccsd_two_electron_fci():
    """CCSD is exact for 2 electrons: total correlation == FCI of the
    SAME Hamiltonian (h consistent with the diagonal fock, u from the
    same ISDF integral blocks)."""
    cell = h2_cell()
    kpts = np.zeros((1, 3))
    df, mf = _df_mf(cell, kpts)
    e_cc, info = cc_mod.kccsd(df, mf, conv_tol=1e-10, max_cycle=80)
    assert info["converged"]
    assert abs(info["imag"]) < 1e-9

    U, eo, ev, nocc = cc_mod.make_eris(df, mf)
    u = U[0, 0, 0]
    e = np.concatenate([eo[0], ev[0]])
    oracle = Oracle(u, e, nocc)
    # restrict H to the 2-electron sector and diagonalize
    dim = 2 ** len(e)
    occnum = np.array([bin(s).count("1") for s in range(dim)])
    sec = np.where(occnum == nocc)[0]
    h_sec = oracle.H[np.ix_(sec, sec)]
    e_fci = np.linalg.eigvalsh(h_sec)[0]
    e_corr_fci = e_fci - oracle.e_ref.real
    assert e_cc < 0
    np.testing.assert_allclose(e_cc, e_corr_fci, atol=1e-8)


def test_kccsd_first_iterate_is_mp2():
    """The energy at the MP2 amplitude guess equals scf.mp2.kmp2 (same
    ISDF integrals, so equality to float tolerance)."""
    from fftisdf_tpu.scf.mp2 import kmp2
    import jax.numpy as jnp
    from fftisdf_tpu.utils.device import to_device, to_host

    cell = h2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    df, mf = _df_mf(cell, kpts)
    e_mp2, _ = kmp2(df, mf)

    nk = df.nkpt
    U, eo, ev, nocc = cc_mod.make_eris(df, mf)
    nvir = ev.shape[1]
    k3c = df.kconserv3()
    kp3 = np.empty((nk, nk, nk), dtype=np.int64)
    for a in range(nk):
        for b in range(nk):
            for c in range(nk):
                kp3[a, b, c] = k3c[a, c, b]
    U = U / nk
    step = cc_mod.make_step(nk, nocc, nvir, kp3, eo, ev)
    t1 = jnp.zeros((nk, nocc, nvir), jnp.complex128)
    t2 = {}
    for ki in range(nk):
        for kj in range(nk):
            for ka in range(nk):
                kb = int(kp3[ki, kj, ka])
                d = (eo[ki][:, None, None, None]
                     + eo[kj][None, :, None, None]
                     - ev[ka][None, None, :, None]
                     - ev[kb][None, None, None, :])
                t2[ki, kj, ka] = to_device(
                    np.conj(U[ki, kj, ka, :nocc, :nocc, nocc:, nocc:]) / d)
    _, _, e_dev = step(t1, t2, to_device(U))
    e_first = complex(to_host(e_dev)) / nk
    assert abs(e_first.imag) < 1e-10
    np.testing.assert_allclose(e_first.real, e_mp2, atol=1e-9)


@pytest.mark.slow
def test_kccsd_supercell_consistency():
    """1x1x2 k-mesh CCSD(T)/cell == doubled-supercell gamma CCSD(T) / 2
    (k-blocked amplitudes + complex Bloch integrals vs one real-ish
    gamma problem — the strongest physical k-bookkeeping gate)."""
    cell1 = h2_cell(nz=1)
    df1, mf1 = _df_mf(cell1, cell1.get_kpts([1, 1, 2]))
    e_k, et_k, info_k = cc_mod.kccsd_t(df1, mf1, conv_tol=1e-9,
                                       max_cycle=80)
    assert info_k["converged"]
    assert abs(info_k["imag_t"]) < 1e-9

    cell2 = h2_cell(nz=2)
    df2, mf2 = _df_mf(cell2, np.zeros((1, 3)), m0=(11, 11, 25))
    e_s, et_s, info_s = cc_mod.kccsd_t(df2, mf2, conv_tol=1e-9,
                                       max_cycle=80)
    assert info_s["converged"]
    np.testing.assert_allclose(e_k, e_s / 2, atol=2e-5)
    assert et_s != 0.0              # 4 electrons: triples contribute
    np.testing.assert_allclose(et_k, et_s / 2, atol=2e-5)


@pytest.mark.slow
def test_eomee_supercell_subset():
    """q=0 EOM-EE energies of the 1x1x2 k-mesh are a subset of the
    doubled-supercell gamma spectrum (which contains every momentum
    sector)."""
    cell1 = h2_cell(nz=1)
    df1, mf1 = _df_mf(cell1, cell1.get_kpts([1, 1, 2]))
    w_k, info_k = cc_mod.eomee(df1, mf1, conv_tol=1e-9)

    cell2 = h2_cell(nz=2)
    df2, mf2 = _df_mf(cell2, np.zeros((1, 3)), m0=(11, 11, 25))
    w_s, info_s = cc_mod.eomee(df2, mf2, conv_tol=1e-9)

    # physical spectra: imaginary parts at numerical noise
    assert np.max(np.abs(w_k.imag)) < 1e-6
    assert np.min(w_k.real) > 0            # excitations above the GS
    # tolerance: the two sides run *independent* ISDF fits (primitive
    # cell vs doubled supercell), so eigenvalues agree to the
    # compression/fit floor (~5e-5 here), not to solver precision
    for w in w_k:
        assert np.min(np.abs(w_s - w)) < 1e-4


def test_eomee_davidson_matches_dense():
    """Matrix-free Davidson (jax.jvp matvecs) vs dense Jacobian
    eigenvalues — lowest roots must coincide."""
    cell = h2_cell()
    df, mf = _df_mf(cell, np.zeros((1, 3)))
    w_dense, _ = cc_mod.eomee(df, mf, conv_tol=1e-10)
    w_dav, info = cc_mod.eomee_davidson(df, mf, nroots=4,
                                        conv_tol=1e-10, tol=1e-8)
    assert info["eom_converged"]
    np.testing.assert_allclose(w_dav, w_dense[:4], atol=1e-6)


@pytest.mark.slow
def test_eomip_supercell_subset_and_koopmans():
    """k-resolved EOM-IP of the 1x1x2 mesh: every eigenvalue appears in
    the doubled-supercell gamma IP spectrum, and the lowest binding
    energy sits near the Koopmans value (weakly correlated H2)."""
    cell1 = h2_cell(nz=1)
    df1, mf1 = _df_mf(cell1, cell1.get_kpts([1, 1, 2]))
    w_k, info_k = cc_mod.eomip(df1, mf1, conv_tol=1e-9)

    cell2 = h2_cell(nz=2)
    df2, mf2 = _df_mf(cell2, np.zeros((1, 3)), m0=(11, 11, 25))
    w_s, info_s = cc_mod.eomip(df2, mf2, conv_tol=1e-9)

    all_k = np.concatenate([w_k[k] for k in w_k])
    assert np.max(np.abs(all_k.imag)) < 1e-6
    for w in all_k:
        assert np.min(np.abs(w_s[0] - w)) < 1e-4
    # Koopmans: lowest IP ~ -e_HOMO (correlation shifts it mildly)
    e_homo = max(float(np.asarray(mf1.mo_energy)[k][0])
                 for k in range(2))
    ip_min = np.min(all_k.real)
    assert abs(ip_min - (-e_homo)) < 0.1
    assert ip_min > 0


def test_onerdm_physical_h2():
    """CCSD density of periodic H2 at 1x1x2: exact particle number,
    physical natural occupations, near-Hermitian at weak correlation."""
    cell = h2_cell()
    df, mf = _df_mf(cell, cell.get_kpts([1, 1, 2]))
    gam, info = cc_mod.onerdm(df, mf, conv_tol=1e-9)
    goo, gov, gvo, gvv = gam
    np.testing.assert_allclose(info["trace"], 2 * 2, atol=1e-8)
    for k in range(2):
        g = np.block([[goo[k], gov[k]], [gvo[k], gvv[k]]])
        gs = 0.5 * (g + g.conj().T)
        occ = np.linalg.eigvalsh(gs)
        assert occ.min() > -1e-6 and occ.max() < 1 + 1e-6
        assert occ.max() > 0.95            # weakly correlated
        # unrelaxed density: non-hermiticity is O(t^2), small here
        assert np.max(np.abs(g - g.conj().T)) < 0.05


def test_cc_ao_density_observables():
    """AO-basis CCSD density: exact electron count through the overlap
    metric, and populations runnable through scf.analysis."""
    from fftisdf_tpu.scf import analysis

    cell = h2_cell()
    df, mf = _df_mf(cell, cell.get_kpts([1, 1, 2]))
    dm, info = cc_mod.ao_density(df, mf, conv_tol=1e-9)
    nk = 2
    nelec = np.einsum("skmn,knm->", dm, np.asarray(mf.s1e)).real / nk
    np.testing.assert_allclose(nelec, 2.0, atol=1e-8)
    pops = analysis.ao_populations(cell, dm, mf.s1e, scheme="loewdin")
    np.testing.assert_allclose(pops.sum(), 2.0, atol=1e-7)
    # closed shell: spin channels identical
    np.testing.assert_allclose(dm[0], dm[1], atol=1e-9)


def test_kccsd_spin_polarized_matches_kump2_first_iterate():
    """Open-shell (triplet H2) KUHF reference through the spin-orbital
    path: runs with distinct alpha/beta occupations, converges, and the
    CCSD energy at the MP2 guess equals scf.mp2.kump2."""
    from fftisdf_tpu.scf import KUHF
    from fftisdf_tpu.scf.mp2 import kump2

    cell = h2_cell().copy(spin=2).build()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KUHF(cell, kpts, verbose=0, conv_tol=1e-9, max_cycle=80)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    e_ump2, _ = kump2(df, mf)

    # first iterate == UMP2 (same integrals)
    import jax.numpy as jnp
    from fftisdf_tpu.utils.device import to_device, to_host

    nk = df.nkpt
    U, eo, ev, nocc = cc_mod.make_eris(df, mf)
    k3c = df.kconserv3()
    kp3 = np.empty((nk, nk, nk), dtype=np.int64)
    for a in range(nk):
        for b in range(nk):
            for c in range(nk):
                kp3[a, b, c] = k3c[a, c, b]
    U = U / nk
    step = cc_mod.make_step(nk, nocc, ev.shape[1], kp3, eo, ev)
    t1 = jnp.zeros((nk, nocc, ev.shape[1]), jnp.complex128)
    t2 = {}
    for ki in range(nk):
        for kj in range(nk):
            for ka in range(nk):
                kb = int(kp3[ki, kj, ka])
                d = (eo[ki][:, None, None, None]
                     + eo[kj][None, :, None, None]
                     - ev[ka][None, None, :, None]
                     - ev[kb][None, None, None, :])
                t2[ki, kj, ka] = to_device(
                    np.conj(U[ki, kj, ka, :nocc, :nocc, nocc:, nocc:]) / d)
    _, _, e_dev = step(t1, t2, to_device(U))
    e_first = complex(to_host(e_dev)) / nk
    np.testing.assert_allclose(e_first.real, e_ump2, atol=1e-9)

    # and the full solve converges below UMP2
    e_cc, info = cc_mod.kccsd(df, mf, conv_tol=1e-8, max_cycle=80)
    assert info["converged"]
    assert e_cc < 0


def test_kccsd_ks_reference_invariance():
    """CCSD with singles is exact for 2 electrons from ANY reference:
    E_det(reference determinant, HF functional) + E_corr must be
    identical for the KRHF and KRKS-PBE references (= FCI).  Exercises
    the full-fock (non-canonical) equations end to end."""
    from fftisdf_tpu.scf import KRKS

    cell = h2_cell()
    kpts = np.zeros((1, 3))
    df, mf_hf = _df_mf(cell, kpts)
    e_hf_corr, info_hf = cc_mod.kccsd(df, mf_hf, conv_tol=1e-10,
                                      max_cycle=100)
    assert info_hf["converged"] and info_hf["reference"] == "canonical"
    e_total_hf = mf_hf.e_tot + e_hf_corr

    ks = KRKS(cell, kpts, xc="pbe", verbose=0, conv_tol=1e-10)
    ks.kernel()
    assert ks.converged
    e_ks_corr, info_ks = cc_mod.kccsd(df, ks, conv_tol=1e-10,
                                      max_cycle=120)
    assert info_ks["converged"] and info_ks["reference"] == "fock"
    # HF energy functional at the KS determinant
    fock, vj, vk = mf_hf.get_fock(ks.dm)
    e_det = mf_hf.energy_elec(np.asarray(ks.dm), vj, vk) + mf_hf.e_nuc
    assert e_det > e_total_hf            # variational: above FCI
    np.testing.assert_allclose(e_det + e_ks_corr, e_total_hf, atol=3e-6)


def test_kccsd_t_two_electron_guard():
    """(T) vanishes identically for a 2-electron system (cannot excite
    three); the guard path returns 0 without building triples."""
    cell = h2_cell()
    df, mf = _df_mf(cell, np.zeros((1, 3)))
    e_cc, e_t, info = cc_mod.kccsd_t(df, mf, conv_tol=1e-9)
    assert info["converged"]
    assert e_t == 0.0


def test_kccsd_uhf_closed_shell_reduction():
    """Closed-shell KUHF reference gives the KRHF CCSD energy through the
    same spin-orbital path."""
    from fftisdf_tpu.scf import KUHF

    cell = h2_cell()
    kpts = np.zeros((1, 3))
    df, mf = _df_mf(cell, kpts)
    e_r, _ = cc_mod.kccsd(df, mf, conv_tol=1e-9, max_cycle=80)

    umf = KUHF(cell, kpts, verbose=0, conv_tol=1e-10)
    umf.kernel()
    assert umf.converged
    e_u, info = cc_mod.kccsd(df, umf, conv_tol=1e-9, max_cycle=80)
    assert info["converged"]
    np.testing.assert_allclose(e_u, e_r, atol=1e-8)
