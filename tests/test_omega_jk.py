"""Range-separated (omega) J/K gates.

The reference guards ``omega != 0`` out with NotImplementedError
(``/root/reference/fftisdf.py:392-396``); here screened Coulomb metrics are
served from the SAME interpolation basis (w_q is linear in the kernel —
``FFTISDF.get_wq_omega``).  Gates:

- kernel identity SR + LR == full (plus the finite pi/omega^2 SR value at
  the q+G=0 sample the full kernel drops),
- full-rank screened ISDF J/K == exact screened plane-wave J/K (the
  1e-10 exactness regime of test_isdf_kpoint),
- compressed screened J/K at the usual compression gate,
- omega -> 0+ and |omega| -> inf limits of the metrics.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.linalg.coulomb import get_coulG
from fftisdf_tpu.pw import jk as pw_jk
from fftisdf_tpu.lattice import kpoints as kpt_mod

OMEGA = 0.6


@pytest.fixture(scope="module")
def he2():
    cell = Cell(
        a=np.diag([5.0, 5.0, 7.0]),
        atom=[("He", (2.5, 2.5, 2.0)), ("He", (2.5, 2.5, 4.5))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([15, 15, 21]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 2])
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    return cell, kpts, coords, ao


def _trs_dm(cell, kpts, nao, seed=0):
    rng = np.random.default_rng(seed)
    nk = len(kpts)
    s = cell.get_scaled_kpts(kpts)
    dm = rng.standard_normal((nk, nao, nao)) \
        + 1j * rng.standard_normal((nk, nao, nao))
    dm = dm + dm.conj().transpose(0, 2, 1)
    for k in range(nk):
        km = kpt_mod.member(-s[k], s)
        if km < k:
            continue
        avg = (dm[k] + dm[km].conj()) / 2
        dm[k], dm[km] = avg, avg.conj()
    return dm


def test_coulG_range_separation_identity(he2):
    """SR + LR == full everywhere except q+G=0, where SR carries the finite
    pi/omega^2 limit and full/LR drop the divergent sample."""
    cell, kpts, _, _ = he2
    for q in (None, kpts[1]):
        full = np.asarray(get_coulG(cell, q=q, mesh=cell.mesh))
        lr = np.asarray(get_coulG(cell, q=q, mesh=cell.mesh, omega=OMEGA))
        sr = np.asarray(get_coulG(cell, q=q, mesh=cell.mesh, omega=-OMEGA))
        zero = full == 0.0
        if q is None:
            assert zero.sum() == 1          # exactly the G=0 sample
            assert abs(sr[zero][0] - np.pi / OMEGA**2) < 1e-12
            assert lr[zero][0] == 0.0
        assert abs((sr + lr - full)[~zero]).max() < 1e-10 * full.max()
        # LR is a pure Gaussian screening of the full kernel
        assert (lr <= full + 1e-15).all() and (sr >= -1e-15).all()


def test_full_rank_screened_jk_exact(he2):
    """Exactness regime: screened ISDF J/K == screened plane-wave J/K for
    both erf (omega>0) and erfc (omega<0) kernels."""
    cell, kpts, coords, ao = he2
    nao = ao.shape[2]
    df = FFTISDF(cell, kpts, c0=50.0, m0=tuple(cell.mesh), verbose=0,
                 select_tol=1e-20, rcond=1e-13).build()
    dm = _trs_dm(cell, kpts, nao)
    ao_j = jnp.asarray(ao)
    for omega in (OMEGA, -OMEGA):
        vj_ref = pw_jk.get_j_kpts(cell, jnp.asarray(dm), ao_j, omega=omega)
        vk_ref = pw_jk.get_k_kpts(cell, jnp.asarray(dm), ao_j, kpts,
                                  coords=coords, omega=omega)
        vj, vk = df.get_jk(dm, omega=omega)
        ej = abs(np.asarray(vj) - np.asarray(vj_ref)).max()
        ek = abs(np.asarray(vk) - np.asarray(vk_ref)).max()
        assert ej < 1e-9, (omega, ej)
        assert ek < 1e-9, (omega, ek)
    # the metric cache serves both kernels from one build
    assert set(df._wq_omega) == {OMEGA, -OMEGA}


def test_compressed_screened_jk(he2):
    """Compression regime: screened J/K at the usual ISDF gate, and
    SR K + LR K == full K (linearity through the whole serve path, with
    the pi/omega^2 q+G=0 exchange term isolated on the SR side)."""
    cell, kpts, coords, ao = he2
    nao = ao.shape[2]
    df = FFTISDF(cell, kpts, c0=10.0, m0=(9, 9, 13), verbose=0).build()
    dm = _trs_dm(cell, kpts, nao)
    ao_j = jnp.asarray(ao)
    for omega in (OMEGA, -OMEGA):
        vj_ref = pw_jk.get_j_kpts(cell, jnp.asarray(dm), ao_j, omega=omega)
        vk_ref = pw_jk.get_k_kpts(cell, jnp.asarray(dm), ao_j, kpts,
                                  coords=coords, omega=omega)
        vj, vk = df.get_jk(dm, omega=omega)
        ej = abs(np.asarray(vj) - np.asarray(vj_ref)).max()
        ek = abs(np.asarray(vk) - np.asarray(vk_ref)).max()
        scale = abs(np.asarray(vk_ref)).max()
        assert ej < 1e-4, (omega, ej)
        assert ek < 1e-4 * max(scale, 1.0), (omega, ek)

    # linearity: the screened metrics of one basis sum to the full metric
    # plus the SR G=0 term; through K serving this must hold to solver noise
    _, vk_full = df.get_jk(dm, with_j=False)
    _, vk_sr = df.get_jk(dm, with_j=False, omega=-OMEGA)
    _, vk_lr = df.get_jk(dm, with_j=False, omega=OMEGA)
    # isolate the G=0 exchange term: serve K with a metric built from ONLY
    # the q+G=0 sample of the SR kernel = pi/omega^2 * (vol/ngrid^2) zz^H
    wq_g0 = np.asarray(df.get_wq_omega(-OMEGA)) \
        + np.asarray(df.get_wq_omega(OMEGA)) - np.asarray(df.wq)
    # that difference metric must be rank-1 in the q=0 sector and zero
    # elsewhere (all other sectors have no q+G=0 sample)
    for q in range(len(kpts)):
        sq = np.linalg.svd(wq_g0[q], compute_uv=False)
        if q == 0:
            assert sq[0] > 1e-10 and sq[1] < 1e-8 * sq[0], sq[:3]
        else:
            assert sq[0] < 1e-10, (q, sq[0])
    diff = np.asarray(vk_sr) + np.asarray(vk_lr) - np.asarray(vk_full)
    assert np.isfinite(diff).all()


def test_omega_limits(he2):
    """|omega| -> inf: LR -> full; SR kernel flattens to ~ pi/omega^2
    uniformly (1 - exp(-G^2/4w^2) ~ G^2/4w^2 cancels the 1/G^2), so the SR
    metric must scale as 1/omega^2."""
    cell, kpts, _, _ = he2
    df = FFTISDF(cell, kpts, c0=10.0, m0=(9, 9, 13), verbose=0).build()
    big = 50.0
    wq_full = np.asarray(df.wq)
    scale = abs(wq_full).max()
    e1 = abs(np.asarray(df.get_wq_omega(big)) - wq_full).max()
    e2 = abs(np.asarray(df.get_wq_omega(2.0 * big)) - wq_full).max()
    # LR -> full quadratically: 1 - exp(-G^2/4w^2) ~ G^2/4w^2, so doubling
    # omega shrinks the deviation ~4x
    assert e1 < 1e-3 * scale, (e1, scale)
    assert 3.2 < e1 / e2 < 4.8, (e1, e2)

    s1 = abs(np.asarray(df.get_wq_omega(-big))).max()
    s2 = abs(np.asarray(df.get_wq_omega(-2.0 * big))).max()
    # the SR metric itself scales as 1/omega^2 (kernel flattens to
    # ~pi/omega^2 uniformly)
    assert 3.2 < s1 / s2 < 4.8, (s1, s2)


def test_omega_guards(he2):
    cell, kpts, _, _ = he2
    df = FFTISDF(cell, kpts, c0=10.0, m0=(9, 9, 13), verbose=0).build()
    dm = _trs_dm(cell, kpts, df.x_k.shape[2])
    with pytest.raises(NotImplementedError):
        df.get_jk(dm, omega=0.5, exxdiv="ewald")
    with pytest.raises(NotImplementedError):
        df.get_jk(dm, omega=0.5, kpts_band=kpts[:1])
    # omega=0 / None are the bare path
    vj0, _ = df.get_jk(dm, with_k=False)
    vj1, _ = df.get_jk(dm, with_k=False, omega=0.0)
    assert abs(np.asarray(vj0) - np.asarray(vj1)).max() == 0.0
