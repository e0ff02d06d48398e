"""J/K at arbitrary band k-points served from the ISDF product state.

The reference guards ``kpts_band != kpts`` out with NotImplementedError
(``/root/reference/fftisdf.py:194``); round-1 served bands from the exact
plane-wave path instead.  This module closes the gap from the ISDF side
(round-2 verdict item #7): band J/K come from the product object
``(x_k, w0)`` plus a per-pair re-fit, so ``get_bands`` needs no exact-PW
sweep.

Math (same LS-ISDF ansatz as the build, specialized to one (band b, mesh
k2) pair): approximate the pair density

    rho^{b,k2}_{mn}(r) = conj(phi_{b,m}(r)) phi_{k2,n}(r)
                      ~= sum_I xi_I(r) conj(x_{b,I,m}) x_{k2,I,n}

by least squares over the frozen interpolation points.  The normal matrix
and RHS factor elementwise (Hadamard) over the interpolation index:

    A      = (x_b x_b^H) (.) conj(x_{k2} x_{k2}^H)         (nip, nip)
    B[g,I] = fx_b[g,I] * conj(fx_{k2}[g,I]),  fx_k = conj(f_k) x_k^T

(A is PSD by the Schur product theorem), and the pair metric
``w^{b,k2} = S (B^T K_{q'} B^*) S`` goes through the same metric-side
split-operator assembly as the build (isdf.kpoint._sector_wq) with the
off-mesh momentum q' = k2 - b in the Coulomb kernel.  Exchange then is

    vk[b] = (1/nk) sum_{k2} x_b^H (w^{b,k2} (.) rho_{k2}) x_b,
    rho_{k2} = x_{k2} D_{k2} x_{k2}^H,

Hartree needs the same treatment: the mesh q=0 fitting functions do NOT
span band diagonal-pair densities (measured ~1e-2 error at full rank), so
vj[b] fits the (b,b) pair as well and integrates it against the mesh
density's Hartree potential:

    v_I = (vol/ng) * [S_bb (B_bb^T vcoul)]_I,
    vj[b] = x_b^H diag(v) x_b,   vcoul = ifft(coulG * fft(n_mesh)),

one nip-vector solve per band point (the potential itself comes from the
mesh density exactly, no refit).

On a mesh point the per-pair fit is at least as accurate as the build's
sector fit (which pools all nk pairs of the sector into one LS problem), so
band J/K agree with the mesh serving to compression error — gated against
the exact plane-wave bands in tests/test_isdf_bands.py.

The exchange kernel's G = 0 handling follows the pw.jk band convention:
exactly the argmin-|q'+G|^2 sample is excluded when strictly inside the
minimum q-lattice plane spacing of the singular lattice (reduces to the
q+G = 0 rule at mesh points).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fftisdf_tpu.basis.eval import make_evaluator
from fftisdf_tpu.isdf.kpoint import _sector_wq
from fftisdf_tpu.linalg.coulomb import get_coulG
from fftisdf_tpu.utils.device import to_device, czeros


def _band_coulG(cell, q, gv, dmin2):
    """4pi/|q+G|^2 with the band argmin-exclusion rule (host, real)."""
    gk = gv + q[None, :]
    absg2 = np.einsum("gi,gi->g", gk, gk)
    keep = absg2 > 1e-12
    imin = int(np.argmin(absg2))
    if absg2[imin] < dmin2:
        keep[imin] = False
    out = np.zeros_like(absg2)
    out[keep] = 4.0 * np.pi / absg2[keep]
    return out


def _qlat_dmin2(cell, kmesh):
    """(minimum BvK q-lattice plane spacing)^2."""
    km = np.asarray(kmesh, dtype=np.float64)
    qlat = cell.reciprocal_vectors() / km[:, None]
    volq = abs(np.linalg.det(qlat))
    dmin = min(volq / np.linalg.norm(
        np.cross(qlat[(i + 1) % 3], qlat[(i + 2) % 3])) for i in range(3))
    return dmin ** 2


def get_jk_bands(df, dm_kpts, kpts_band, with_j=True, with_k=True):
    """(vj_b, vk_b) at band k-points, each (nset?, nb, nao, nao) matching
    the input dm rank ((nk,nao,nao) -> (nb,nao,nao)).  ``df`` is a built
    FFTISDF."""
    cell, kpts = df.cell, df.kpts
    nk = len(kpts)
    cdtype = df.wq.dtype
    kpts_band = np.asarray(kpts_band).reshape(-1, 3)
    nb = len(kpts_band)
    mesh = tuple(int(m) for m in cell.mesh)
    coords = cell.gen_uniform_grids()
    ngrid = coords.shape[0]
    vol = float(cell.vol)
    gv = np.asarray(cell.get_Gv(mesh))
    dmin2 = _qlat_dmin2(cell, df.kmesh)

    single = (np.asarray(dm_kpts).ndim == 3
              if not isinstance(dm_kpts, jax.Array)
              else dm_kpts.ndim == 3)
    dm = to_device(dm_kpts, dtype=cdtype)

    # band AOs at the frozen interpolation points / on the full grid
    m0 = cell.mesh if df.m0 is None else df.m0
    coords_ip = cell.gen_uniform_grids(m0)[np.asarray(df.mask)]
    fnb = make_evaluator(cell, kpts=kpts_band, dtype=df.dtype)
    x_b = fnb(jnp.asarray(coords_ip, dtype=df.dtype))       # (nb, nip, nao)

    fn = make_evaluator(cell, kpts=kpts, dtype=df.dtype)
    coords_j = jnp.asarray(coords, dtype=df.dtype)
    f_k = fn(coords_j)                                       # (nk, ng, nao)
    f_b = fnb(coords_j)                                      # (nb, ng, nao)
    kpts_np = np.asarray(kpts)

    dmset_all = dm if not single else dm[None]

    vj_b = None
    if with_j:
        from fftisdf_tpu.linalg.fft import fft3, ifft3
        from fftisdf_tpu.linalg.solvers import fitting_operator

        coulG0 = jnp.asarray(np.asarray(get_coulG(cell, mesh=mesh,
                                                  trunc=df.trunc)),
                             dtype=df.dtype)
        w_quad = vol / ngrid

        @jax.jit
        def _vcoul(f_k, dms):
            n_g = jnp.einsum("kgm,xkmn,kgn->xg", f_k, dms,
                             f_k.conj()).real / nk
            return jax.vmap(
                lambda n: ifft3(fft3(n.astype(cdtype), mesh) * coulG0,
                                mesh).real)(n_g)           # (nset, ng)

        vcoul = _vcoul(f_k, dmset_all)

        @jax.jit
        def _vj_band(f_b1, x_b1, vcoul):
            fx = jnp.einsum("gm,Im->gI", f_b1.conj(), x_b1)
            b_bb = fx * fx.conj()                          # (ng, nip)
            a_bb = jnp.einsum("Im,Jm->IJ", x_b1, x_b1.conj())
            a_bb = a_bb * a_bb.conj()
            rhs = w_quad * jnp.einsum("gI,xg->xI", b_bb.conj(),
                                      vcoul.astype(cdtype))
            apply_inv, _ = fitting_operator(a_bb, method=df.solver,
                                            rcond=df.rcond,
                                            refine=df.refine)
            v = apply_inv(rhs.T).T                         # (nset, nip)
            return jnp.einsum("Im,In,xI->xmn", x_b1.conj(), x_b1, v)

        vj_b = jnp.stack([_vj_band(f_b[b], x_b[b], vcoul)
                          for b in range(nb)], axis=1)
        if single:
            vj_b = vj_b[0]
    if not with_k:
        return vj_b, None

    @jax.jit
    def _pair_fx(f1, x1, f2, x2):
        fx1 = jnp.einsum("gm,Im->gI", f1.conj(), x1)
        fx2 = jnp.einsum("gm,Im->gI", f2.conj(), x2)
        a = (jnp.einsum("Im,Jm->IJ", x1, x1.conj())
             * jnp.einsum("Im,Jm->IJ", x2, x2.conj()).conj())
        return a, fx1 * fx2.conj()

    @jax.jit
    def _pair_vk(x_b1, w, x_k2, dmset2):
        dms2 = dmset2 if dmset2.ndim == 3 else dmset2[None]
        rho = jnp.einsum("Im,xmn,Jn->xIJ", x_k2, dms2, x_k2.conj())
        vk = jnp.einsum("Im,xIJ,Jn->xmn", x_b1.conj(), w * rho, x_b1)
        return vk

    @jax.jit
    def _w_pair(a, b_rhs, cg, tq):
        eiqr = jax.lax.complex(jnp.cos(tq), jnp.sin(tq)).astype(cdtype)
        # signed metric: off-mesh band shifts make truncated 2D kernels
        # negative at many samples (isdf.kpoint._sector_wq docstring)
        return _sector_wq(a, b_rhs, cg, eiqr, mesh, vol, ngrid,
                          solver=df.solver, rcond=df.rcond,
                          refine=df.refine,
                          signed=df.trunc is not None)[0]

    dmset = dm if not single else dm[None]
    nset, _, nao, _ = dmset.shape
    vk_parts = []
    for b in range(nb):
        acc = czeros((nset, nao, nao), cdtype)
        for k2 in range(nk):
            a, b_rhs = _pair_fx(f_b[b], x_b[b], f_k[k2], df.x_k[k2])
            q = kpts_np[k2] - kpts_band[b]
            if df.trunc is not None:
                # finite everywhere: no divergent-sample exclusion applies
                cg = jnp.asarray(np.asarray(get_coulG(
                    cell, q=q, gv=gv, trunc=df.trunc)), dtype=df.dtype)
            else:
                cg = jnp.asarray(_band_coulG(cell, q, gv, dmin2),
                                 dtype=df.dtype)
            tq = jnp.asarray(coords @ q, dtype=df.dtype)
            w = _w_pair(a, b_rhs, cg, tq)
            acc = acc + _pair_vk(x_b[b], w, df.x_k[k2], dmset[:, k2])
        vk_parts.append(acc / nk)
    vk_b = jnp.stack(vk_parts, axis=1)      # (nset, nb, nao, nao)
    if single:
        vk_b = vk_b[0]
    return vj_b, vk_b
