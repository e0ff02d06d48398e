"""Differentiable ISDF: gradients of ERIs/J/K energies w.r.t. atom positions.

A capability the reference (numpy/LAPACK/FFTW pipelines) cannot offer at all:
because every stage here — Bloch AO evaluation, the stripe-trick normal
equations, the fitting solve, the FFT Coulomb metric, ERI assembly — is JAX,
``jax.grad`` differentiates the *entire* compressed-ERI approximant with
respect to nuclear coordinates analytically.

Semantics: the interpolation points (grid positions selected by pivoted
Cholesky) and the per-shell lattice-image lists are held fixed (they are
discrete); the AO values at those points, and everything downstream, are
differentiated.  This is the exact derivative of the ISDF approximant for
the frozen point set — verified against finite differences in
tests/test_autodiff.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fftisdf_tpu.basis.eval import (
    build_shell_table, _group_by_center, _group_chi)
from fftisdf_tpu.isdf.kpoint import _stripe_quartic, _rhs_block
from fftisdf_tpu.linalg.solvers import solve_fitting
from fftisdf_tpu.linalg.fft import fft3, ifft3
from fftisdf_tpu.linalg.coulomb import get_coulG
from fftisdf_tpu.isdf.eri import assemble_eri


def make_evaluator_diff(cell, kpts=None, precision=None, dtype=jnp.float64,
                        shells=None):
    """Positions-traced Bloch AO evaluator: fn(coords, positions) with
    positions (natm, 3); image lists stay those of the reference geometry.
    ``shells``: optional explicit [(center, Shell)] list (e.g. GTH projector
    functions, scf.integrals._projector_shells) instead of the cell basis;
    each shell is attached to the nearest atom and moves with it."""
    precision = cell.precision if precision is None else precision
    table = build_shell_table(cell, precision, shells)
    groups = _group_by_center(cell, table, precision)
    # map each center group back to its atom index
    atom_xyz = [np.asarray(x) for _, x in cell.atom]
    group_atom = []
    for g in groups:
        ia = min(range(len(atom_xyz)),
                 key=lambda i: np.linalg.norm(atom_xyz[i] - g.center))
        group_atom.append(ia)
    gamma = kpts is None
    kpts_arr = None if gamma else np.asarray(kpts)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    ainv = np.linalg.inv(np.asarray(cell.a))
    a_mat = np.asarray(cell.a)

    def eval_fn(coords, positions):
        coords = jnp.asarray(coords, dtype=dtype)
        positions = jnp.asarray(positions, dtype=dtype)
        frac = coords @ jnp.asarray(ainv, dtype=dtype)
        tvec = jnp.floor(frac) @ jnp.asarray(a_mat, dtype=dtype)
        coords0 = coords - tvec
        blocks = []
        for g, ia in zip(groups, group_atom):
            images = jnp.asarray(g.images, dtype=dtype)
            centers = positions[ia][None, :] + images
            chi_all = _group_chi(coords0, g, centers, dtype)
            if gamma:
                blocks.append(jnp.sum(chi_all, axis=1))
            else:
                # image phases from a real host constant (complex host
                # constants round-trip through transports that reject them);
                # split re/im contraction as in basis.eval
                tph = jnp.asarray(np.asarray(g.images) @ kpts_arr.T,
                                  dtype=dtype)
                out_r = jnp.einsum("gTf,Tk->kgf", chi_all, jnp.cos(tph))
                out_i = jnp.einsum("gTf,Tk->kgf", chi_all, jnp.sin(tph))
                blocks.append(jax.lax.complex(out_r, out_i).astype(cdtype))
        out = jnp.concatenate(blocks, axis=-1)
        if not gamma:
            ptphase = jnp.exp(1j * (tvec @ jnp.asarray(
                kpts_arr.T, dtype=dtype))).astype(cdtype)
            out = out * ptphase.T[:, :, None]
        return out

    return eval_fn


def isdf_state_fn(cell, kpts, mask, m0=None, solver="ridge", rcond=1e-10,
                  dtype=jnp.float64, remat=None, dev_mesh=None,
                  use_trs=True, max_memory_gb=None, omegas=None):
    """Differentiable (x_k, w_q) builder for a frozen interpolation-point set.

    Returns ``state(positions) -> (x_k, wq)``, jit/grad-compatible.  The
    frozen ``mask`` indexes the selection (parent) grid ``m0`` of a prior
    FFTISDF build.

    ``remat``: rematerialize the per-sector solve/FFT pipeline in the
    reverse sweep (bounds memory at ~one sector instead of nk sectors —
    required for production sizes on a 16 GB chip).  Costs reverse-mode
    noise ~eps/rcond RELATIVE in the solve outputs (the recomputed
    ill-conditioned solve decorrelates from the forward's rounding), so the
    default is on only below f64 (where the f32 floor dominates anyway);
    f64 validation gates keep the exact-residual path.

    ``dev_mesh``: a jax device mesh (parallel.make_device_mesh) — the state
    and its reverse sweep run GSPMD-sharded in the same layout as the
    non-differentiable sharded build (parallel.build): grid-sharded RHS,
    one all-to-all into the sector layout, sectors vmapped locally.  GSPMD
    differentiates the collectives, so the FORCE sweep scales over the mesh
    too — the path to the (nk, ngrid, nip) RHS exceeding one chip's HBM at
    the reference's 4x4x4 target mesh.

    ``use_trs``: time-reversal halving (w_{-q} = conj(w_q), real AOs — the
    same trick the build uses): only canonical sectors run the solve+FFT
    stage, mirrors are conjugate-scattered; the scatter is differentiable
    so the reverse sweep halves too.  Applied on the single-device path
    (the sharded layout keeps all sectors for an even GSPMD partition).

    ``max_memory_gb``: HBM budget enabling SECTOR-CHUNKED state/reverse
    sweeps on the single-device path (round-1 verdict item #5) — the
    differentiable analog of the forward build's qchunk (isdf.kpoint
    FFTISDF.build): when the (nk_canonical, ngrid, nip) RHS exceeds the
    budget, canonical sectors are processed in checkpointed chunks whose
    RHS (and AO sweep) is recomputed per chunk in BOTH the forward and the
    reverse pass, bounding live memory at ~one chunk's pipeline.  This is
    what lets the reference's 4x4x4 target-mesh force sweep fit one 16 GB
    chip.  None (default): single-shot sweep (the fastest path when y
    fits).  Chunk solves keep the ``fit_factor`` save policy.

    ``omegas``: extra range-separation parameters (linalg.coulomb
    convention: omega < 0 is erfc-screened SR) to build ADDITIONAL metrics
    for — needed by screened-hybrid (HSE06) derivatives, whose Lagrangian
    carries both the Hartree (bare) and the SR-exchange (screened) metric.
    When given, ``state`` returns ``(x_k, wq)`` with wq of shape
    ``(1 + len(omegas), nk, nip, nip)`` (kernel 0 = bare).  The extra
    metrics are nearly free in the forward AND reverse sweep: w_q is
    linear in the kernel, so every kernel reuses the sector's fitting
    solve and forward FFT, differing only in the spectral scale."""
    if remat is None:
        remat = dtype != jnp.float64
    m0 = cell.mesh if m0 is None else m0
    from fftisdf_tpu.lattice import kpoints as kpt_mod

    kmesh = kpt_mod.kpts_to_kmesh(cell, kpts)
    phase_np = kpt_mod.get_phase(cell, kpts, kmesh)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    coords = cell.gen_uniform_grids()
    coords_sel = cell.gen_uniform_grids(m0)[np.asarray(mask)]
    mesh = tuple(int(m) for m in cell.mesh)
    ngrid = coords.shape[0]
    vol = float(cell.vol)
    gv = cell.get_Gv(mesh)
    kernels = (0.0,) + tuple(float(o) for o in (omegas or ()))
    nker = len(kernels)
    multi = omegas is not None
    # (nker, nk, ng): kernel 0 is the bare Coulomb metric
    coulG = np.stack([
        np.stack([np.asarray(get_coulG(cell, q=q, gv=gv, omega=o))
                  for q in kpts]) for o in kernels])
    if not multi:
        coulG = coulG[0]
    # q-phase angles as a real host constant; complex built on device
    tqr = (coords @ np.asarray(kpts).T).T

    def _wq_of_solve(z_q, cg, ph):
        """Sector metric(s) from the fitted z_q: one forward FFT shared by
        every kernel (w_q is linear in the kernel — the spectral scale is
        the only per-kernel work)."""
        spec = fft3(z_q * ph.conj()[None, :], mesh)
        if not multi:
            zeta = ifft3(spec * cg, mesh) * ph[None, :] * (vol / ngrid)
            return zeta @ z_q.conj().T
        outs = []
        for i in range(nker):
            zeta = ifft3(spec * cg[i], mesh) * ph[None, :] * (vol / ngrid)
            outs.append(zeta @ z_q.conj().T)
        return jnp.stack(outs)

    def _trs_expand(wq_sel):
        """Scatter canonical sectors (+ conjugate mirrors) back to all q
        (leading axis = q; extra trailing axes broadcast)."""
        wq = wq_sel[jnp.asarray(trs_order)]
        flag = jnp.asarray(trs_conj).reshape((-1,) + (1,) * (wq.ndim - 1))
        return jnp.where(flag, wq.conj(), wq)
    fn = make_evaluator_diff(cell, kpts=kpts, dtype=dtype)
    # rematerialization: without checkpoints the reverse sweep stores (a)
    # the evaluator's (ngrid, nimages, nfunc) chi tensors, (b) three extra
    # y-sized stripe intermediates of _rhs_block, and (c) the per-sector
    # (nip, ngrid) FFT pipeline stacked over ALL q by lax.map — several GB
    # at production sizes (NiO 2x2x2 OOMs a 16 GB chip).  Recomputing them
    # in the backward pass bounds live memory at ~y + f_k + one sector.
    fn_ckpt = jax.checkpoint(fn)
    rhs_ckpt = jax.checkpoint(_rhs_block)

    # TRS canonical-sector selection (host constants; see docstring)
    nk = len(np.asarray(kpts))
    qsel = trs_order = trs_conj = None
    if use_trs and dev_mesh is None:
        s_kpts = cell.get_scaled_kpts(np.asarray(kpts))
        mirror = np.array([kpt_mod.member(-s_kpts[q], s_kpts, strict=False)
                           for q in range(nk)])
        if (mirror < 0).any():
            # a mesh without full time-reversal pairing (e.g. shifted):
            # degrade to the full-sector path instead of failing at
            # construction (round-1 advisor finding)
            mirror = np.arange(nk)
        cand = np.array([q for q in range(nk) if q <= mirror[q]])
        if len(cand) < nk:
            qsel = cand
            pos_of = {int(q): i for i, q in enumerate(cand)}
            trs_order = np.array([pos_of[q] if q in pos_of
                                  else pos_of[int(mirror[q])]
                                  for q in range(nk)])
            trs_conj = np.array([q not in pos_of for q in range(nk)])

    if dev_mesh is not None:
        from fftisdf_tpu.parallel.mesh import grid_sharding, sector_sharding
        from jax.lax import with_sharding_constraint
        from jax.sharding import NamedSharding, PartitionSpec

        gshard = grid_sharding(dev_mesh)
        sshard = sector_sharding(dev_mesh)
        cshard = NamedSharding(dev_mesh, PartitionSpec("d", None))

    # ---- sector-chunked single-device state (max_memory_gb set): the RHS
    # is never materialized beyond one chunk of canonical sectors; each
    # chunk recomputes its own AO sweep + chunk-restricted RHS, and
    # jax.checkpoint(chunk) repeats exactly that recomputation in the
    # reverse pass (fit factors saved via FIT_FACTOR_POLICY)
    if max_memory_gb is not None and dev_mesh is None:
        from fftisdf_tpu.linalg.solvers import FIT_FACTOR_POLICY

        itemsize = 16 if dtype == jnp.float64 else 8
        nq_all = nk if qsel is None else len(qsel)
        nip = coords_sel.shape[0]
        per_sector_gb = ngrid * nip * itemsize / 1e9
        # budget split: y_c + its block-transpose copy + the reverse-pass
        # cotangent of y_c all coexist, so chunk sectors against ~1/4 of
        # the budget
        qchunk = nq_all
        if nq_all * per_sector_gb > max_memory_gb / 4:
            qchunk = max(1, int((max_memory_gb / 4) / per_sector_gb))
        qs_full = np.arange(nk) if qsel is None else np.asarray(qsel)
        # q-leading layout so per-sector slicing/mapping is kernel-agnostic
        cg_np = coulG if not multi else np.moveaxis(coulG, 0, 1)
        # grid-block streaming INSIDE each chunk (the differentiable analog
        # of the build pipeline's block sweep): a full-grid stripe sweep
        # materializes (2 nimg + nq) x ngrid x nip intermediates, which
        # scales with nimg = nk — 68 GB at the 4x4x4 target mesh even with
        # sector chunking.  lax.map over blocks with a per-block checkpoint
        # bounds them at blk grid rows in BOTH sweep directions.
        blk = max(256, int(0.1 * max_memory_gb * 1e9
                           / ((2 * nk + 2 * qchunk) * nip * itemsize)))
        blk = min(blk, ngrid)
        nblk = -(-ngrid // blk)
        gpad = nblk * blk - ngrid
        coords_p_np = np.concatenate(
            [coords, np.zeros((gpad, 3))], axis=0).reshape(nblk, blk, 3)

        def chunk_wq(positions, x_k, phase, pcols, x4_c, cg_c, eiqr_c):
            nq_c = pcols.shape[1]

            def block_rhs(c):
                f_k = fn(c, positions)
                fx_k = jnp.einsum("kgm,kIm->kgI", f_k.conj(), x_k)
                fx_s = jnp.einsum("Rk,kgI->RgI", phase, fx_k)
                y_s = (fx_s.real ** 2).astype(fx_s.dtype)
                return jnp.einsum("Rq,RgI->qgI", pcols, y_s)

            y_blocks = jax.lax.map(jax.checkpoint(block_rhs),
                                   jnp.asarray(coords_p_np, dtype=dtype))
            y_c = jnp.transpose(y_blocks, (1, 0, 2, 3)).reshape(
                nq_c, -1, nip)[:, :ngrid]

            def per_q(args):
                x4_q, y_q, cg, ph = args
                z_q, _ = solve_fitting(x4_q, y_q.T, method=solver,
                                       rcond=rcond)
                return _wq_of_solve(z_q, cg, ph)

            pq = (jax.checkpoint(per_q, policy=FIT_FACTOR_POLICY)
                  if remat else per_q)
            return jax.lax.map(pq, (x4_c, y_c, cg_c, eiqr_c))

        chunk_ckpt = jax.checkpoint(chunk_wq, policy=FIT_FACTOR_POLICY)

        def state_chunked(positions):
            phase = jax.lax.complex(
                jnp.asarray(phase_np.real, dtype=dtype),
                jnp.asarray(phase_np.imag, dtype=dtype)).astype(cdtype)
            eiqr = jax.lax.complex(
                jnp.cos(jnp.asarray(tqr, dtype=dtype)),
                jnp.sin(jnp.asarray(tqr, dtype=dtype))).astype(cdtype)
            x_k = fn(jnp.asarray(coords_sel, dtype=dtype), positions)
            x4_k = _stripe_quartic(x_k, phase)
            cg_all = jnp.asarray(cg_np, dtype=dtype)
            parts = []
            for q0 in range(0, len(qs_full), qchunk):
                qs = jnp.asarray(qs_full[q0:q0 + qchunk])
                parts.append(chunk_ckpt(
                    positions, x_k, phase, phase[:, qs], x4_k[qs],
                    cg_all[qs], eiqr[qs]))
            wq_sel = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                      else parts[0])
            wq = _trs_expand(wq_sel) if qsel is not None else wq_sel
            if multi:
                wq = jnp.moveaxis(wq, 1, 0)    # (nker, nk, nip, nip)
            return x_k, wq

        return state_chunked

    def state(positions):
        phase = jax.lax.complex(
            jnp.asarray(phase_np.real, dtype=dtype),
            jnp.asarray(phase_np.imag, dtype=dtype)).astype(cdtype)
        eiqr = jax.lax.complex(
            jnp.cos(jnp.asarray(tqr, dtype=dtype)),
            jnp.sin(jnp.asarray(tqr, dtype=dtype))).astype(cdtype)
        x_k = fn(jnp.asarray(coords_sel, dtype=dtype), positions)
        coords_j = jnp.asarray(coords, dtype=dtype)
        if dev_mesh is not None:
            coords_j = with_sharding_constraint(coords_j, cshard)
        f_k = fn_ckpt(coords_j, positions)
        x4_k = _stripe_quartic(x_k, phase)
        y = rhs_ckpt(f_k, x_k, phase)

        def per_q(args):
            x4_q, y_q, cg, ph = args
            z_q, _ = solve_fitting(x4_q, y_q.T, method=solver, rcond=rcond)
            return _wq_of_solve(z_q, cg, ph)

        from fftisdf_tpu.linalg.solvers import FIT_FACTOR_POLICY
        pq = (jax.checkpoint(per_q, policy=FIT_FACTOR_POLICY) if remat
              else per_q)
        cg_all = jnp.asarray(coulG if not multi
                             else np.moveaxis(coulG, 0, 1), dtype=dtype)
        if dev_mesh is None:
            if qsel is not None:
                qs = jnp.asarray(qsel)
                wq_sel = jax.lax.map(pq, (x4_k[qs], y[qs], cg_all[qs],
                                          eiqr[qs]))
                wq = _trs_expand(wq_sel)
            else:
                wq = jax.lax.map(pq, (x4_k, y, cg_all, eiqr))
            if multi:
                wq = jnp.moveaxis(wq, 1, 0)    # (nker, nk, nip, nip)
            return x_k, wq
        # sharded: grid-layout y -> all-to-all -> sector layout; local
        # sectors vmapped (same GSPMD design as parallel.build)
        y = with_sharding_constraint(y, gshard)
        y = with_sharding_constraint(y, sshard)
        wq = jax.vmap(lambda x4_q, y_q, cg, ph: pq((x4_q, y_q, cg, ph)))(
            x4_k, y, cg_all, eiqr)
        if multi:
            return x_k, jnp.stack([
                with_sharding_constraint(wq[:, i], sshard)
                for i in range(nker)])
        return x_k, with_sharding_constraint(wq, sshard)

    return state


def eri_grad_fn(cell, kpts, mask, kidx, kconserv2, m0=None,
                dtype=jnp.float64, **state_kw):
    """d(ISDF ERI element)/d(positions): returns value_and_grad of a real
    scalar probe sum_mnkl Re[c* eri] for a fixed probe tensor c."""
    state = isdf_state_fn(cell, kpts, mask, m0=m0, dtype=dtype, **state_kw)
    k1, k2, k3, k4 = kidx
    q = int(kconserv2[k1, k2])

    def scalar(positions, probe):
        x_k, wq = state(positions)
        eri = assemble_eri(wq[q], x_k[k1], x_k[k2], x_k[k3], x_k[k4])
        return jnp.real(jnp.sum(probe * eri))

    return jax.value_and_grad(scalar)
