"""CP2K data-file ingestion gates (round-2 verdict item 4).

The embedded Ni / part-of-H molopt-sr columns are self-declared in-repo
surrogates (basis/data.py provenance notes); the documented remedy is
dropping real CP2K ``BASIS_MOLOPT`` / ``GTH_POTENTIALS`` files and loading
them via ``load_cp2k_data_files`` (env vars FFTISDF_TPU_CP2K_BASIS /
FFTISDF_TPU_CP2K_POTENTIALS).  These tests make sure that remedy WORKS
before anyone needs it:

* round-trip: embedded known-good tables (H gth-szv, Ni gth-pade q18 with
  multi-l 2x2 projector blocks) formatted as CP2K text and re-parsed must
  reproduce the registry entries digit-for-digit;
* override: a registered file entry must override the embedded surrogate
  (no fallback warning), change ``cell.nao_nr()``, and move the SCF energy
  variationally;
* the file/env plumbing of ``load_cp2k_data_files`` itself.

Reference config this unblocks: ``/root/reference/fftisdf.py:423-424``
(NiO, gth-dzvp-molopt-sr + gth-pade).
"""
import numpy as np
import pytest

from fftisdf_tpu.basis import data


def _format_cp2k_basis(elem, shells, name="TEST-BASIS"):
    """Format registry-style shells [(l, rows)] as a CP2K BASIS entry.

    Each (l, rows) pair is emitted as its own set (lmin == lmax == l,
    nshell = number of contraction columns)."""
    lines = [f"{elem}  {name}", f" {len(shells)}"]
    for l, rows in shells:
        rows = np.asarray(rows, dtype=np.float64)
        nexp, ncol = rows.shape
        nshell = ncol - 1
        lines.append(f" 1 {l} {l} {nexp} {nshell}")
        for r in rows:
            lines.append("  " + "  ".join(f"{v:.10f}" for v in r))
    return "\n".join(lines) + "\n"


def _format_cp2k_pseudo(elem, ps, zshell, name="GTH-TEST"):
    """Format a GTHPseudo as a CP2K GTH_POTENTIALS entry (upper-triangle
    h rows, the CP2K convention the parser must invert)."""
    lines = [f"{elem}  {name}",
             " " + " ".join(str(int(z)) for z in zshell)]
    loc = [f"{ps.rloc:.8f}", str(len(ps.cloc))]
    loc += [f"{c:.8f}" for c in ps.cloc]
    lines.append("  " + "  ".join(loc))
    lines.append(f"  {len(ps.projectors)}")
    for l, rl, h in ps.projectors:
        n = h.shape[0]
        row0 = [f"{rl:.8f}", str(n)] + [f"{h[0, j]:.8f}" for j in range(n)]
        lines.append("  " + "  ".join(row0))
        for i in range(1, n):
            lines.append("    " + "  ".join(f"{h[i, j]:.8f}"
                                            for j in range(i, n)))
    return "\n".join(lines) + "\n"


def test_cp2k_basis_roundtrip():
    """Embedded H gth-szv -> CP2K text -> parse == registry entry."""
    shells = data._BASIS["gth-szv"]["H"]
    text = "# synthetic BASIS file\n" + _format_cp2k_basis("H", shells)
    parsed = data.parse_cp2k_basis(text)
    assert list(parsed) == ["H"]
    assert len(parsed["H"]) == len(shells)
    for (l_ref, rows_ref), (l_new, rows_new) in zip(shells, parsed["H"]):
        assert l_ref == l_new
        np.testing.assert_allclose(rows_new, np.asarray(rows_ref),
                                   rtol=0, atol=1e-9)


def test_cp2k_basis_multiset_shared_exponents():
    """A CP2K set with lmin < lmax shares one exponent block across l
    channels (the BASIS_MOLOPT layout) — the parser must split columns."""
    text = """
H TESTSET
 1
 1 0 1 3 2 1
   10.0   0.1  0.0   0.5
    1.0   0.9  0.2   0.4
    0.1   0.0  1.0   0.3
"""
    parsed = data.parse_cp2k_basis(text)
    shells = parsed["H"]
    # 2 s-contractions + 1 p-contraction, same 3 exponents
    assert [l for l, _ in shells] == [0, 1]
    s_rows = np.asarray(shells[0][1])
    p_rows = np.asarray(shells[1][1])
    assert s_rows.shape == (3, 3) and p_rows.shape == (3, 2)
    np.testing.assert_allclose(s_rows[:, 0], [10.0, 1.0, 0.1])
    np.testing.assert_allclose(s_rows[:, 2], [0.0, 0.2, 1.0])
    np.testing.assert_allclose(p_rows[:, 1], [0.5, 0.4, 0.3])


def test_cp2k_pseudo_roundtrip_ni_q18():
    """Embedded Ni q18 (multi-l, 2x2 blocks with off-diagonal h) -> CP2K
    text -> parse reproduces zion/rloc/cloc/projectors digit-for-digit."""
    ps = data.load_pseudo("gth-pade", "Ni")
    text = ("# synthetic GTH_POTENTIALS\n"
            + _format_cp2k_pseudo("Ni", ps, zshell=(10, 8),
                                  name="GTH-PADE-q18"))
    parsed = data.parse_cp2k_pseudo(text)
    new = parsed["Ni"]
    assert new.zion == ps.zion
    assert abs(new.rloc - ps.rloc) < 1e-12
    np.testing.assert_allclose(new.cloc, ps.cloc, atol=1e-8)
    assert len(new.projectors) == len(ps.projectors)
    for (l0, r0, h0), (l1, r1, h1) in zip(ps.projectors, new.projectors):
        assert l0 == l1
        assert abs(r0 - r1) < 1e-12
        np.testing.assert_allclose(h1, h0, atol=1e-8)
        np.testing.assert_allclose(h1, h1.T, atol=0)  # symmetrized


def test_load_cp2k_data_files_override(tmp_path):
    """File-registered tables override embedded surrogates: load through
    the real file/env plumbing, check no-fallback resolution, nao change
    and a variational SCF energy drop."""
    import warnings

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from fftisdf_tpu.lattice import structure
    from fftisdf_tpu.scf.hf import KRHF

    # custom H basis: embedded szv + one extra diffuse s = a 2-contraction
    # file entry (differs from every embedded table)
    szv_rows = np.asarray(data._BASIS["gth-szv"]["H"][0][1])
    extra = [(0.08, 1.0)]
    shells = [(0, szv_rows.tolist()), (0, list(extra))]
    bpath = tmp_path / "BASIS_TEST"
    bpath.write_text(_format_cp2k_basis("H", shells, name="TEST-DZ"))
    ppath = tmp_path / "GTH_POTENTIALS_TEST"
    ps_h = data.load_pseudo("gth-pade", "H")
    ppath.write_text(_format_cp2k_pseudo("H", ps_h, zshell=(1,),
                                         name="GTH-TEST-q1"))

    saved = data._BASIS.get("test-cp2k-dz")
    try:
        data.load_cp2k_data_files(basis_path=str(bpath),
                                  potentials_path=str(ppath),
                                  basis_name="test-cp2k-dz",
                                  pseudo_name="test-cp2k-pade")
        # resolves directly — no fallback warning path
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            loaded = data.load_basis("test-cp2k-dz", "H")
        assert len(loaded) == 2
        ps_loaded = data.load_pseudo("test-cp2k-pade", "H")
        np.testing.assert_allclose(ps_loaded.cloc, ps_h.cloc, atol=1e-8)

        lat = np.eye(3) * 6.0
        atoms = [("H", np.array([2.6, 3.0, 3.0])),
                 ("H", np.array([3.4, 3.0, 3.0]))]
        cell_s = structure.to_cell(lat, atoms, basis="gth-szv",
                                   pseudo="gth-pade", ke_cutoff=20.0)
        cell_c = structure.to_cell(lat, atoms, basis="test-cp2k-dz",
                                   pseudo="test-cp2k-pade", ke_cutoff=20.0)
        assert cell_s.nao_nr() == 2 and cell_c.nao_nr() == 4

        kpts = cell_s.get_kpts([1, 1, 1])
        e_s = KRHF(cell_s, kpts, verbose=0, conv_tol=1e-9).kernel()
        e_c = KRHF(cell_c, kpts, verbose=0, conv_tol=1e-9).kernel()
        # bigger basis is variational: strictly lower, same physics scale
        assert e_c < e_s
        assert e_s - e_c < 0.05
    finally:
        if saved is None:
            data._BASIS.pop("test-cp2k-dz", None)
        else:
            data._BASIS["test-cp2k-dz"] = saved
        data._PSEUDO_LIBRARY.pop("test-cp2k-pade", None)


def test_cp2k_env_var_plumbing(tmp_path, monkeypatch):
    """The env-var default path of load_cp2k_data_files registers under
    the production names (the zero-code-change upgrade documented in
    basis/data.py)."""
    shells = [(0, [(1.0, 1.0)])]
    bpath = tmp_path / "BASIS_MOLOPT"
    bpath.write_text(_format_cp2k_basis("He", shells, name="TEST"))
    monkeypatch.setenv("FFTISDF_TPU_CP2K_BASIS", str(bpath))
    monkeypatch.delenv("FFTISDF_TPU_CP2K_POTENTIALS", raising=False)
    saved = dict(data._BASIS.get("gth-dzvp-molopt-sr", {}))
    try:
        data.load_cp2k_data_files()
        assert "He" in data._BASIS["gth-dzvp-molopt-sr"]
    finally:
        data._BASIS["gth-dzvp-molopt-sr"] = saved
