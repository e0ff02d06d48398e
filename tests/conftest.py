"""Test configuration: run everything on CPU with 8 virtual devices and f64.

Mirrors the reference's accuracy regime (complex128 everywhere) so the 1e-10
identity gates are meaningful; sharding tests use the 8-device virtual mesh
(SURVEY.md section 4 item 5).

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU backend at interpreter start, so JAX_PLATFORMS in os.environ is read too
late — switch platforms through jax.config instead (backends are not yet
instantiated at conftest time).  XLA_FLAGS is read at CPU-client creation, so
setting it here still works.
"""
import os

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# Test tiers (auto-marked by file, so `pytest -m core` / `-m extended` work
# without touching every test module):
#
#   core      — the ISDF-product gates (SURVEY.md section 4): lattice/basis/
#               linalg foundations, the k-point ISDF build and its oracles,
#               J/K serving, SCF, sharding, f32-regime numerics.  The
#               pre-commit tier; runs in well under 10 min on the 1-core
#               host.
#   extended  — the beyond-reference physics (CC/EOM, GW/BSE, TDDFT, DMET,
#               derivatives: forces/stress/hessian/phonon/elastic/EOS/MD,
#               KS-DFT functionals/+U, spectroscopy/IO) — the long tail
#               (~35 min).  Run before shipping physics changes.
#
# Full suite = both tiers; `python -m pytest tests/ -q` is unchanged.
# ---------------------------------------------------------------------------
_EXTENDED_FILES = {
    "test_analysis.py", "test_atom.py", "test_becke.py", "test_bse.py",
    "test_cc.py", "test_cube.py",
    "test_dmet.py", "test_dos.py", "test_elastic.py", "test_eos.py",
    "test_exxdiv_grad.py", "test_forces.py", "test_gw.py",
    "test_hessian.py", "test_hse.py", "test_hubbard.py", "test_ks.py",
    "test_md.py", "test_mp2.py", "test_optimize.py", "test_phonon.py",
    "test_relax_cell.py", "test_rpa.py", "test_stress.py",
    "test_tddft.py", "test_trunc_scf.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        tier = "extended" if fname in _EXTENDED_FILES else "core"
        item.add_marker(getattr(pytest.mark, tier))
