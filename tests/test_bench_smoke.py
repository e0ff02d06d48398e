"""Smoke test: bench.py runs end-to-end on CPU and emits one JSON line."""
import json
import os
import subprocess
import sys


def test_bench_quick_json():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # ignored by sitecustomize; bench detects cpu
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['bench.py','--quick','--system','diamond',"
         "'--ke','30','--c0','8'];"
         "exec(open('bench.py').read())"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in data
    assert data["value"] > 0
