"""Run the reference's OWN Python-binding acceptance doctests verbatim.

The reference wires test/python/odgi_ffi.md and odgi_performance.md as
CTest doctests (reference: CMakeLists.txt:131-137, 956-957).  The
top-level ``odgi`` / ``odgi_ffi`` shim modules at the repo root
re-export odgi_tpu.compat, so the exact same files must pass here —
including the pinned handle values ((id-1)<<1 | rev packing,
src/odgi.cpp:30-37) and the per-node edge traversal order (node_t
record order = projection of edge creation order).
"""

import os
import pathlib
import subprocess
import sys

import pytest

REF_TEST = pathlib.Path("/root/reference/test")
REPO = pathlib.Path(__file__).resolve().parent.parent


def _run_doctest(md_name: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [
            sys.executable, "-m", "doctest",
            "-o", "NORMALIZE_WHITESPACE", "-o", "REPORT_UDIFF",
            f"python/{md_name}",
        ],
        cwd=str(REF_TEST),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.skipif(
    not (REF_TEST / "python" / "odgi_ffi.md").exists(),
    reason="reference checkout not present",
)
def test_reference_odgi_ffi_doctest():
    r = _run_doctest("odgi_ffi.md")
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.skipif(
    not (REF_TEST / "python" / "odgi_performance.md").exists(),
    reason="reference checkout not present",
)
def test_reference_odgi_performance_doctest():
    r = _run_doctest("odgi_performance.md")
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.skipif(
    not (REF_TEST.parent / "scripts" / "test_binary.sh").exists(),
    reason="reference checkout not present",
)
def test_reference_binary_harness():
    """The reference's OWN CLI acceptance harness
    (scripts/test_binary.sh -> position.sh + degree.sh + untangle.sh,
    byte-diffed against test/binary/*) runs verbatim against the
    odgi-compatible executable shim (tools/bin/odgi).  Paths are
    relative with cwd at the reference root, matching how the golden
    fixtures were recorded (they embed the input path)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["ODGI_TPU_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            "bash", "scripts/test_binary.sh",
            str(REPO / "tools" / "bin" / "odgi"), "test", "scripts",
        ],
        cwd=str(REF_TEST.parent),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "FAILED" not in r.stdout
