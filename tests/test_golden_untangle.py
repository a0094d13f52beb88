"""Golden-file byte-equality test for `odgi untangle`
(reference: scripts/untangle.sh against test/binary/untangle/default)."""

import subprocess
import sys
from pathlib import Path

import pytest

GOLD = Path("/root/reference/test/binary/untangle")
REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(not GOLD.is_dir(), reason="reference golden files not mounted")
def test_untangle_golden_default():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "odgi_tpu.cli.main",
            "untangle",
            "-i",
            "test/overlap.gfa",
        ],
        cwd="/root/reference",
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout == (GOLD / "default").read_text()
