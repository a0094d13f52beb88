"""Golden-file byte-equality tests for `odgi degree`.

Mirrors the reference's binary test regime (reference: scripts/degree.sh,
run by CTest target odgi-binary-tests, CMakeLists.txt:990-994): every case
diffs our CLI stdout against the checked-in expected output in
/root/reference/test/binary/degree/.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference/test")
GOLD = REF / "binary" / "degree"
REPO = Path(__file__).resolve().parent.parent

CASES = [
    ("default", ["-i", "test/overlap.gfa"]),
    ("subset_paths", ["-i", "test/overlap.gfa", "-s", str(GOLD / "paths")]),
    ("path", ["-i", "test/overlap.gfa", "-r", "target"]),
    ("paths_", ["-i", "test/overlap.gfa", "-R", str(GOLD / "paths")]),
    ("graph_pos", ["-i", "test/overlap.gfa", "-g", "8,2"]),
    ("graph_pos_file_", ["-i", "test/overlap.gfa", "-G", str(GOLD / "graph_pos_file")]),
    ("path_pos", ["-i", "test/overlap.gfa", "-p", "target,3,+"]),
    ("path_pos_file_", ["-i", "test/overlap.gfa", "-F", str(GOLD / "path_pos_file")]),
    ("bed_input", ["-i", "test/overlap.gfa", "-b", str(GOLD / "bed")]),
    ("graph_degree_table", ["-i", "test/overlap.gfa", "-d"]),
    ("graph_degree_vec", ["-i", "test/overlap.gfa", "-v"]),
    ("path_degree", ["-i", "test/overlap.gfa", "-D"]),
    ("self_degree", ["-i", "test/overlap.gfa", "-a"]),
    ("summarize", ["-i", "test/overlap.gfa", "-S"]),
    ("windows_in", ["-i", "test/overlap.gfa", "-w", "10:0:5"]),
    ("windows_out", ["-i", "test/overlap.gfa", "-W", "10:0:5"]),
]


@pytest.mark.skipif(not GOLD.is_dir(), reason="reference golden files not mounted")
@pytest.mark.parametrize("name,args", CASES, ids=[c[0] for c in CASES])
def test_degree_golden(name, args):
    # run with cwd=/root/reference so the echoed -i path matches the
    # goldens (they embed the relative input path, e.g. in -v output)
    out = subprocess.run(
        [sys.executable, "-m", "odgi_tpu.cli.main", "degree", *args],
        cwd="/root/reference",
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    expected = (GOLD / name).read_text()
    assert out.stdout == expected
