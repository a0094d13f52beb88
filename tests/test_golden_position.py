"""Golden-file byte-equality tests for `odgi position`
(reference: scripts/position.sh against test/binary/position/*)."""

import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference/test")
GOLD = REF / "binary" / "position"
REPO = Path(__file__).resolve().parent.parent

CASES = [
    ("path_node_mapping", ["-i", "test/k.gfa", "-p", "y,10", "-v"]),
    ("path_node_mapping_ref", ["-i", "test/k.gfa", "-p", "y,10", "-r", "x"]),
    ("node_node_mapping", ["-i", "test/k.gfa", "-g", "6"]),
    ("node_node_mapping_offset", ["-i", "test/k.gfa", "-g", "6,2"]),
    ("node_node_mapping_ref", ["-i", "test/k.gfa", "-g", "4", "-r", "x"]),
    ("path_path_mapping_1", ["-i", "test/overlap.gfa", "-r", "target", "-p", "query3,0"]),
    ("path_path_mapping_2", ["-i", "test/overlap.gfa", "-r", "target", "-p", "query3,1"]),
    ("path_path_mapping_3", ["-i", "test/overlap.gfa", "-r", "target", "-p", "query3,2"]),
    ("path_path_mapping_4", ["-i", "test/overlap.gfa", "-r", "target", "-p", "query3,5"]),
    (
        "path_path_mapping_jaccard",
        ["-i", "test/overlap.gfa", "-r", "target", "-p", "query1,5", "-w", "2"],
    ),
    ("gff", ["-i", "test/overlap.gfa", "-E", "test/overlap.gtf"]),
]


@pytest.mark.skipif(not GOLD.is_dir(), reason="reference golden files not mounted")
@pytest.mark.parametrize("name,args", CASES, ids=[c[0] for c in CASES])
def test_position_golden(name, args):
    out = subprocess.run(
        [sys.executable, "-m", "odgi_tpu.cli.main", "position", *args],
        cwd="/root/reference",
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    expected = (GOLD / name).read_text()
    assert out.stdout == expected
