"""Runtime smoke of (nearly) every CLI subcommand on a real graph.

`--help` registration is covered elsewhere; this runs each subcommand's
minimal REAL invocation on t.gfa / DRB1 so a runtime break (import
error, renamed helper, bad dispatch) in any of the 46 commands fails CI
rather than only surfacing for users.  Long-running commands use tiny
iteration counts; `server` has its own test.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
T = "/root/reference/test/t.gfa"
DRB = "/root/reference/test/DRB1-3123.gfa"


def run_cli(args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, "-m", "odgi_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


@pytest.fixture(scope="module")
def og(tmp_path_factory):
    d = tmp_path_factory.mktemp("smoke")
    og = str(d / "t.og")
    r = run_cli(["build", "-g", T, "-o", og])
    assert r.returncode == 0, r.stderr
    return og


@pytest.fixture(scope="module")
def lay(og, tmp_path_factory):
    d = tmp_path_factory.mktemp("smokelay")
    lay = str(d / "t.lay")
    r = run_cli(["layout", "-i", og, "-o", lay, "-x", "3"])
    assert r.returncode == 0, r.stderr
    return lay


CASES = [
    (["view", "-i", "OG", "-g"], "S\t"),
    (["validate", "-i", "OG"], None),
    (["stats", "-i", "OG", "-S"], "#length"),
    (["sort", "-i", "OG", "-o", "OUT.og"], None),
    (["paths", "-i", "OG", "-L"], "x"),
    (["depth", "-i", "OG", "-d"], None),
    (["degree", "-i", "OG", "-d"], None),
    (["chop", "-i", "OG", "-c", "2", "-o", "OUT.og"], None),
    (["unchop", "-i", "OG", "-o", "OUT.og"], None),
    (["normalize", "-i", "OG", "-o", "OUT.og"], None),
    (["flip", "-i", "OG", "-o", "OUT.og"], None),
    (["prune", "-i", "OG", "-o", "OUT.og"], None),
    (["explode", "-i", "OG", "-p", "OUTDIR/ex"], None),
    (["squeeze", "-f", "OGLIST", "-o", "OUT.og"], None),
    (["flatten", "-i", "OG", "-f", "OUT.fa"], None),
    (["kmers", "-i", "OG", "-k", "3"], None),
    (["matrix", "-i", "OG"], None),
    (["similarity", "-i", "OG"], None),
    (["heaps", "-i", "OG", "-n", "2"], None),
    (["pav", "-i", "OG", "-b", "BED"], None),
    (["untangle", "-i", "OG"], None),
    (["panpos", "-i", "OG", "-p", "x", "-v", "1"], None),
    (["position", "-i", "OG", "-g", "2,0,+"], None),
    (["extract", "-i", "OG", "-n", "2", "-o", "OUT.og"], None),
    (["overlap", "-i", "OG", "-r", "x"], None),
    (["version"], None),
    (["groom", "-i", "OG", "-o", "OUT.og"], None),
    (["crush", "-i", "OG", "-o", "OUT.og"], None),
    (["break", "-i", "OG", "-o", "OUT.og"], None),
    (["unitig", "-i", "OG"], None),
    (["tips", "-i", "OG"], None),
    (["bin", "-i", "OG", "-w", "10"], None),
    (["inject", "-i", "OG", "-b", "BED", "-o", "OUT.og"], None),
    (["cover", "-i", "OG", "-o", "OUT.og"], None),
    (["priv", "-i", "OG", "-o", "OUT.og", "-e", "1", "-b", "3"], None),
    (["procbed", "-i", "OG", "-b", "BED"], None),
    (["pathindex", "-i", "OG", "-o", "OUT.xpt"], None),
    (["stepindex", "-i", "OG", "-o", "OUT.stpidx"], None),
    (["layout0", "-i", "OG", "-o", "OUT.lay", "-x", "2"], None),
]


@pytest.mark.parametrize(
    "args,expect", CASES, ids=[c[0][0] for c in CASES]
)
def test_subcommand_runs(args, expect, og, tmp_path):
    bed = tmp_path / "r.bed"
    bed.write_text("x\t2\t6\tfeat\n")
    oglist = tmp_path / "l.txt"
    oglist.write_text(og + "\n")
    sub = []
    for a in args:
        a = a.replace("OUTDIR", str(tmp_path))
        a = a.replace("OUT", str(tmp_path / "out"))
        a = a.replace("OGLIST", str(oglist))
        a = a.replace("BED", str(bed))
        sub.append(a.replace("OG", og) if a == "OG" else a)
    r = run_cli(sub)
    assert r.returncode == 0, f"{args[0]}: {r.stderr[-2000:]}"
    if expect:
        assert expect in r.stdout, r.stdout[:500]


def test_viz_draw_on_drb(tmp_path):
    r = run_cli(["viz", "-i", DRB, "-o", str(tmp_path / "v.png"),
                 "-x", "100", "-y", "50"])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "v.png").stat().st_size > 0
