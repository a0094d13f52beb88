

def test_layout_metrics_and_profile(tmp_path):
    """--metrics writes per-iteration JSONL; --profile writes a trace dir
    (SURVEY §5 observability; round-3 verdict #10)."""
    import json
    import subprocess
    import sys

    import os

    mfile = tmp_path / "m.jsonl"
    tdir = tmp_path / "trace"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "odgi_tpu.cli", "layout",
         "-i", "/root/reference/test/t.gfa", "-o", str(tmp_path / "t.lay"),
         "--metrics", str(mfile), "--profile", str(tdir), "-x", "4"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    lines = [json.loads(l) for l in mfile.read_text().splitlines()]
    iters = [l for l in lines if l["kind"] == "layout2d"]
    assert len(iters) >= 3 and "delta_max" in iters[-1]
    assert lines[-1]["kind"] == "layout2d_summary"
    assert any(tdir.rglob("*.trace.json.gz")) or any(tdir.rglob("*.xplane.pb"))
