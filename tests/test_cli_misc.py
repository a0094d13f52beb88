

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


def test_position_server_resolves_encoded_paths(tmp_path):
    """The HTTP position server must URL-decode requests like the
    reference's cpp-httplib does (server_main.cpp:103-116): DRB1 path
    names contain '|' and ':' and arrive percent-encoded from standard
    clients.  Regression: the handler previously matched the encoded
    name and returned 0 for every real query."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import time
    import urllib.parse
    import urllib.request
    from pathlib import Path

    from odgi_tpu import parse_gfa
    from odgi_tpu.core.index import PathIndex

    g = parse_gfa("/root/reference/test/DRB1-3123.gfa")
    og = str(tmp_path / "srv.og")
    from odgi_tpu.io.og_compat import save_og

    save_og(g, og)
    # pick a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
    proc = subprocess.Popen(
        [_sys.executable, "-m", "odgi_tpu.cli", "server", "-i", og,
         "-p", str(port)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        name = g.path_names[0]
        q = urllib.parse.quote(name)
        idx = PathIndex.build(g)
        expect = idx.get_pangenome_pos(name, 0) + 1
        for _ in range(60):
            try:
                got = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/{q}/1", timeout=2
                ).read().decode()
                break
            except Exception:
                time.sleep(0.5)
        else:
            raise AssertionError("server did not come up")
        assert int(got) == expect and expect >= 1
        # unknown path still answers 0 like the reference
        got0 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/nope/1", timeout=2
        ).read().decode()
        assert got0 == "0"
    finally:
        proc.kill()
