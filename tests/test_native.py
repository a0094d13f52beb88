"""Native C++ runtime components (odgi_tpu/native)."""

import numpy as np
import pytest

from odgi_tpu.native import build, parse_gfa_native

FIXTURES = [
    "t.gfa",
    "DRB1-3123.gfa",
    "chr6.C4.gfa",
    "overlap.gfa",
    "k.gfa",
]


@pytest.fixture(scope="module", autouse=True)
def native_lib():
    so = build()
    if so is None:
        pytest.skip("native toolchain unavailable")
    return so


@pytest.mark.parametrize("fixture", FIXTURES)
def test_native_matches_python(fixture):
    from odgi_tpu.io import gfa

    path = f"/root/reference/test/{fixture}"
    gn = parse_gfa_native(path)
    with open(path, "rb") as f:
        gp = gfa.parse_gfa(f.read())  # bytes input bypasses native path
    for attr in [
        "node_len",
        "seq",
        "seq_offset",
        "node_id",
        "edge_from",
        "edge_to",
        "path_offset",
        "step_handle",
        "step_pos",
    ]:
        assert np.array_equal(getattr(gn, attr), getattr(gp, attr)), attr
    assert gn.path_names == gp.path_names


def test_native_error_on_missing_file():
    with pytest.raises(Exception):
        parse_gfa_native("/nonexistent/x.gfa")
