"""Reference bindings compatibility: compat.odgi + compat.odgi_ffi.

Mirrors the reference FFI walkthrough (reference: test/python/odgi_ffi.md)
and the pybind11 class API (reference: src/pythonmodule.cpp).
"""

import numpy as np
import pytest

from odgi_tpu.compat import odgi
from odgi_tpu.compat.odgi_ffi import *  # noqa: F401,F403

OG = "/root/reference/test/DRB1-3123_sorted.og"


@pytest.fixture(scope="module")
def g():
    gr = odgi.graph()
    gr.load(OG)
    return gr


def test_ffi_walkthrough(g):
    # the odgi_ffi.md doctest numbers (test/python/odgi_ffi.md:27-40)
    assert odgi_get_node_count(g) == 3214
    assert odgi_get_path_count(g) == 12
    assert odgi_max_node_id(g) == 3214
    assert odgi_min_node_id(g) == 1


def test_handles(g):
    h = g.get_handle(1)
    assert g.get_id(h) == 1
    assert not g.get_is_reverse(h)
    assert g.get_is_reverse(g.flip(h))
    assert g.get_length(h) == len(g.get_sequence(h))
    assert g.get_sequence(h)[:4] == "ATTT"
    # revcomp sequence on flipped handle
    fwd = g.get_sequence(h)
    rev = g.get_sequence(g.flip(h))
    comp = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
    assert rev == "".join(comp[c] for c in reversed(fwd))


def test_path_iteration(g):
    names = []
    g.for_each_path_handle(lambda p: names.append(g.get_path_name(p)))
    assert len(names) == 12
    assert names[0].startswith("gi|")
    p = g.get_path_handle(names[0])
    step = g.path_begin(p)
    count = 1
    while g.has_next_step(step):
        step = g.get_next_step(step)
        if g.is_path_end(step):
            break
        count += 1
    assert count == len(g._paths[p]["steps"])


def test_follow_edges(g):
    h = g.get_handle(1)
    out = []
    g.follow_edges(h, False, lambda nh: (out.append(g.get_id(nh)), True)[1])
    assert sorted(out) == [60, 70]  # node 1's forward neighbors in the fixture


def test_mutation_roundtrip(tmp_path):
    gr = odgi.graph()
    h1 = gr.create_handle("ACGT")
    h2 = gr.create_handle("TTG")
    h3 = gr.create_handle("CC")
    gr.create_edge(h1, h2)
    gr.create_edge(h2, h3)
    p = gr.create_path_handle("p")
    gr.append_step(p, h1)
    gr.append_step(p, h2)
    gr.append_step(p, h3)
    assert gr.get_node_count() == 3
    assert gr.has_edge(h1, h2)
    t = gr.freeze()
    assert t.num_steps == 3
    assert t.validate() == []
    out = str(tmp_path / "x.og")
    gr.serialize(out)
    g2 = odgi.graph()
    g2.load(out)
    assert g2.get_node_count() == 3
    assert g2.get_sequence(g2.get_handle(1)) == "ACGT"


def test_divide_handle():
    gr = odgi.graph()
    h = gr.create_handle("ACGTACGT")
    p = gr.create_path_handle("p")
    gr.append_step(p, h)
    parts = gr.divide_handle(h, [3, 5])
    assert [gr.get_sequence(x) for x in parts] == ["ACG", "TA", "CGT"]
    t = gr.freeze()
    assert t.num_nodes == 3
    assert t.num_steps == 3
    assert t.validate() == []


def test_apply_orientation():
    gr = odgi.graph()
    h1 = gr.create_handle("AC")
    h2 = gr.create_handle("GG")
    gr.create_edge(h1, gr.flip(h2))
    p = gr.create_path_handle("p")
    gr.append_step(p, h1)
    gr.append_step(p, gr.flip(h2))
    h2f = gr.apply_orientation(gr.flip(h2))
    assert gr.get_sequence(h2f) == "CC"
    t = gr.freeze()
    assert t.validate() == []
    assert t.num_steps == 2
