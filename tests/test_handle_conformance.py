"""Handle-API conformance suite, ported from the reference's vg-derived
unit tests (reference: src/unittest/handle.cpp:26-2040), plus the
randomized fuzz builder (src/unittest/fuzz.cpp:21-100, scaled down),
exercised against the mutable compat graph (odgi_tpu/compat/odgi.py)
and its freeze/round-trip into GraphTensors and the .og codec.
"""

import numpy as np
import pytest

from odgi_tpu.compat.odgi import graph as Graph


def revcomp(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGTacgt", "TGCAtgca"))


@pytest.fixture()
def ten_node_graph():
    """The canonical 10-node conformance graph
    (handle.cpp:113-145): sequences, a doubly-reversing edge, and a
    diamond of forward edges."""
    g = Graph()
    seqs = [
        "CGA", "TTGG", "CCGT", "C", "GT",
        "GATAA", "CGG", "ACA", "GCCG", "ATATAAC",
    ]
    handles = [g.create_handle(s) for s in seqs]
    n = handles
    # doubly reversing edge n1- -> n0-  (toggle_bit on both)
    g.create_edge(g.flip(n[1]), g.flip(n[0]))
    for a, b in [(1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (5, 6),
                 (5, 8), (6, 7), (6, 8), (7, 9), (8, 9)]:
        g.create_edge(n[a], n[b])
    return g, handles, seqs


# --- "Each graph exposes the right nodes" (handle.cpp:150-186) -----------


def test_nodes_forward(ten_node_graph):
    g, handles, seqs = ten_node_graph
    for h, s in zip(handles, seqs):
        assert g.get_is_reverse(h) is False
        assert g.get_sequence(h) == s
        assert g.get_length(h) == len(s)
        assert g.get_handle(g.get_id(h)) == h


def test_nodes_reverse(ten_node_graph):
    g, handles, seqs = ten_node_graph
    for h, s in zip(handles, seqs):
        rev1 = g.flip(h)
        rev2 = g.get_handle(g.get_id(h), True)
        assert rev1 == rev2
        assert g.get_id(rev1) == g.get_id(h)
        assert g.get_is_reverse(rev1) is True
        assert g.get_sequence(rev1) == revcomp(s)
        assert g.get_length(rev1) == len(s)


def test_flip_and_forward_are_involutions(ten_node_graph):
    g, handles, _ = ten_node_graph
    for h in handles:
        assert g.flip(g.flip(h)) == h
        assert g.forward(g.flip(h)) == h
        assert g.forward(h) == h


# --- "Each graph exposes the right edges" (handle.cpp:190-226) -----------


def _follow(g, h, go_left):
    out = []
    g.follow_edges(h, go_left, lambda x: (out.append(x), True)[1])
    return out


def test_edges_unique_per_orientation(ten_node_graph):
    g, handles, _ = ten_node_graph
    for h in handles:
        for orientation in (False, True):
            hh = g.get_handle(g.get_id(h), orientation)
            nxt = _follow(g, hh, False)
            prv = _follow(g, hh, True)
            assert len(set(nxt)) == len(nxt)
            assert len(set(prv)) == len(prv)


def test_edge_iteratees_stop_early(ten_node_graph):
    g, handles, _ = ten_node_graph
    for h in handles:
        count = [0]

        def cb(x):
            count[0] += 1
            return False

        g.follow_edges(h, False, cb)
        assert count[0] <= 1
        count[0] = 0
        g.follow_edges(h, True, cb)
        assert count[0] <= 1


def test_edges_are_symmetric(ten_node_graph):
    """h2 in follow(h1, right) <=> h1 in follow(h2, left), including
    through the doubly-reversing edge."""
    g, handles, _ = ten_node_graph
    for h in handles:
        for orientation in (False, True):
            hh = g.get_handle(g.get_id(h), orientation)
            for nxt in _follow(g, hh, False):
                assert hh in _follow(g, nxt, True)
            for prv in _follow(g, hh, True):
                assert hh in _follow(g, prv, False)


def test_doubly_reversing_edge_canonicalized(ten_node_graph):
    """The n1- -> n0- edge equals n0 -> n1 (handle.cpp's 'doubly
    reversing edge to keep it interesting')."""
    g, n, _ = ten_node_graph
    assert g.has_edge(n[0], n[1])
    assert g.has_edge(g.flip(n[1]), g.flip(n[0]))
    assert n[1] in _follow(g, n[0], False)
    assert n[0] in _follow(g, n[1], True)


def test_degrees(ten_node_graph):
    g, n, _ = ten_node_graph
    assert g.get_degree(n[5], False) == 2  # n5 -> n6, n8
    assert g.get_degree(n[5], True) == 2   # n3, n4 -> n5
    assert g.get_degree(n[9], False) == 0
    assert g.get_degree(n[0], True) == 0


# --- "Deletable handle graphs work" (handle.cpp:353-580) -----------------


def test_empty_graph_has_no_nodes():
    g = Graph()
    assert g.get_node_count() == 0
    count = [0]
    g.for_each_handle(lambda h: count.__setitem__(0, count[0] + 1))
    assert count[0] == 0


def test_create_and_count_nodes():
    g = Graph()
    h = g.create_handle("GATTACA")
    assert g.get_is_reverse(h) is False
    assert g.get_sequence(h) == "GATTACA"
    assert g.get_handle(g.get_id(h)) == h
    h2 = g.create_handle("CATTAG")
    assert g.get_node_count() == 2
    assert g.min_node_id() <= g.get_id(h)
    assert g.max_node_id() >= g.get_id(h2)


def test_apply_orientation_flips_sequence():
    g = Graph()
    h = g.create_handle("GATTACA")
    modified = g.apply_orientation(g.flip(h))
    assert g.get_is_reverse(modified) is False
    assert g.get_sequence(modified) == revcomp("GATTACA")
    assert g.get_node_count() == 1


def test_apply_orientation_rewrites_edges_and_steps():
    g = Graph()
    a = g.create_handle("AA")
    b = g.create_handle("CC")
    g.create_edge(a, b)
    p = g.create_path_handle("p")
    g.append_step(p, a)
    g.append_step(p, b)
    g.apply_orientation(g.flip(b))
    # the edge survives with b flipped; the step is now reverse
    assert g.has_edge(a, g.flip(g.get_handle(g.get_id(b))))
    steps = []
    g.for_each_step_in_path(p, lambda s: steps.append(g.get_handle_of_step(s)))
    assert g.get_is_reverse(steps[1])
    assert g.get_sequence(steps[1]) == "CC"  # reverse of the flipped GG


def test_destroy_handle_removes_edges_and_steps():
    g = Graph()
    a = g.create_handle("AAA")
    b = g.create_handle("CCC")
    c = g.create_handle("GGG")
    g.create_edge(a, b)
    g.create_edge(b, c)
    p = g.create_path_handle("p")
    for h in (a, b, c):
        g.append_step(p, h)
    g.destroy_handle(b)
    assert g.get_node_count() == 2
    assert not g.has_edge(a, b)
    assert _follow(g, a, False) == []
    steps = []
    g.for_each_step_in_path(p, lambda s: steps.append(g.get_handle_of_step(s)))
    assert steps == [a, c]


def test_destroy_edge():
    g = Graph()
    a = g.create_handle("AAA")
    b = g.create_handle("CCC")
    g.create_edge(a, b)
    assert g.has_edge(a, b)
    g.destroy_edge(a, b)
    assert not g.has_edge(a, b)
    assert _follow(g, a, False) == []


def test_divide_handle_forward():
    """handle.cpp's divide cases: sequence is partitioned, parts are
    chained, paths are rewritten in place."""
    g = Graph()
    h = g.create_handle("GATTACA")
    before = g.create_handle("TTT")
    after = g.create_handle("CCC")
    g.create_edge(before, h)
    g.create_edge(h, after)
    p = g.create_path_handle("p")
    g.append_step(p, before)
    g.append_step(p, h)
    g.append_step(p, after)
    parts = g.divide_handle(h, [2, 5])
    assert [g.get_sequence(x) for x in parts] == ["GA", "TTA", "CA"]
    # chained + outer edges rerouted
    assert g.has_edge(before, parts[0])
    assert g.has_edge(parts[0], parts[1])
    assert g.has_edge(parts[1], parts[2])
    assert g.has_edge(parts[2], after)
    steps = []
    g.for_each_step_in_path(p, lambda s: steps.append(g.get_handle_of_step(s)))
    assert steps == [before] + list(parts) + [after]
    # total sequence is preserved along the path
    assert "".join(g.get_sequence(s) for s in steps) == "TTTGATTACACCC"


def test_divide_handle_reverse():
    g = Graph()
    h = g.create_handle("GATTACA")
    parts = g.divide_handle(g.flip(h), [1, 3])
    # parts are in the REVERSE strand's coordinates
    assert [g.get_sequence(x) for x in parts] == ["T", "GT", "AATC"]
    assert "".join(g.get_sequence(x) for x in parts) == revcomp("GATTACA")


def test_combine_handles_roundtrips_divide():
    g = Graph()
    h = g.create_handle("GATTACA")
    p = g.create_path_handle("p")
    g.append_step(p, h)
    parts = g.divide_handle(h, [3])
    combined = g.combine_handles(parts)
    assert g.get_sequence(combined) == "GATTACA"
    steps = []
    g.for_each_step_in_path(p, lambda s: steps.append(g.get_handle_of_step(s)))
    assert steps == [combined]


# --- path handle conformance (handle.cpp:1623-2040) ----------------------


@pytest.fixture()
def pathy_graph(ten_node_graph):
    g, n, _ = ten_node_graph
    p1 = g.create_path_handle("1")
    for i in (0, 1, 2, 4, 5):
        g.append_step(p1, n[i])
    p2 = g.create_path_handle("2")
    for i in (3, 5, 6, 7, 9):
        g.append_step(p2, n[i])
    p3 = g.create_path_handle("3")
    for i in (8, 5, 3):
        g.append_step(p3, g.flip(n[i]))
    return g, n, (p1, p2, p3)


def test_path_metadata(pathy_graph):
    g, n, (p1, p2, p3) = pathy_graph
    assert g.get_path_count() == 3
    for name, p in (("1", p1), ("2", p2), ("3", p3)):
        assert g.has_path(name)
        assert g.get_path_handle(name) == p
        assert g.get_path_name(p) == name
        assert not g.is_empty(p)
    assert not g.has_path("nope")
    assert g.get_step_count_of_path(p1) == 5
    assert g.get_step_count_of_path(p3) == 3


def test_step_navigation_forward(pathy_graph):
    g, n, (p1, _, _) = pathy_graph
    step = g.path_begin(p1)
    visited = []
    while True:
        visited.append(g.get_handle_of_step(step))
        if not g.has_next_step(step):
            break
        step = g.get_next_step(step)
    assert visited == [n[0], n[1], n[2], n[4], n[5]]
    # walking past the back gives path_end; stepping back returns
    assert g.get_next_step(step) == g.path_end(p1)
    assert g.get_previous_step(g.path_begin(p1)) == g.path_front_end(p1)


def test_step_navigation_reverse_path(pathy_graph):
    g, n, (_, _, p3) = pathy_graph
    step = g.path_back(p3)
    visited = []
    while True:
        visited.append(g.get_handle_of_step(step))
        if not g.has_previous_step(step):
            break
        step = g.get_previous_step(step)
    assert visited == [g.flip(n[3]), g.flip(n[5]), g.flip(n[8])]


def test_steps_on_handle(pathy_graph):
    g, n, (p1, p2, p3) = pathy_graph
    # n5 is visited by all three paths
    steps = g.steps_of_handle(g.get_handle(g.get_id(n[5])))
    assert len(steps) == 3
    assert {g.get_path_handle_of_step(s) for s in steps} == {p1, p2, p3}
    assert g.get_step_count(n[5]) == 3
    assert g.get_step_count(n[0]) == 1


def test_path_rewrites(pathy_graph):
    g, n, (p1, _, _) = pathy_graph
    # prepend + set_step + insert + destroy path
    g.prepend_step(p1, n[9])
    steps = []
    g.for_each_step_in_path(p1, lambda s: steps.append(g.get_handle_of_step(s)))
    assert steps[0] == n[9]
    st = g.path_begin(p1)
    g.set_step(st, n[8])
    steps = []
    g.for_each_step_in_path(p1, lambda s: steps.append(g.get_handle_of_step(s)))
    assert steps[0] == n[8]
    g.destroy_path(p1)
    assert not g.has_path("1")
    assert g.get_path_count() == 2


def test_circular_path_navigation(ten_node_graph):
    g, n, _ = ten_node_graph
    p = g.create_path_handle("circ", is_circular=True)
    for i in (0, 1, 2):
        g.append_step(p, n[i])
    assert g.get_is_circular(p)
    back = g.path_back(p)
    assert g.has_next_step(back)
    assert g.get_handle_of_step(g.get_next_step(back)) == n[0]
    begin = g.path_begin(p)
    assert g.has_previous_step(begin)
    assert g.get_handle_of_step(g.get_previous_step(begin)) == n[2]


# --- fuzz: randomized build + validate + round-trips ---------------------
# (reference: src/unittest/fuzz.cpp:21-100, scaled to CI size)


def test_fuzz_random_graph_with_high_path_depth(tmp_path):
    rng = np.random.default_rng(87)
    g = Graph()
    num_handles = 400
    handles = []
    for i in range(num_handles):
        s = "ACGT"[int(rng.integers(0, 4))] * int(rng.integers(1, 40))
        h = g.create_handle(s)
        assert g.get_sequence(h) == s
        handles.append(h)
    for ha in handles:
        for _ in range(int(rng.integers(1, 4))):
            hb = g.get_handle(int(rng.integers(1, num_handles + 1)))
            g.create_edge(ha, hb)
            assert g.has_edge(ha, hb)
        for _ in range(int(rng.integers(1, 4))):
            hb = g.get_handle(int(rng.integers(1, num_handles + 1)))
            g.create_edge(g.flip(ha), hb)
            assert g.has_edge(g.flip(ha), hb)
    # high path depth: 10 paths x 400 random steps; edges created along
    # the walks so validate() passes
    for pi in range(10):
        p = g.create_path_handle(str(pi))
        last = None
        for _ in range(400):
            occ = handles[int(rng.integers(0, num_handles))]
            if bool(rng.integers(0, 2)):
                occ = g.flip(occ)
            if last is not None and not g.has_edge(last, occ):
                g.create_edge(last, occ)
            g.append_step(p, occ)
            last = occ
        assert g.get_step_count_of_path(g.get_path_handle(str(pi))) == 400

    # freeze to GraphTensors: structure validates and step counts agree
    t = g.freeze()
    assert t.num_nodes == num_handles
    assert t.num_paths == 10
    assert t.num_steps == 4000
    assert t.validate() == []

    # .og round trip preserves everything (write from tensors, reload)
    from odgi_tpu.io.og_compat import load_og, save_og

    path = str(tmp_path / "fuzz.og")
    save_og(t, path)
    t2 = load_og(path)
    assert t2.num_nodes == t.num_nodes
    assert t2.num_steps == t.num_steps
    assert np.array_equal(t2.step_handle, t.step_handle)
    assert np.array_equal(t2.node_len, t.node_len)
    assert t2.path_names == t.path_names


def test_fuzz_divide_apply_destroy_stays_consistent():
    """Randomized mutation storm: divide/apply_orientation/destroy_edge
    interleaved; the graph must stay internally consistent (every step's
    handle resolves, path sequences only change at divides in the
    expected conservative way)."""
    rng = np.random.default_rng(5)
    g = Graph()
    handles = [g.create_handle("ACGTACGT") for _ in range(40)]
    for i in range(39):
        g.create_edge(handles[i], handles[i + 1])
    p = g.create_path_handle("p")
    for h in handles:
        g.append_step(p, h)

    def path_seq():
        out = []
        g.for_each_step_in_path(
            p, lambda s: out.append(g.get_sequence(g.get_handle_of_step(s)))
        )
        return "".join(out)

    ref = path_seq()
    for _ in range(30):
        op = int(rng.integers(0, 3))
        nid = int(rng.choice(sorted(g._seqs.keys())))
        h = g.get_handle(nid)
        if op == 0 and g.get_length(h) >= 2:
            g.divide_handle(h, [g.get_length(h) // 2])
        elif op == 1:
            g.apply_orientation(g.flip(h))
        else:
            nxt = _follow(g, h, False)
            if nxt:
                g.destroy_edge(h, nxt[0])
        assert path_seq() == ref  # mutations preserve embedded sequence
    t = g.freeze()
    assert t.num_steps == g.get_step_count_of_path(p)
