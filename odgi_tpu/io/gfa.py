"""GFA v1 reader/writer for GraphTensors.

Replaces the reference's two-pass mmap'd gfakluge parse
(reference: src/gfa_to_handle.cpp:5-120) with a single-pass line parse into
the host-side builder, then one vectorized freeze.  Unlike the reference we
do NOT require integer segment names (reference errors on non-integers at
src/gfa_to_handle.cpp:76-80); non-integer names are assigned dense ids but
integer names are preserved so round-trips match odgi's behavior.
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, TextIO, Tuple, Union

import numpy as np

from ..core.graph import GraphBuilder, GraphTensors, handle_is_reverse, handle_rank


def parse_gfa(source: Union[str, TextIO, bytes]) -> GraphTensors:
    """Parse a GFAv1 file/path/bytes into GraphTensors.

    S lines become nodes (sorted by id as in odgi's ingest, which creates
    nodes in id order via the min-id offset; reference:
    src/gfa_to_handle.cpp:40-80), L lines edges, P/W lines embedded paths.
    """
    if isinstance(source, bytes):
        lines = source.splitlines()
    elif isinstance(source, str):
        from ..native import parse_gfa_native

        g = parse_gfa_native(source)
        if g is not None:
            return g
        with open(source, "rb") as f:
            data = f.read()
        lines = data.splitlines()
    else:
        data = source.read()
        if isinstance(data, str):
            data = data.encode()
        lines = data.splitlines()

    seg_names: List[bytes] = []
    seg_seqs: List[bytes] = []
    name_map: Dict[bytes, int] = {}
    edges: List[Tuple[bytes, bool, bytes, bool]] = []
    paths: List[Tuple[bytes, List[Tuple[bytes, bool]], bool]] = []

    def seg_id(name: bytes) -> int:
        """Map segment name to integer id (integer names pass through)."""
        sid = name_map.get(name)
        if sid is None:
            try:
                sid = int(name)
            except ValueError:
                sid = -1  # resolved after scan for synthetic naming
            name_map[name] = sid
        return sid

    for ln in lines:
        if not ln:
            continue
        t = ln[0:1]
        if t == b"S":
            parts = ln.split(b"\t")
            name, seq = parts[1], parts[2]
            seg_id(name)
            seg_names.append(name)
            seg_seqs.append(seq)
        elif t == b"L":
            parts = ln.split(b"\t")
            edges.append(
                (parts[1], parts[2] == b"-", parts[3], parts[4] == b"-")
            )
        elif t == b"P":
            parts = ln.split(b"\t")
            pname = parts[1]
            steps = []
            for tok in parts[2].split(b","):
                if tok:
                    steps.append((tok[:-1], tok.endswith(b"-")))
            paths.append((pname, steps, False))
        elif t == b"W":
            # W <sample> <hap> <seq> <start> <end> <walk>
            parts = ln.split(b"\t")
            pname = b"#".join([parts[1], parts[2], parts[3]])
            if parts[4] != b"*" and parts[4] != b"0":
                pname += b":" + parts[4] + b"-" + parts[5]
            walk = parts[6]
            steps = []
            i = 0
            cur_rev = False
            cur = bytearray()
            for ch in walk:
                if ch in (0x3E, 0x3C):  # '>' '<'
                    if cur:
                        steps.append((bytes(cur), cur_rev))
                        cur = bytearray()
                    cur_rev = ch == 0x3C
                else:
                    cur.append(ch)
            if cur:
                steps.append((bytes(cur), cur_rev))
            paths.append((pname, steps, False))

    # Assign synthetic ids to non-integer names: dense above current max.
    int_ids = [v for v in name_map.values() if v >= 0]
    next_id = (max(int_ids) + 1) if int_ids else 1
    for name in name_map:
        if name_map[name] < 0:
            name_map[name] = next_id
            next_id += 1

    # Build nodes in id order (odgi creates handles by id; the node rank
    # order equals id order for a fresh ingest).
    named = sorted(zip(seg_names, seg_seqs), key=lambda kv: name_map[kv[0]])
    b = GraphBuilder()
    for name, seq in named:
        b.add_node(name_map[name], bytes(seq))
    for na, ra, nb, rb in edges:
        b.add_edge(name_map[na], ra, name_map[nb], rb)
    for pname, steps, circ in paths:
        pi = b.add_path(pname.decode("utf-8"), circ)
        for sname, srev in steps:
            b.append_step(pi, name_map[sname], srev)
    return b.build()


def write_gfa(g: GraphTensors, out: Union[str, TextIO]) -> None:
    """Write GraphTensors as GFAv1 (the `odgi view -g` analog).

    Emits H, S (in rank order), L (canonical order), P lines.
    """
    close = False
    if isinstance(out, str):
        out = open(out, "w")
        close = True
    try:
        out.write("H\tVN:Z:1.0\n")
        ids = g.node_id
        for r in range(g.num_nodes):
            out.write(f"S\t{int(ids[r])}\t{g.node_seq_str(r)}\n")
        ef, et = g.edge_from, g.edge_to
        for k in range(g.num_edges):
            a, bb = int(ef[k]), int(et[k])
            out.write(
                "L\t%d\t%s\t%d\t%s\t0M\n"
                % (
                    int(ids[a >> 1]),
                    "-" if a & 1 else "+",
                    int(ids[bb >> 1]),
                    "-" if bb & 1 else "+",
                )
            )
        for p in range(g.num_paths):
            lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
            toks = []
            for h in g.step_handle[lo:hi]:
                h = int(h)
                toks.append(f"{int(ids[h >> 1])}{'-' if h & 1 else '+'}")
            out.write(f"P\t{g.path_names[p]}\t{','.join(toks)}\t*\n")
    finally:
        if close:
            out.close()
