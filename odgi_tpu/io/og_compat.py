"""Bit-compatible reader/writer for the reference's ``.og`` graph container.

The reference serializes its dynamic succinct graph as (reference:
src/odgi.cpp:1632-1686 ``serialize_members``, magic ``1988148666`` written
big-endian by libhandlegraph's ``SerializableHandleGraph``):

  [u32be magic] [u64 max_node_id] [u64 min_node_id] [u64 node_count]
  [u64 edge_count] [u64 path_count] [u64 path_handle_next] [u64 id_increment]
  node records x node_count, then path_count metadata records of
  [u64 length] [2x u64 first step handle] [2x u64 last step handle]
  [u64 name_len] [name bytes]

Each node record (reference: src/node.cpp:422-436 ``node_t::serialize``):
  [u64 seq_len] [seq] [u64 id] [edges vec] [decoding vec] [paths vec]

where each vector is a serialized ``dyn::hacked_vector`` (the DYNAMIC dep is
not present in the snapshot; this wire format was reverse-engineered from
``test/DRB1-3123_sorted.og`` and verified over all 3214 node records):

  [u64 n_words] [n_words x u64 LE words] [u64 MASK] [u64 size]
  [u8 width] [u8 ints_per_word]

with ``ints_per_word = 64 // width``, ``MASK = (1 << width) - 1``, and
element ``j`` packed LSB-first at bits ``(j % ipw) * width`` of word
``j // ipw`` (no prefix-sum field -- the "hacked" vector drops psum).

Record semantics (reference: src/node.cpp, src/node.hpp):
  - edges: flat pairs ``[other_id, type]`` with raw neighbor ids and
    ``type = other_rev | on_rev << 1 | to_curr << 2``
    (edge_helper::pack, src/node.hpp:54-67; filled by create_edge,
    src/odgi.cpp:613-659: the left side stores to_curr=0, the right side
    to_curr=1, self-loops only once with to_curr=0).
  - decoding: per-node first-use dictionary of delta-encoded neighbor ids,
    ``delta = 0`` for self else ``(|other-id| << 1) | (other > id)``
    (to_delta/from_delta, src/node.hpp:34-51).
  - paths: 6-int records ``[path_id_1based, flags, prev_idx, prev_rank,
    next_idx, next_rank]`` where flags =
    ``is_rev | is_start << 1 | is_end << 2 | is_del << 3``
    (step_type_helper, src/node.hpp:68-85), prev/next_idx index the
    decoding dictionary, and ranks are node-local step ranks -- steps form
    doubly-linked lists across nodes (add_path_step, src/node.cpp:96-108).

Path metadata ``first``/``last`` are step handles = (node handle, node-local
rank) with node handle = ``(id - 1 - id_increment) << 1 | is_rev``
(number_bool_packing; get_handle src/odgi.cpp:30-38).  Path circularity is
NOT serialized (path_metadata_t, src/odgi.hpp:457-464 -- the atomic bool is
skipped by serialize_members), matching reference behavior.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, List, Tuple, Union

import numpy as np

from ..core.graph import GraphTensors

OG_MAGIC_BE = struct.pack(">I", 1988148666)


# ---------------------------------------------------------------------------
# hacked_vector codec
# ---------------------------------------------------------------------------


def _read_hacked_vector(buf: memoryview, p: int) -> Tuple[np.ndarray, int]:
    (n_words,) = struct.unpack_from("<Q", buf, p)
    p += 8
    words = np.frombuffer(buf, dtype="<u8", count=n_words, offset=p)
    p += 8 * n_words
    mask, size = struct.unpack_from("<2Q", buf, p)
    p += 16
    width, ipw = struct.unpack_from("<2B", buf, p)
    p += 2
    if size == 0:
        return np.zeros(0, dtype=np.int64), p
    if width == 0 or ipw == 0:
        raise ValueError("corrupt hacked_vector: zero width with nonzero size")
    shifts = (np.arange(ipw, dtype=np.uint64) * np.uint64(width))[None, :]
    slots = (words[:, None] >> shifts) & np.uint64(mask)
    return slots.ravel()[:size].astype(np.int64), p


def _write_hacked_vector(out: BinaryIO, values: np.ndarray) -> None:
    values = np.asarray(values, dtype=np.uint64)
    size = len(values)
    width = max(1, int(values.max()).bit_length()) if size else 1
    ipw = 64 // width
    mask = (1 << width) - 1
    n_words = -(-size // ipw) if size else 0
    padded = np.zeros(n_words * ipw, dtype=np.uint64)
    padded[:size] = values
    shifts = (np.arange(ipw, dtype=np.uint64) * np.uint64(width))[None, :]
    words = (padded.reshape(n_words, ipw) << shifts).sum(
        axis=1, dtype=np.uint64
    )
    out.write(struct.pack("<Q", n_words))
    out.write(words.astype("<u8").tobytes())
    out.write(struct.pack("<2Q2B", mask, size, width, ipw))


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def load_og(src: Union[str, bytes, BinaryIO]) -> GraphTensors:
    """Load a reference ``.og`` file into GraphTensors.

    Reconstructs the flattened step tensor by walking every embedded path's
    doubly-linked step list in lockstep (all paths advance one step per
    numpy-gather iteration), replacing the reference's per-step pointer
    chases (graph_t::get_next_step, src/odgi.cpp:394-430).
    """
    if isinstance(src, str):
        with open(src, "rb") as f:
            data = f.read()
    elif isinstance(src, bytes):
        data = src
    else:
        data = src.read()
    buf = memoryview(data)
    if bytes(buf[:4]) != OG_MAGIC_BE:
        raise ValueError("not a reference .og file (bad magic)")
    (
        _max_id,
        _min_id,
        node_count,
        edge_count,
        path_count,
        _path_next,
        id_increment,
    ) = struct.unpack_from("<7Q", buf, 4)
    p = 4 + 7 * 8

    seqs: List[bytes] = []
    node_ids = np.zeros(node_count, dtype=np.int64)
    edges_per_node: List[np.ndarray] = []
    # flattened per-node paths records + decoding dicts for the lockstep walk
    paths_flat: List[np.ndarray] = []
    dec_flat: List[np.ndarray] = []
    for i in range(node_count):
        (seq_len,) = struct.unpack_from("<Q", buf, p)
        p += 8
        seqs.append(bytes(buf[p : p + seq_len]))
        p += seq_len
        (nid,) = struct.unpack_from("<Q", buf, p)
        p += 8
        node_ids[i] = nid
        ev, p = _read_hacked_vector(buf, p)
        dv, p = _read_hacked_vector(buf, p)
        pv, p = _read_hacked_vector(buf, p)
        edges_per_node.append(ev)
        dec_flat.append(dv)
        paths_flat.append(pv)

    # node id -> rank
    id_to_rank = {int(nid): r for r, nid in enumerate(node_ids)}

    node_len = np.array([len(s) for s in seqs], dtype=np.int64)
    seq = np.frombuffer(b"".join(seqs), dtype=np.uint8).copy()
    seq_offset = np.zeros(node_count + 1, dtype=np.int64)
    np.cumsum(node_len, out=seq_offset[1:])

    # ---- edges: emit each edge once from its to_curr=0 record ----
    ef: List[int] = []
    et: List[int] = []
    for i, ev in enumerate(edges_per_node):
        if len(ev) == 0:
            continue
        other = ev[0::2]
        etype = ev[1::2]
        on_rev = (etype >> 1) & 1
        other_rev = etype & 1
        to_curr = (etype >> 2) & 1
        sel = to_curr == 0
        for oid, orv, srv in zip(other[sel], other_rev[sel], on_rev[sel]):
            ef.append((i << 1) | int(srv))
            et.append((id_to_rank[int(oid)] << 1) | int(orv))
    edge_from = np.array(ef, dtype=np.int64)
    edge_to = np.array(et, dtype=np.int64)

    # ---- paths: metadata then lockstep linked-list walk ----
    path_names: List[str] = []
    path_len = np.zeros(path_count, dtype=np.int64)
    first_node = np.zeros(path_count, dtype=np.int64)  # node rank
    first_rank = np.zeros(path_count, dtype=np.int64)  # node-local step rank
    for j in range(path_count):
        (length, f_handle, f_rank, _l_handle, _l_rank, name_len) = (
            struct.unpack_from("<6Q", buf, p)
        )
        p += 48
        name = bytes(buf[p : p + name_len]).decode()
        p += name_len
        path_names.append(name)
        path_len[j] = length
        fid = (f_handle >> 1) + 1 + id_increment  # id of first node
        first_node[j] = id_to_rank[int(fid)]
        first_rank[j] = f_rank

    # flatten per-node records for vectorized gathers
    prec_off = np.zeros(node_count + 1, dtype=np.int64)
    np.cumsum([len(v) for v in paths_flat], out=prec_off[1:])
    prec = (
        np.concatenate(paths_flat)
        if paths_flat
        else np.zeros(0, dtype=np.int64)
    )
    dec_off = np.zeros(node_count + 1, dtype=np.int64)
    np.cumsum([len(v) for v in dec_flat], out=dec_off[1:])
    dec = np.concatenate(dec_flat) if dec_flat else np.zeros(0, dtype=np.int64)

    total_steps = int(path_len.sum())
    step_handle = np.zeros(total_steps, dtype=np.int64)
    path_offset = np.zeros(path_count + 1, dtype=np.int64)
    np.cumsum(path_len, out=path_offset[1:])

    cur_node = first_node.copy()
    cur_rank = first_rank.copy()
    cursor = path_offset[:-1].copy()
    active = path_len > 0
    max_len = int(path_len.max()) if path_count else 0
    for _ in range(max_len):
        if not active.any():
            break
        n = cur_node[active]
        r = cur_rank[active]
        base = prec_off[n] + 6 * r
        pid = prec[base]  # 1-based path id
        if not np.array_equal(pid - 1, np.flatnonzero(active)):
            raise ValueError(".og path linked list: path id mismatch")
        flags = prec[base + 1]
        is_rev = flags & 1
        is_end = (flags >> 2) & 1
        step_handle[cursor[active]] = (n << 1) | is_rev
        # advance to next step via delta decode
        nxt_idx = prec[base + 4]
        nxt_rank = prec[base + 5]
        delta = dec[dec_off[n] + nxt_idx]
        nid = node_ids[n]
        other = np.where(
            delta == 0, nid, np.where(delta & 1, nid + (delta >> 1), nid - (delta >> 1))
        )
        nxt_node = np.array([id_to_rank[int(x)] for x in other], dtype=np.int64)
        cursor[active] += 1
        still = is_end == 0
        idx = np.flatnonzero(active)
        cur_node[idx] = nxt_node
        cur_rank[idx] = nxt_rank
        active[idx[still == 0]] = False
    if not np.array_equal(cursor, path_offset[1:]):
        raise ValueError(".og path walk did not consume declared step counts")

    # step positions: cumulative node lengths along each path
    lens = node_len[step_handle >> 1]
    step_pos = np.zeros(total_steps, dtype=np.int64)
    cum = np.cumsum(lens)
    step_pos[1:] = cum[:-1]
    step_pos -= np.repeat(step_pos[path_offset[:-1]], path_len)

    return GraphTensors(
        node_len=node_len,
        seq_offset=seq_offset,
        seq=seq,
        node_id=node_ids,
        edge_from=edge_from,
        edge_to=edge_to,
        path_names=tuple(path_names),
        path_circular=np.zeros(path_count, dtype=bool),
        path_offset=path_offset,
        step_handle=step_handle,
        step_pos=step_pos,
    )


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def save_og(g: GraphTensors, out: Union[str, BinaryIO]) -> None:
    """Write GraphTensors as a reference-loadable ``.og`` file.

    Vector widths are chosen minimally (the reference reader honors the
    stored width, so byte-identity with a reference-produced file is not
    required -- loadability is).  Node-local step ranks are assigned in
    path-major step order, mirroring construction by sequential
    append_step (src/odgi.cpp:1281-1310).
    """
    close = False
    if isinstance(out, str):
        out = open(out, "wb")
        close = True
    try:
        N = g.num_nodes
        P = g.num_paths
        S = g.num_steps
        node_ids = g.node_id.astype(np.int64)
        out.write(OG_MAGIC_BE)
        out.write(
            struct.pack(
                "<7Q",
                int(node_ids.max()) if N else 0,
                int(node_ids.min()) if N else 0,
                N,
                g.num_edges,
                P,
                P,
                0,
            )
        )

        # node-local rank assignment, path-major order
        ranks = g.step_handle >> 1
        revs = g.step_handle & 1
        local_rank = np.zeros(S, dtype=np.int64)
        counts = np.zeros(N, dtype=np.int64)
        order = np.arange(S)
        # stable counting: local rank = number of prior steps on same node
        import collections

        seen = collections.defaultdict(int)
        for s in range(S):
            n = int(ranks[s])
            local_rank[s] = seen[n]
            seen[n] += 1
            counts[n] += 1

        # per-node step record lists
        step_rank_in_path = g.step_rank
        path_of_step = g.step_path
        pc = g.path_step_count

        node_paths: List[List[int]] = [[] for _ in range(N)]
        node_dec: List[dict] = [dict() for _ in range(N)]

        def encode(n: int, other_id: int) -> int:
            nid = int(node_ids[n])
            delta = (
                0
                if other_id == nid
                else (
                    ((other_id - nid) << 1) | 1
                    if other_id > nid
                    else ((nid - other_id) << 1)
                )
            )
            d = node_dec[n]
            if delta not in d:
                d[delta] = len(d)
            return d[delta]

        for s in range(S):
            n = int(ranks[s])
            pidx = int(path_of_step[s])
            r = int(step_rank_in_path[s])
            is_start = r == 0
            is_end = r == pc[pidx] - 1
            if is_start:
                prev_idx, prev_rank = encode(n, int(node_ids[n])), 0
            else:
                prev_idx = encode(n, int(node_ids[ranks[s - 1]]))
                prev_rank = int(local_rank[s - 1])
            if is_end:
                next_idx, next_rank = encode(n, int(node_ids[n])), 0
            else:
                next_idx = encode(n, int(node_ids[ranks[s + 1]]))
                next_rank = int(local_rank[s + 1])
            flags = int(revs[s]) | (int(is_start) << 1) | (int(is_end) << 2)
            node_paths[n].extend(
                [pidx + 1, flags, prev_idx, prev_rank, next_idx, next_rank]
            )

        # per-node edge lists (both sides; self-loops once)
        node_edges: List[List[int]] = [[] for _ in range(N)]
        for fh, th in zip(g.edge_from, g.edge_to):
            fn, fr = int(fh) >> 1, int(fh) & 1
            tn, tr = int(th) >> 1, int(th) & 1
            node_edges[fn].extend([int(node_ids[tn]), tr | (fr << 1)])
            if fn != tn:
                node_edges[tn].extend(
                    [int(node_ids[fn]), fr | (tr << 1) | 4]
                )

        for n in range(N):
            sq = g.node_seq(n)
            out.write(struct.pack("<Q", len(sq)))
            out.write(sq)
            out.write(struct.pack("<Q", int(node_ids[n])))
            _write_hacked_vector(out, np.array(node_edges[n], dtype=np.uint64))
            dec_list = list(node_dec[n].keys())
            _write_hacked_vector(out, np.array(dec_list, dtype=np.uint64))
            _write_hacked_vector(out, np.array(node_paths[n], dtype=np.uint64))

        # path metadata
        po = g.path_offset
        for j in range(P):
            length = int(pc[j])
            if length:
                f_s = int(po[j])
                l_s = int(po[j + 1]) - 1
                f_handle = int(g.step_handle[f_s])
                l_handle = int(g.step_handle[l_s])
                f_rank = int(local_rank[f_s])
                l_rank = int(local_rank[l_s])
            else:
                f_handle = l_handle = f_rank = l_rank = 0
            name = g.path_names[j].encode()
            out.write(
                struct.pack(
                    "<6Q", length, f_handle, f_rank, l_handle, l_rank, len(name)
                )
            )
            out.write(name)
    finally:
        if close:
            out.close()
