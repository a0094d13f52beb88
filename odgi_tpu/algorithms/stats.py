"""Graph summary and sorting-goodness metrics, fully vectorized.

Reproduces the formulas of `odgi stats` (reference:
src/subcommand/stats_main.cpp:226 summary; :399-780 sorting-goodness;
:816-905 weighted feedback arcs / reversing joins) as numpy segment ops over
the flattened step tensor instead of per-step callbacks.  All metrics operate
on consecutive step pairs within each path; we build the pair index once and
reduce with np.bincount per path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from ..core.graph import GraphTensors, handle_is_reverse, handle_rank


def summary(g: GraphTensors) -> Dict[str, int]:
    """#length nodes edges paths steps (reference: stats_main.cpp:226-228)."""
    return {
        "length": g.total_length,
        "nodes": g.num_nodes,
        "edges": g.num_edges,
        "paths": g.num_paths,
        "steps": g.num_steps,
    }


def base_content(g: GraphTensors) -> Dict[str, int]:
    """Counts of each base character (reference: stats_main.cpp -b)."""
    counts = np.bincount(g.seq, minlength=256)
    out = {}
    for ch in b"ACGTN":
        c = int(counts[ch]) + int(counts[ch + 32])  # upper + lower case
        if c:
            out[chr(ch)] = c
    return out


def _consecutive_pairs(g: GraphTensors) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(first_step_idx, second_step_idx, path_of_pair) for every consecutive
    step pair in every path.  Pairs never cross path boundaries."""
    S = g.num_steps
    if S == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e.astype(np.int32)
    is_last = np.zeros(S, dtype=bool)
    is_last[g.path_offset[1:] - 1] = True  # last step of each nonempty path
    a = np.nonzero(~is_last)[0]
    return a, a + 1, g.step_path[a]


@dataclass
class MeanLinksLength:
    per_path_node_space: np.ndarray
    per_path_nt_space: np.ndarray
    per_path_2d: Optional[np.ndarray]
    per_path_num_links: np.ndarray
    per_path_num_gap_links: np.ndarray
    all_node_space: float
    all_nt_space: float
    all_2d: Optional[float]
    all_num_links: int
    all_num_gap_links: int


def mean_links_length(
    g: GraphTensors,
    xy: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    penalize_gap_links: bool = True,
) -> MeanLinksLength:
    """Mean links length in 1D (node/nt space) or 2D given layout coords.

    1D (reference: stats_main.cpp:488-523): for each consecutive step pair,
    the link leaves the end (start if reverse) of the first node and enters
    the start (end if reverse) of the second; distance measured between those
    rank-boundary positions via the cumulative position map.  A "gap link"
    connects sort-adjacent node occurrences within the path's own ordered
    node set and can be excluded (-g).

    2D (reference: stats_main.cpp:517-523): Euclidean distance between the
    layout endpoints X/Y[2*rank + is_rev].
    """
    P = g.num_paths
    ai, bi, pair_path = _consecutive_pairs(g)
    ha, hb = g.step_handle[ai], g.step_handle[bi]
    ra, rb = handle_rank(ha), handle_rank(hb)
    reva, revb = handle_is_reverse(ha), handle_is_reverse(hb)

    num_links = np.bincount(pair_path, minlength=P).astype(np.int64)

    # Gap-link detection (only used when not penalizing): a link is a gap
    # link iff the second node is the successor of the first in the path's
    # ordered set of distinct node ranks (reference: stats_main.cpp:488-510).
    if not penalize_gap_links:
        gap_mask = np.zeros(len(ai), dtype=bool)
        for p in range(P):
            lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
            ranks_in_path = np.unique(handle_rank(g.step_handle[lo:hi]))
            sel = pair_path == p
            ia = np.searchsorted(ranks_in_path, ra[sel])
            ib = np.searchsorted(ranks_in_path, rb[sel])
            gap_mask[sel] = ib == ia + 1
        use = ~gap_mask
    else:
        gap_mask = np.zeros(len(ai), dtype=bool)
        use = np.ones(len(ai), dtype=bool)

    num_gap_links = np.bincount(pair_path[gap_mask], minlength=P).astype(np.int64)

    if xy is not None:
        X, Y = xy
        ia = 2 * ra + reva
        ib = 2 * rb + revb
        d = np.hypot(X[ia] - X[ib], Y[ia] - Y[ib])
        d = np.where(use, d, 0.0)
        sum_2d = np.bincount(pair_path, weights=d, minlength=P)
        with np.errstate(invalid="ignore", divide="ignore"):
            per_2d = np.where(num_links > 0, sum_2d / num_links, 0.0)
        all_links = int(num_links.sum())
        return MeanLinksLength(
            per_path_node_space=np.zeros(P),
            per_path_nt_space=np.zeros(P),
            per_path_2d=per_2d,
            per_path_num_links=num_links,
            per_path_num_gap_links=num_gap_links,
            all_node_space=0.0,
            all_nt_space=0.0,
            all_2d=float(sum_2d.sum() / all_links) if all_links else 0.0,
            all_num_links=all_links,
            all_num_gap_links=int(num_gap_links.sum()),
        )

    # 1D: boundary positions.  position_map[k] = bp start of rank k
    # (k==N → total length); nspace[k] = k (reference: stats_main.cpp:429-448,
    # with gap entries collapsing to the same values — see repo notes).
    pos_map = g.seq_offset  # i64[N+1]
    info_a = ra + (~reva).astype(np.int64)
    info_b = rb + revb.astype(np.int64)
    lo_i = np.minimum(info_a, info_b)
    hi_i = np.maximum(info_a, info_b)
    node_d = np.where(use, hi_i - lo_i, 0)
    nt_d = np.where(use, pos_map[hi_i] - pos_map[lo_i], 0)
    sum_node = np.bincount(pair_path, weights=node_d.astype(np.float64), minlength=P)
    sum_nt = np.bincount(pair_path, weights=nt_d.astype(np.float64), minlength=P)
    with np.errstate(invalid="ignore", divide="ignore"):
        per_node = np.where(num_links > 0, sum_node / num_links, 0.0)
        per_nt = np.where(num_links > 0, sum_nt / num_links, 0.0)
    all_links = int(num_links.sum())
    return MeanLinksLength(
        per_path_node_space=per_node,
        per_path_nt_space=per_nt,
        per_path_2d=None,
        per_path_num_links=num_links,
        per_path_num_gap_links=num_gap_links,
        all_node_space=float(sum_node.sum() / all_links) if all_links else 0.0,
        all_nt_space=float(sum_nt.sum() / all_links) if all_links else 0.0,
        all_2d=None,
        all_num_links=all_links,
        all_num_gap_links=int(num_gap_links.sum()),
    )


@dataclass
class SumPathNodeDistances:
    per_path_node_space: np.ndarray
    per_path_nt_space: np.ndarray
    per_path_2d: Optional[np.ndarray]
    per_path_nodes: np.ndarray
    per_path_nucleotides: np.ndarray
    per_path_num_penalties: np.ndarray
    per_path_num_penalties_diff_orientation: np.ndarray
    all_node_space: float
    all_nt_space: float
    all_2d_by_nodes: Optional[float]
    all_2d_by_nucleotides: Optional[float]
    all_num_penalties: int
    all_num_penalties_diff_orientation: int


def sum_of_path_node_distances(
    g: GraphTensors,
    xy: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    penalize_diff_orientation: bool = False,
) -> SumPathNodeDistances:
    """Sum of path node distances (reference: stats_main.cpp:626-800).

    Per consecutive step pair: node-space and nt-space distance between the
    two node starts, weighted 3x when the pair goes backward in pangenomic
    (rank) order, plus optional 2x penalty on orientation flips; plus the
    end-of-path sentinel (+1 node / +len(last) nt).  Normalized by path
    length in nodes and nucleotides.
    """
    P = g.num_paths
    ai, bi, pair_path = _consecutive_pairs(g)
    ha, hb = g.step_handle[ai], g.step_handle[bi]
    ra, rb = handle_rank(ha), handle_rank(hb)
    reva, revb = handle_is_reverse(ha), handle_is_reverse(hb)

    len_nodes = g.path_step_count.astype(np.int64)
    len_nt = g.path_length.astype(np.int64)

    diff_orient = reva != revb

    if xy is not None:
        X, Y = xy
        ia = 2 * ra + reva
        ib = 2 * rb + revb
        d = np.hypot(X[ia] - X[ib], Y[ia] - Y[ib])
        if penalize_diff_orientation:
            d = d + np.where(diff_orient, 2.0 * d, 0.0)
        sum_2d = np.bincount(pair_path, weights=d, minlength=P)
        with np.errstate(invalid="ignore", divide="ignore"):
            per_2d = np.where(len_nodes > 0, sum_2d / len_nodes, 0.0)
        pen_d = np.bincount(pair_path[diff_orient], minlength=P).astype(np.int64)
        tot_nodes, tot_nt = int(len_nodes.sum()), int(len_nt.sum())
        return SumPathNodeDistances(
            per_path_node_space=np.zeros(P),
            per_path_nt_space=np.zeros(P),
            per_path_2d=per_2d,
            per_path_nodes=len_nodes,
            per_path_nucleotides=len_nt,
            per_path_num_penalties=np.zeros(P, dtype=np.int64),
            per_path_num_penalties_diff_orientation=(
                pen_d if penalize_diff_orientation else np.zeros(P, dtype=np.int64)
            ),
            all_node_space=0.0,
            all_nt_space=0.0,
            all_2d_by_nodes=float(sum_2d.sum() / tot_nodes) if tot_nodes else 0.0,
            all_2d_by_nucleotides=float(sum_2d.sum() / tot_nt) if tot_nt else 0.0,
            all_num_penalties=0,
            all_num_penalties_diff_orientation=(
                int(pen_d.sum()) if penalize_diff_orientation else 0
            ),
        )

    pos_map = g.seq_offset
    backward = rb < ra
    lo_r = np.minimum(ra, rb)
    hi_r = np.maximum(ra, rb)
    w = np.where(backward, 3, 1).astype(np.int64)
    node_d = w * (hi_r - lo_r)
    nt_d = w * (pos_map[hi_r] - pos_map[lo_r])
    if penalize_diff_orientation:
        node_d = node_d + np.where(diff_orient, 2 * (hi_r - lo_r), 0)
        nt_d = nt_d + np.where(
            diff_orient, 2 * (pos_map[hi_r] - pos_map[lo_r]), 0
        )
    sum_node = np.bincount(pair_path, weights=node_d.astype(np.float64), minlength=P)
    sum_nt = np.bincount(pair_path, weights=nt_d.astype(np.float64), minlength=P)
    # end-of-path sentinel (reference: stats_main.cpp:722-725)
    nonempty = len_nodes > 0
    sum_node = sum_node + nonempty
    last_len = np.zeros(P, dtype=np.int64)
    if g.num_steps:
        last_steps = g.path_offset[1:][nonempty] - 1
        last_len[nonempty] = g.node_len[handle_rank(g.step_handle[last_steps])]
    sum_nt = sum_nt + last_len

    pen = np.bincount(pair_path[backward], minlength=P).astype(np.int64)
    pen_d = np.bincount(pair_path[diff_orient], minlength=P).astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        per_node = np.where(len_nodes > 0, sum_node / len_nodes, 0.0)
        per_nt = np.where(len_nt > 0, sum_nt / len_nt, 0.0)
    tot_nodes, tot_nt = int(len_nodes.sum()), int(len_nt.sum())
    return SumPathNodeDistances(
        per_path_node_space=per_node,
        per_path_nt_space=per_nt,
        per_path_2d=None,
        per_path_nodes=len_nodes,
        per_path_nucleotides=len_nt,
        per_path_num_penalties=pen,
        per_path_num_penalties_diff_orientation=(
            pen_d if penalize_diff_orientation else np.zeros(P, dtype=np.int64)
        ),
        all_node_space=float(sum_node.sum() / tot_nodes) if tot_nodes else 0.0,
        all_nt_space=float(sum_nt.sum() / tot_nt) if tot_nt else 0.0,
        all_2d_by_nodes=None,
        all_2d_by_nucleotides=None,
        all_num_penalties=int(pen.sum()),
        all_num_penalties_diff_orientation=(
            int(pen_d.sum()) if penalize_diff_orientation else 0
        ),
    )


def weighted_feedback_arcs(g: GraphTensors) -> Tuple[np.ndarray, int]:
    """Per-path and total weighted feedback arc counts
    (reference: stats_main.cpp:816-860): path-traversed links where both
    steps are forward and rank_a >= rank_b, or both reverse and
    rank_a <= rank_b."""
    ai, bi, pair_path = _consecutive_pairs(g)
    ha, hb = g.step_handle[ai], g.step_handle[bi]
    ra, rb = handle_rank(ha), handle_rank(hb)
    reva, revb = handle_is_reverse(ha), handle_is_reverse(hb)
    fa = (~reva & ~revb & (ra >= rb)) | (reva & revb & (ra <= rb))
    per = np.bincount(pair_path[fa], minlength=g.num_paths).astype(np.int64)
    return per, int(per.sum())


def weighted_reversing_joins(g: GraphTensors) -> Tuple[np.ndarray, int]:
    """Per-path and total strand-flipping link counts
    (reference: stats_main.cpp:863-905)."""
    ai, bi, pair_path = _consecutive_pairs(g)
    flips = handle_is_reverse(g.step_handle[ai]) != handle_is_reverse(
        g.step_handle[bi]
    )
    per = np.bincount(pair_path[flips], minlength=g.num_paths).astype(np.int64)
    return per, int(per.sum())


def links_length_per_nuc(g: GraphTensors) -> Tuple[int, int]:
    """(total_links_length, total_nucleotides) for -q/--links_length_per_nuc
    (reference: stats_main.cpp:908-1008): per consecutive step pair, the
    pangenomic gap between the link's out-side and in-side with four
    orientation cases; gap links (sort-adjacent node occurrences within the
    path's own node set) are not counted in the forward/forward ascending
    case, matching the reference's default."""
    ai, bi, pair_path = _consecutive_pairs(g)
    ha, hb = g.step_handle[ai], g.step_handle[bi]
    ra, rb = handle_rank(ha), handle_rank(hb)
    reva, revb = handle_is_reverse(ha), handle_is_reverse(hb)
    pos = g.node_offset.astype(np.int64)
    ln = g.node_len.astype(np.int64)
    pa, pb = pos[ra], pos[rb]
    la, lb = ln[ra], ln[rb]
    asc = ra <= rb

    # gap-link mask (reference checks it only in the ff-ascending case)
    gap_mask = np.zeros(len(ai), dtype=bool)
    for p in range(g.num_paths):
        lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
        ranks_in_path = np.unique(handle_rank(g.step_handle[lo:hi]))
        sel = pair_path == p
        ia = np.searchsorted(ranks_in_path, ra[sel])
        ib = np.searchsorted(ranks_in_path, rb[sel])
        gap_mask[sel] = ib == ia + 1

    ff = ~reva & ~revb
    fr = ~reva & revb
    rf = reva & ~revb
    rr = reva & revb
    d = np.zeros(len(ai), dtype=np.int64)
    d[ff & asc & ~gap_mask] = (pb - (pa + la))[ff & asc & ~gap_mask]
    d[ff & ~asc] = (pa - pb + la)[ff & ~asc]
    d[fr & asc] = (pb + lb - (pa + la))[fr & asc]
    d[fr & ~asc] = (pa - pb - lb + la)[fr & ~asc]
    d[rf & asc] = (pb - pa)[rf & asc]
    d[rf & ~asc] = (pa - pb + la + lb)[rf & ~asc]
    d[rr & asc] = (pb - pa + la + lb)[rr & asc]
    d[rr & ~asc] = (pa - (pb + lb))[rr & ~asc]
    total_nuc = int(ln[handle_rank(g.step_handle)].sum())
    return int(d.sum()), total_nuc


def nondeterministic_edges(g: GraphTensors):
    """Rows (from, to) as '<id><+/->' strings for -N/--nondeterministic-edges
    (reference: stats_main.cpp:279-299): outgoing edges from one side whose
    target nodes start with the same base."""
    adj = g.adjacency
    out = []
    for rank in range(g.num_nodes):
        nid = g.node_id[rank]
        for rev in (False, True):
            h = (rank << 1) | int(rev)
            targets = adj.neighbors(h)
            by_base = {}
            for t in targets:
                tr = int(t) >> 1
                trev = bool(int(t) & 1)
                base = g.node_seq_str(tr, trev)[0] if g.node_len[tr] else ""
                by_base.setdefault(base, []).append((int(g.node_id[tr]), trev))
            for base, tos in by_base.items():
                if len(tos) > 1:
                    for tid, trev in tos:
                        out.append(
                            (
                                f"{nid}{'-' if rev else '+'}",
                                f"{tid}{'-' if trev else '+'}",
                            )
                        )
    return out


def pangenome_class_counts(g: GraphTensors, delim: str, sample_pos: int):
    """Per-sample Private/Core/Shell nucleotide counts for -a
    (reference: stats_main.cpp:337-399): sample name = path name split by
    `delim` at position `sample_pos`; a node is Private when one sample
    visits it, Core when all do, Shell otherwise; each class accumulates the
    node length for every visiting sample.  Returns
    {sample: (core, private, shell)} in first-appearance order."""
    samples = []
    sample_ids = {}
    path_sample = np.zeros(g.num_paths, dtype=np.int64)
    for p, name in enumerate(g.path_names):
        parts = name.split(delim)
        s = parts[sample_pos] if sample_pos < len(parts) else parts[-1]
        if s not in sample_ids:
            sample_ids[s] = len(samples)
            samples.append(s)
        path_sample[p] = sample_ids[s]
    n_samples = len(samples)
    node = handle_rank(g.step_handle)
    pairs = np.unique(
        np.stack([node, path_sample[g.step_path]], axis=1), axis=0
    )
    counts = np.bincount(pairs[:, 0], minlength=g.num_nodes)
    ln = g.node_len.astype(np.int64)
    core = np.zeros(n_samples, dtype=np.int64)
    priv = np.zeros(n_samples, dtype=np.int64)
    shell = np.zeros(n_samples, dtype=np.int64)
    node_cls = np.where(
        counts == 1, 0, np.where(counts >= n_samples, 1, 2)
    )  # 0=priv, 1=core, 2=shell (untouched nodes classified but unused)
    cls_of_pair = node_cls[pairs[:, 0]]
    w = ln[pairs[:, 0]]
    for cls, acc in ((0, priv), (1, core), (2, shell)):
        m = cls_of_pair == cls
        acc += np.bincount(pairs[m, 1], weights=w[m], minlength=n_samples).astype(
            np.int64
        )
    return {s: (int(core[i]), int(priv[i]), int(shell[i])) for i, s in enumerate(samples)}


def component_is_acyclic(g: GraphTensors, component: np.ndarray) -> bool:
    """Kahn sweep with orientation consistency, the reference's
    is_nice_and_acyclic (reference: src/algorithms/cover.cpp:8-77): start
    from forward handles with zero left-degree; successors must always be
    reached in one consistent orientation and every component node must be
    consumed."""
    adj = g.adjacency

    def left_degree(handle: int) -> int:
        # going left from h = following right from flip(h)
        return len(adj.neighbors(handle ^ 1))

    comp = set(int(r) for r in component)
    indeg = {}
    orient = {}
    stack = []
    found = 0
    for r in comp:
        d = left_degree(r << 1)
        indeg[r] = d
        if d == 0:
            orient[r] = False
            stack.append(r << 1)
            found += 1
    while stack:
        h = stack.pop()
        for t in adj.neighbors(h):
            tr = int(t) >> 1
            trev = bool(int(t) & 1)
            if tr not in comp:
                continue
            if tr not in orient:
                orient[tr] = trev
                indeg[tr] = left_degree((tr << 1) | int(trev))
            elif orient[tr] != trev:
                return False
            indeg[tr] -= 1
            if indeg[tr] == 0:
                stack.append((tr << 1) | int(trev))
                found += 1
    return found == len(comp)


def unique_self_loop_nodes(g: GraphTensors) -> int:
    """Number of distinct nodes with a self loop
    (reference: stats_main.cpp:255-274 'unique' row)."""
    same = handle_rank(g.edge_from) == handle_rank(g.edge_to)
    return int(np.unique(handle_rank(g.edge_from[same])).size)
