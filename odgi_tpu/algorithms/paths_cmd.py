"""Path-level exports: FASTA, haplotype matrix, coverage vectors.

Covers `odgi paths` (reference: src/subcommand/paths_main.cpp:57-79,243+ —
the haplotype matrix has one row per path: name, length, step count, then
per-node coverage counts over the sort order, optionally scaled by node
length or grouped by a name delimiter) and `odgi flatten`
(src/subcommand/flatten_main.cpp: linearized FASTA + per-step BED).
"""

from __future__ import annotations

from typing import Iterable, Optional, TextIO, Tuple

import numpy as np

from ..core.graph import GraphTensors, handle_is_reverse, handle_rank


def path_sequence(g: GraphTensors, p: int) -> bytes:
    lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
    return b"".join(
        g.node_seq(int(h) >> 1, bool(h & 1)) for h in g.step_handle[lo:hi]
    )


def write_fasta(g: GraphTensors, out: TextIO, wrap: int = 80) -> None:
    for p in range(g.num_paths):
        out.write(f">{g.path_names[p]}\n")
        seq = path_sequence(g, p).decode()
        for i in range(0, len(seq), wrap):
            out.write(seq[i : i + wrap] + "\n")


def haplotype_matrix(
    g: GraphTensors,
    scale_by_length: bool = False,
    group_delim: Optional[str] = None,
) -> Tuple[list, np.ndarray, np.ndarray, np.ndarray]:
    """(row_names, path_length, path_steps, coverage[P', N]) — the -H
    matrix (reference: paths_main.cpp:57-79): per path (or per group when
    `group_delim` given) coverage count of every node in rank order,
    optionally multiplied by node length."""
    ranks = handle_rank(g.step_handle)
    P, N = g.num_paths, g.num_nodes
    if group_delim is None:
        row_of_path = np.arange(P)
        row_names = list(g.path_names)
    else:
        names = [n.split(group_delim)[0] for n in g.path_names]
        row_names = sorted(set(names))
        idx = {n: i for i, n in enumerate(row_names)}
        row_of_path = np.array([idx[n] for n in names])
    R = len(row_names)
    flat = row_of_path[g.step_path] * N + ranks
    cov = np.bincount(flat, minlength=R * N).reshape(R, N).astype(np.int64)
    if scale_by_length:
        cov = cov * g.node_len[None, :]
    lengths = np.zeros(R, dtype=np.int64)
    steps = np.zeros(R, dtype=np.int64)
    np.add.at(lengths, row_of_path, g.path_length)
    np.add.at(steps, row_of_path, g.path_step_count)
    return row_names, lengths, steps, cov


def write_haplotype_matrix(g: GraphTensors, out: TextIO, **kwargs) -> None:
    names, lengths, steps, cov = haplotype_matrix(g, **kwargs)
    header = ["path.name", "path.length", "path.step.count"] + [
        f"node.{int(i)}" for i in g.node_id
    ]
    out.write("\t".join(header) + "\n")
    for r, name in enumerate(names):
        row = [name, str(int(lengths[r])), str(int(steps[r]))]
        row += [str(int(v)) for v in cov[r]]
        out.write("\t".join(row) + "\n")


def flatten(
    g: GraphTensors, fasta_out: TextIO, bed_out: TextIO, name: str = "flattened"
) -> None:
    """Linearize the graph: FASTA of concatenated node sequences in rank
    order + BED rows mapping each path step onto it
    (reference: flatten_main.cpp)."""
    fasta_out.write(f">{name}\n")
    seq = g.seq.tobytes().decode()
    for i in range(0, len(seq), 80):
        fasta_out.write(seq[i : i + 80] + "\n")
    bed_out.write("#name\tstart\tend\tpath\tstrand\tstep.rank\n")
    ranks = handle_rank(g.step_handle)
    revs = handle_is_reverse(g.step_handle)
    starts = g.node_offset[ranks]
    ends = starts + g.node_len[ranks]
    sp = g.step_path
    sr = g.step_rank
    for k in range(g.num_steps):
        bed_out.write(
            f"{name}\t{int(starts[k])}\t{int(ends[k])}\t"
            f"{g.path_names[sp[k]]}\t{'-' if revs[k] else '+'}\t{int(sr[k])}\n"
        )


def path_jaccard_matrix(g: GraphTensors) -> np.ndarray:
    """f64[P, P] pairwise path similarity over covered node bp
    (reference: src/subcommand/similarity_main.cpp — sparse path x path
    jaccard/overlap over shared nodes, weighted by node length)."""
    P, N = g.num_paths, g.num_nodes
    ranks = handle_rank(g.step_handle)
    flat = g.step_path.astype(np.int64) * N + ranks
    touched = np.zeros(P * N, dtype=bool)
    touched[flat] = True
    touched = touched.reshape(P, N)
    w = g.node_len.astype(np.float64)
    tw = touched * w  # (P, N) bp touched
    inter = tw @ touched.T  # shared bp
    sizes = tw.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(union > 0, inter / union, 0.0)
    return jac
