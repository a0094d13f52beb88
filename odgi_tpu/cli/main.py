"""odgi_tpu command-line interface.

Mirrors the reference's subcommand layer (reference:
src/subcommand/subcommand.hpp:72-167 registry + per-command main_<x>
drivers) with argparse subparsers.  Graph inputs accept .gfa text or the
native .otg container (sniffed by magic, like the reference's
utils::handle_gfa_odgi_input, src/utils.cpp:103-120).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np


def load_any(path: str):
    """Sniff .otg vs reference .og vs GFA and load
    (reference: src/utils.cpp:103-120)."""
    from ..io.og import MAGIC, load_graph
    from ..io.og_compat import OG_MAGIC_BE, load_og
    from ..io.gfa import parse_gfa

    if path == "-":
        return parse_gfa(sys.stdin.buffer.read())
    with open(path, "rb") as f:
        head = f.read(8)
    if head == MAGIC:
        return load_graph(path)
    if head[:4] == OG_MAGIC_BE:
        return load_og(path)
    if head[:4] == b"GFAZ":
        # grammar-compressed GFA sniffing (reference: src/utils.cpp:16-25);
        # the GFAz codec is a vendored dep absent from the reference
        # snapshot, so decompression is not supported here
        print(
            f"[odgi] error: {path} is a GFAz (compressed GFA) file; "
            "decompress it to GFAv1 first (GFAz decoding unsupported).",
            file=sys.stderr,
        )
        sys.exit(1)
    return parse_gfa(path)


def _out_graph(g, path: str):
    """Write by extension: .gfa text, .og reference-compatible binary,
    anything else the native .otg container."""
    from ..io.og import save_graph
    from ..io.og_compat import save_og
    from ..io.gfa import write_gfa

    if path.endswith(".gfa"):
        write_gfa(g, path)
    elif path.endswith(".og"):
        save_og(g, path)
    else:
        save_graph(g, path)


def cmd_build(args):
    g = load_any(args.gfa)
    if args.optimize:
        g = g.optimize()
    if args.sort:
        from ..algorithms.topological import topological_order

        g = g.apply_ordering(topological_order(g))
    _out_graph(g, args.out)
    return 0


def cmd_view(args):
    from ..io.gfa import write_gfa

    g = load_any(args.input)
    if args.to_gfa or args.node_annotation:
        if args.node_annotation:
            # reference annotation: per-S-line DP (step count) and RC
            # (step count * node length) tags (src/odgi.cpp:1571-1583)
            import numpy as np

            from ..core.graph import handle_rank

            sc = np.bincount(
                handle_rank(g.step_handle), minlength=g.num_nodes
            )
            print("H\tVN:Z:1.0")
            for r in range(g.num_nodes):
                print(
                    f"S\t{int(g.node_id[r])}\t{g.node_seq_str(r)}\t"
                    f"DP:i:{int(sc[r])}\tRC:i:{int(sc[r]) * int(g.node_len[r])}"
                )
            import io as _io

            buf = _io.StringIO()
            write_gfa(g, buf)
            for line in buf.getvalue().splitlines():
                if not (line.startswith("S\t") or line.startswith("H\t")):
                    print(line)
        else:
            write_gfa(g, sys.stdout)
    # like the reference, `view` without an output flag prints nothing
    return 0


def cmd_validate(args):
    g = load_any(args.input)
    problems = g.validate()
    for p in problems:
        print(p, file=sys.stderr)
    return 1 if problems else 0


def cmd_stats(args):
    """`odgi stats` driver with the reference's full flag surface
    (reference: src/subcommand/stats_main.cpp:34-79 flags; output formats
    :181-1008 — TSV and YAML (-y) / MultiQC (-m) modes)."""
    import os as _os

    from ..algorithms import stats
    from ..algorithms.components import num_self_loops, weak_components

    g = load_any(args.input)
    yaml = bool(args.yaml or args.multiqc)
    mqc = bool(args.multiqc)
    xy = None
    if args.coords_in:
        from ..io.lay import load_layout

        coords = load_layout(args.coords_in)
        xy = (coords[:, 0], coords[:, 1])

    a_delim = a_pos = None
    if args.pangenome_sequence_class_counts:
        parts = args.pangenome_sequence_class_counts.split(",")
        if len(parts) != 2:
            print(
                "[odgi::stats] error: Argument for -a,"
                "--pangenome-sequence-classes malformed. Please follow "
                "DEL,POS.",
                file=sys.stderr,
            )
            return 1
        a_delim, a_pos = parts[0], int(parts[1])

    no_args = not any(
        [
            args.weakly_connected_components, args.self_loops,
            args.nondeterministic_edges, args.base_content, args.delim,
            args.file_size, args.pangenome_sequence_class_counts,
            args.mean_links_length, args.no_gap_links,
            args.sum_path_nodes_distances,
            args.penalize_different_orientation, args.path_statistics,
            args.weighted_feedback_arc, args.weighted_reversing_join,
            args.links_length_per_nuc, args.multiqc, args.yaml,
            args.is_acyclic, args.count_walks, args.shortest_cycle,
        ]
    )

    if yaml:
        print("---")

    if args.summarize or mqc or no_args:
        s = stats.summary(g)
        if yaml:
            for k in ("length", "nodes", "edges", "paths", "steps"):
                print(f"{k}: {s[k]}")
        else:
            print("#length\tnodes\tedges\tpaths\tsteps")
            print(
                f"{s['length']}\t{s['nodes']}\t{s['edges']}\t{s['paths']}\t{s['steps']}"
            )

    if args.weakly_connected_components or mqc:
        comps = weak_components(g)
        if yaml:
            print(f"num_weakly_connected_components: {len(comps)}")
            print("weakly_connected_components: ")
        else:
            print(f"##num_weakly_connected_components: {len(comps)}")
            print("#component\tnodes\tis_acyclic")
        for i, c in enumerate(comps):
            acyc = stats.component_is_acyclic(g, c)
            if yaml:
                print("  - component:")
                print(f"      id: {i}")
                print(f"      nodes: {len(c)}")
                print(f"      is_acyclic: {chr(39)}yes{chr(39)}" if acyc else f"      is_acyclic: {chr(39)}no{chr(39)}")
            else:
                print(f"{i}\t{len(c)}\t{'yes' if acyc else 'no'}")

    if args.self_loops or mqc:
        total = num_self_loops(g)
        uniq = stats.unique_self_loop_nodes(g)
        if yaml:
            print("num_nodes_self_loops:")
            print(f"  total: {total}")
            print(f"  unique: {uniq}")
        else:
            print("#type\tnum")
            print(f"total\t{total}")
            print(f"unique\t{uniq}")

    if args.nondeterministic_edges and not yaml:
        print("#from_node\tto_node")
        for frm, to in stats.nondeterministic_edges(g):
            print(f"{frm}\t{to}")

    if args.base_content or mqc:
        for base, count in sorted(stats.base_content(g).items()):
            print(f"{base}: {count}" if yaml else f"{base}\t{count}")

    if args.file_size or mqc:
        try:
            fsize = _os.path.getsize(args.input)
        except OSError as e:
            print(f"[odgi::stats] error: {args.input} : {e}", file=sys.stderr)
            return 1
        print(f"file_size_in_bytes: {fsize}" if yaml else f"{fsize}")

    if a_delim is not None:
        cc = stats.pangenome_class_counts(g, a_delim, a_pos)
        if yaml:
            print("pangenome_sequence_class_counts:")
            for name, (core, priv, shell) in cc.items():
                print("  - sample: ")
                print(f"      name: {name}")
                print(f"      core: {core}")
                print(f"      private: {priv}")
                print(f"      shell: {shell}")
        else:
            print("#name\tcore\tprivate\tshell")
            for name, (core, priv, shell) in cc.items():
                print(f"{name}\t{core}\t{priv}\t{shell}")

    if args.mean_links_length or mqc:
        m = stats.mean_links_length(
            g, xy=xy, penalize_gap_links=not args.no_gap_links
        )
        in_2d = xy is not None
        if yaml:
            print("mean_links_length:")
        else:
            print("#mean_links_length")
            if in_2d:
                print("path\tin_2D_space\tnum_links_considered")
            else:
                hdr = "path\tin_node_space\tin_nucleotide_space\tnum_links_considered"
                if args.no_gap_links:
                    hdr += "\tnum_gap_links_not_penalized"
                print(hdr)

        def links_row(name, node_sp, nt_sp, d2, nl, ngl, is_all):
            if yaml:
                print("  - length:")
                print(f"      path: {name}")
                if in_2d:
                    print(f"      in_2D_space: {_g(d2)}")
                else:
                    print(f"      in_node_space: {_g(node_sp)}")
                    print(f"      in_nucleotide_space: {_g(nt_sp)}")
                print(f"      num_links_considered: {nl}")
                if args.no_gap_links or (mqc and is_all):
                    print(f"      num_gap_links_not_penalized: {ngl}")
            else:
                if in_2d:
                    print(f"{name}\t{_g(d2)}\t{nl}")
                else:
                    row = f"{name}\t{_g(node_sp)}\t{_g(nt_sp)}\t{nl}"
                    if args.no_gap_links:
                        row += f"\t{ngl}"
                    print(row)

        if args.path_statistics:
            for p in range(g.num_paths):
                links_row(
                    g.path_names[p],
                    m.per_path_node_space[p],
                    m.per_path_nt_space[p],
                    m.per_path_2d[p] if in_2d else None,
                    int(m.per_path_num_links[p]),
                    int(m.per_path_num_gap_links[p]),
                    False,
                )
        links_row(
            "all_paths", m.all_node_space, m.all_nt_space, m.all_2d,
            m.all_num_links, m.all_num_gap_links, True,
        )

    if args.sum_path_nodes_distances or mqc:
        d = stats.sum_of_path_node_distances(
            g, xy=xy, penalize_diff_orientation=args.penalize_different_orientation
        )
        in_2d = xy is not None
        if yaml:
            print("sum_of_path_node_distances:")
        else:
            print("#sum_of_path_node_distances")
            if in_2d:
                hdr = "path\tin_2D_space_by_nodes\tin_2D_space_by_nucleotides\tnodes\tnucleotides"
            else:
                hdr = "path\tin_node_space\tin_nucleotide_space\tnodes\tnucleotides\tnum_penalties"
            if args.penalize_different_orientation:
                hdr += "\tnum_penalties_different_orientation"
            print(hdr)

        def dist_row(name, node_sp, nt_sp, d2n, d2nt, nodes, nts, pen, pend, is_all):
            if yaml:
                print("  - distance:")
                print(f"      path: {name}")
                if in_2d:
                    print(f"      in_2D_space_by_nodes: {_g(d2n)}")
                    print(f"      in_2D_space_by_nucleotides: {_g(d2nt)}")
                    print(f"      nodes: {nodes}")
                    print(f"      nucleotides: {nts}")
                else:
                    print(f"      in_node_space: {_g(node_sp)}")
                    print(f"      in_nucleotide_space: {_g(nt_sp)}")
                    print(f"      nodes: {nodes}")
                    print(f"      nucleotides: {nts}")
                    print(f"      num_penalties: {pen}")
                if args.penalize_different_orientation or (mqc and is_all):
                    print(f"      num_penalties_different_orientation: {pend}")
            else:
                if in_2d:
                    row = f"{name}\t{_g(d2n)}\t{_g(d2nt)}\t{nodes}\t{nts}"
                else:
                    row = f"{name}\t{_g(node_sp)}\t{_g(nt_sp)}\t{nodes}\t{nts}\t{pen}"
                if args.penalize_different_orientation:
                    row += f"\t{pend}"
                print(row)

        if args.path_statistics:
            for p in range(g.num_paths):
                dist_row(
                    g.path_names[p],
                    d.per_path_node_space[p],
                    d.per_path_nt_space[p],
                    d.per_path_2d[p] if in_2d else None,
                    (
                        d.per_path_2d[p]
                        * d.per_path_nodes[p]
                        / max(int(d.per_path_nucleotides[p]), 1)
                        if in_2d
                        else None
                    ),
                    int(d.per_path_nodes[p]),
                    int(d.per_path_nucleotides[p]),
                    int(d.per_path_num_penalties[p]),
                    int(d.per_path_num_penalties_diff_orientation[p]),
                    False,
                )
        dist_row(
            "all_paths", d.all_node_space, d.all_nt_space,
            d.all_2d_by_nodes, d.all_2d_by_nucleotides,
            int(d.per_path_nodes.sum()), int(d.per_path_nucleotides.sum()),
            d.all_num_penalties, d.all_num_penalties_diff_orientation, True,
        )

    if args.weighted_feedback_arc:
        per, total = stats.weighted_feedback_arcs(g)
        if yaml:
            print(f"weighted_feedback_arc: {total}")
        else:
            print("path\tweighted_feedback_arc")
            if args.path_statistics:
                for p in range(g.num_paths):
                    print(f"{g.path_names[p]}\t{int(per[p])}")
            print(f"all_paths\t{total}")

    if args.weighted_reversing_join:
        per, total = stats.weighted_reversing_joins(g)
        if yaml:
            print(f"weighted_reversing_join: {total}")
        else:
            print("path\tweighted_reversing_join")
            if args.path_statistics:
                for p in range(g.num_paths):
                    print(f"{g.path_names[p]}\t{int(per[p])}")
            print(f"all_paths\t{total}")

    if getattr(args, "is_acyclic", False):
        from ..algorithms.graph_misc import is_acyclic

        print("is_acyclic: " + ("yes" if is_acyclic(g) else "no"))

    if getattr(args, "count_walks", False):
        from ..algorithms.graph_misc import count_walks

        print(f"count_walks: {count_walks(g)}")

    if getattr(args, "shortest_cycle", False):
        from ..algorithms.graph_misc import shortest_cycle_length

        c = shortest_cycle_length(g)
        print(f"shortest_cycle_length: {c if c < (1 << 63) - 1 else 'none'}")

    if args.links_length_per_nuc:
        links_len, nucs = stats.links_length_per_nuc(g)
        ratio = links_len / nucs if nucs else 0.0
        if yaml:
            print(f"links_length_per_nuc: {_g(ratio)}")
        else:
            print("path\tlinks_length_per_nuc")
            print(f"all_paths\t{_g(ratio)}")
    return 0


def _g(v) -> str:
    """6-significant-digit formatting like the reference's default cout."""
    if v is None:
        return "0"
    return f"{v:.6g}"


def cmd_sort(args):
    """`odgi sort` with the reference's sort-mode precedence
    (reference: src/subcommand/sort_main.cpp:418-585)."""
    import numpy as np

    from ..algorithms.path_sgd_sort import sort_pipeline
    from ..algorithms.transforms import prefix_and_id_ordered_paths

    g = load_any(args.input)
    if args.optimize:
        g = g.optimize()
    sgd_overrides = {}
    for flag, key in [
        ("sgd_iter_max", "iter_max"),
        ("sgd_eps", "eps"),
        ("sgd_delta", "delta"),
        ("sgd_eta_max", "eta_max"),
        ("sgd_zipf_theta", "theta"),
        ("sgd_zipf_space", "space"),
        ("sgd_zipf_space_max", "space_max"),
        ("sgd_zipf_space_quantization_step", "space_quantization_step"),
        ("sgd_cooling", "cooling_start"),
        ("sgd_iter_with_max_learning_rate", "iter_with_max_learning_rate"),
    ]:
        v = getattr(args, flag, None)
        if v is not None:
            sgd_overrides[key] = v
    if args.sgd_seed is not None:
        # reference default seed string is hashed; accept ints directly
        try:
            sgd_overrides["seed"] = int(args.sgd_seed)
        except ValueError:
            import zlib

            sgd_overrides["seed"] = zlib.crc32(args.sgd_seed.encode())
    if args.sgd_mtu_nodes:
        sgd_overrides["min_term_updates"] = int(
            args.sgd_mtu_nodes * g.num_nodes
        )
    elif args.sgd_mtu_paths:
        sgd_overrides["min_term_updates"] = int(
            args.sgd_mtu_paths * g.num_steps
        )
    if args.sgd_zipf_max_dists and "space_quantization_step" not in sgd_overrides:
        # reference: quantization derived from the max distribution
        # count (sort_main.cpp:88; our derive_config_1d mirrors it with
        # the default 100)
        space = int(g.path_length.max()) if g.num_paths else 1
        space_max = sgd_overrides.get("space_max", 100)
        md = max(args.sgd_zipf_max_dists, space_max + 1)
        if space > space_max:
            sgd_overrides["space_quantization_step"] = max(
                2, -(-(space - space_max) // (md - space_max))
            )
    if args.pipeline:
        pipeline = args.pipeline
    elif args.two:
        pipeline = "w"
    elif args.sort_order:
        order_ids = [int(l) for l in open(args.sort_order) if l.strip()]
        order = np.asarray([g.id_to_rank[i] for i in order_ids], dtype=np.int64)
        g = g.apply_ordering(order, compact_ids=True)
        pipeline = ""
    elif args.dagify_sort:
        pipeline = "d"
    elif args.cycle_breaking:
        pipeline = "c"
    elif args.no_seeds:
        pipeline = "n"
    elif args.path_sgd:
        pipeline = "Y"
    elif args.breadth_first:
        pipeline = "b"
    elif args.depth_first:
        pipeline = "z"
    elif args.random:
        pipeline = "r"
    elif args.optimize:
        pipeline = ""
    else:
        pipeline = "s"
    use_paths = None
    if args.sgd_use_paths:
        use_paths = []
        with open(args.sgd_use_paths) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        use_paths.append(g.path_names.index(line))
                    except ValueError:
                        print(
                            f"[odgi::sort] error: path {line} not found "
                            "in graph",
                            file=sys.stderr,
                        )
                        return 1
    target_paths = None
    if getattr(args, "sgd_target_paths", None):
        target_paths = []
        with open(args.sgd_target_paths) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        target_paths.append(g.path_names.index(line))
                    except ValueError:
                        print(
                            f"[odgi::sort] error: path {line} not found in graph",
                            file=sys.stderr,
                        )
                        return 1
    if pipeline:
        from ..utils.metrics import StepMetrics, maybe_profile

        metrics = None
        if getattr(args, "metrics", None):
            metrics = StepMetrics(args.metrics, "sort1d")
        with maybe_profile(getattr(args, "profile", None)):
            g = sort_pipeline(
                g,
                pipeline,
                progress=bool(getattr(args, "progress", False)),
                sgd_overrides=sgd_overrides or None,
                target_paths=target_paths,
                snapshot_prefix=getattr(args, "sgd_snapshot", None),
                use_paths=use_paths,
                bfs_chunk=int(getattr(args, "breadth_first_chunk", 0) or 0),
                dfs_chunk=int(getattr(args, "depth_first_chunk", 0) or 0),
            )
        if args.sgd_layout_out:
            # -e: write the sorted 1D positions as a .lay (y = 0;
            # reference sort_main.cpp:95 writes the 1D SGD layout)
            from ..io.lay import save_lay

            pos = g.node_offset.astype(np.float64)
            coords = np.zeros((2 * g.num_nodes, 2), np.float64)
            coords[0::2, 0] = pos
            coords[1::2, 0] = pos + g.node_len
            save_lay(coords, args.sgd_layout_out)
        if metrics is not None:
            metrics.record_summary(pipeline=pipeline, nodes=int(g.num_nodes),
                                   steps=int(g.num_steps))
            metrics.write()
    if args.paths_min:
        g = g.keep_paths(prefix_and_id_ordered_paths(g, args.path_delim or ""))
    if args.paths_max:
        g = g.keep_paths(
            prefix_and_id_ordered_paths(g, args.path_delim or "", rev=True)
        )
    if args.paths_avg:
        g = g.keep_paths(
            prefix_and_id_ordered_paths(g, args.path_delim or "", avg=True)
        )
    if args.paths_avg_rev:
        g = g.keep_paths(
            prefix_and_id_ordered_paths(g, args.path_delim or "", avg=True, rev=True)
        )
    _out_graph(g, args.out)
    return 0


def cmd_layout(args):
    """`odgi layout` with the reference's PG-SGD flag surface
    (reference: src/subcommand/layout_main.cpp:31-96,250-266)."""
    from ..algorithms.layout import layout_graph, layout_to_tsv
    from ..io.lay import save_layout
    from ..ops.sgd import derive_config_2d

    g = load_any(args.input)
    if not g.is_optimized():
        g = g.optimize()
    overrides = {}
    if args.iter_max:
        overrides["iter_max"] = args.iter_max
    if args.path_sgd_min_term_updates_paths:
        overrides["min_term_updates"] = int(
            args.path_sgd_min_term_updates_paths * g.num_steps
        )
    elif args.path_sgd_min_term_updates_nodes:
        overrides["min_term_updates"] = int(
            args.path_sgd_min_term_updates_nodes * g.num_nodes
        )
    if args.path_sgd_delta is not None:
        overrides["delta"] = args.path_sgd_delta
    if args.path_sgd_eta is not None:
        overrides["eps"] = args.path_sgd_eta
    if args.path_sgd_eta_max is not None:
        overrides["eta_max"] = args.path_sgd_eta_max
    if args.path_sgd_zipf_theta is not None:
        overrides["theta"] = args.path_sgd_zipf_theta
    if args.path_sgd_cooling is not None:
        overrides["cooling_start"] = args.path_sgd_cooling
    if args.path_sgd_iteration_max_learning_rate is not None:
        overrides["iter_with_max_learning_rate"] = (
            args.path_sgd_iteration_max_learning_rate
        )
    if args.path_sgd_zipf_space is not None:
        overrides["space"] = min(
            args.path_sgd_zipf_space, int(g.path_step_count.max())
        )
    if args.path_sgd_zipf_space_max is not None:
        overrides["space_max"] = args.path_sgd_zipf_space_max
    if args.path_sgd_zipf_space_quantization_step is not None:
        overrides["space_quantization_step"] = max(
            2, args.path_sgd_zipf_space_quantization_step
        )
    if args.path_sgd_seed is not None:
        overrides["seed"] = args.path_sgd_seed
    use_paths = None
    if args.path_sgd_use_paths:
        use_paths = []
        with open(args.path_sgd_use_paths) as f:
            for line in f:
                line = line.strip()
                if line:
                    use_paths.append(g.path_names.index(line))
    snapshot_cb = None
    if args.path_sgd_snapshot:
        prefix = args.path_sgd_snapshot

        def snapshot_cb(it, coords):
            # one .lay per iteration (reference: path_sgd_layout.cpp:379-408)
            save_layout(coords, f"{prefix}{it + 1}")

    if args.progress and snapshot_cb is None:
        from ..utils.progress import ProgressMeter

        meter = ProgressMeter(
            overrides.get("iter_max", 30),
            "[odgi_tpu::layout] 2D PG-SGD iterations",
        )

        def snapshot_cb(it, coords, _m=meter):
            _m.increment()
            if it + 1 >= _m.total:
                _m.finish()

    metrics = None
    if getattr(args, "metrics", None):
        from ..utils.metrics import StepMetrics

        metrics = StepMetrics(args.metrics, "layout2d")
        _prev_cb = snapshot_cb

        def snapshot_cb(it, coords, _p=_prev_cb, _m=metrics):
            _m.record_iteration(it, coords)
            if _p is not None:
                _p(it, coords)

    from ..utils.metrics import maybe_profile

    cfg = derive_config_2d(g, **overrides)
    with maybe_profile(getattr(args, "profile", None)):
        coords = layout_graph(
            g, cfg, init_mode=args.init, use_paths=use_paths,
            snapshot_cb=snapshot_cb,
        )
    if metrics is not None:
        metrics.record_summary(
            iter_max=cfg.iter_max, min_term_updates=cfg.min_term_updates
        )
        metrics.write()
    if args.out:
        save_layout(coords, args.out)
    if args.tsv:
        layout_to_tsv(coords, sys.stdout if args.tsv == "-" else args.tsv)
    return 0


def cmd_paths(args):
    """`odgi paths` with the reference's investigation surface
    (reference: src/subcommand/paths_main.cpp:42-795)."""
    g = load_any(args.input)
    if args.list and args.list_path_start_end:
        for p in range(g.num_paths):
            print(f"{g.path_names[p]}\t1\t{int(g.path_length[p])}")
    elif args.list:
        for name in g.path_names:
            print(name)
    if args.lengths:
        print("#path\tlength\tsteps")
        for p in range(g.num_paths):
            print(
                f"{g.path_names[p]}\t{int(g.path_length[p])}\t{int(g.path_step_count[p])}"
            )
    if args.fasta:
        from ..algorithms.paths_cmd import write_fasta

        write_fasta(g, sys.stdout, line_width=args.fasta_line_width)
    if args.haplotypes:
        from ..algorithms.paths_cmd import write_haplotype_matrix

        write_haplotype_matrix(
            g,
            sys.stdout,
            scale_by_length=args.scale_by_node_length,
            group_delim=args.delim,
        )

    def load_names(fname):
        out = []
        with open(fname) as f:
            for line in f:
                line = line.strip()
                if line:
                    if line not in g.path_names:
                        print(
                            f"[odgi::paths] error: path'{line}' does not "
                            "exist in graph.",
                            file=sys.stderr,
                        )
                        sys.exit(1)
                    out.append(g.path_names.index(line))
        return out

    from ..algorithms import paths_cmd as pc

    if args.non_reference_nodes:
        refs = load_names(args.non_reference_nodes)
        print("#node.id\tnode.len\tnum.uncalled.bases\tpaths")
        for row in pc.non_reference_nodes_rows(g, refs, args.min_size):
            print("\t".join(str(v) for v in row))
    elif args.non_reference_ranges:
        refs = load_names(args.non_reference_ranges)
        hdr = "#path.name\tstart\tend"
        if args.show_step_ranges:
            hdr += "\tsteps"
        print(hdr)
        for row in pc.non_reference_ranges_rows(
            g, refs, args.min_size, args.show_step_ranges
        ):
            print("\t".join(str(v) for v in row))

    if args.coverage_levels or args.fraction_levels:
        fraction = bool(args.fraction_levels)
        levels = [
            float(v)
            for v in (args.coverage_levels or args.fraction_levels).split(",")
        ]
        hdr, rows = pc.sequence_class_tables(
            g,
            levels,
            fraction,
            delim=args.delim,
            delim_pos=max(args.delim_pos - 1, 0),
            min_size=args.min_size,
            path_ranges=args.path_range_class,
            show_steps=args.show_step_ranges,
        )
        print(hdr)
        for row in rows:
            print("\t".join(str(v) for v in row))

    if args.overlaps:
        groups = {}
        with open(args.overlaps) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                vals = line.split("\t")
                groups.setdefault(vals[0], []).append(
                    vals[1] if len(vals) > 1 else vals[0]
                )
        print("group.name\tquery\ttarget\toverlap\toverlap.frac")
        for row in pc.overlaps_table(g, sorted(groups.items())):
            print(
                f"{row[0]}\t{row[1]}\t{row[2]}\t{row[3]}\t{row[4]:.6g}"
            )

    if args.keep_paths or args.drop_paths:
        keep = (
            load_names(args.keep_paths)
            if args.keep_paths
            else list(range(g.num_paths))
        )
        if args.drop_paths:
            drop = set(load_names(args.drop_paths))
            keep = [p for p in keep if p not in drop]
        g2 = g.keep_paths(keep)
        if args.out:
            _out_graph(g2, args.out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="odgi_tpu", description="TPU-native pangenome graph engine"
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("build", help="construct a graph from GFA")
    p.add_argument("-g", "--gfa", required=True)
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-O", "--optimize", action="store_true")
    p.add_argument("-s", "--sort", action="store_true")
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-P", "--progress", action="store_true")
    p.add_argument("-d", "--debug", action="store_true")
    p.set_defaults(fn=cmd_build)

    p = sub.add_parser("view", help="write graph as GFA to stdout")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-g", "--to-gfa", action="store_true")
    p.add_argument("-a", "--node-annotation", action="store_true")
    p.add_argument("-P", "--progress", action="store_true")
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("validate", help="check path/edge consistency")
    p.add_argument("-i", "--input", required=True)
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("stats", help="graph statistics")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-S", "--summarize", action="store_true")
    p.add_argument("-W", "--weakly-connected-components", action="store_true")
    p.add_argument("-L", "--self-loops", action="store_true")
    p.add_argument("-b", "--base-content", action="store_true")
    p.add_argument("-l", "--mean-links-length", action="store_true")
    p.add_argument("-g", "--no-gap-links", action="store_true")
    p.add_argument("-s", "--sum-path-nodes-distances", action="store_true")
    p.add_argument("-d", "--penalize-different-orientation", action="store_true")
    p.add_argument("-w", "--weighted-feedback-arc", action="store_true")
    p.add_argument("-j", "--weighted-reversing-join", action="store_true")
    p.add_argument("-c", "--coords-in", default=None)
    p.add_argument("-p", "--path-statistics", action="store_true")
    p.add_argument("-m", "--multiqc", action="store_true")
    p.add_argument("-y", "--yaml", action="store_true")
    p.add_argument("-f", "--file-size", action="store_true")
    p.add_argument("-a", "--pangenome-sequence-class-counts", default=None)
    p.add_argument("-D", "--delim", default=None)
    p.add_argument("-q", "--links_length_per_nuc", "--links-length-per-nuc",
                   dest="links_length_per_nuc", action="store_true")
    p.add_argument("-N", "--nondeterministic-edges", action="store_true")
    p.add_argument("--is-acyclic", action="store_true",
                   help="extension: whole-graph acyclicity check")
    p.add_argument("--count-walks", action="store_true",
                   help="extension: source-to-sink walk count")
    p.add_argument("--shortest-cycle", action="store_true",
                   help="extension: shortest cycle length in bp")
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-P", "--progress", action="store_true")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("sort", help="sort the graph")
    p.add_argument("-i", "--input", "--idx", dest="input", required=True)
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-p", "--pipeline", default=None, help="e.g. Ygs")
    p.add_argument("-Y", "--path-sgd", action="store_true")
    p.add_argument("-O", "--optimize", action="store_true")
    p.add_argument("-b", "--breadth-first", action="store_true")
    p.add_argument("-z", "--depth-first", action="store_true")
    p.add_argument("-c", "--cycle-breaking", action="store_true")
    p.add_argument("-w", "--two", action="store_true")
    p.add_argument("-n", "--no-seeds", action="store_true")
    p.add_argument("-r", "--random", action="store_true")
    p.add_argument("-d", "--dagify-sort", action="store_true")
    p.add_argument("-s", "--sort-order")
    p.add_argument("-L", "--paths-min", action="store_true")
    p.add_argument("-M", "--paths-max", action="store_true")
    p.add_argument("-A", "--paths-avg", action="store_true")
    p.add_argument("-R", "--paths-avg-rev", action="store_true")
    p.add_argument("-D", "--path-delim")
    p.add_argument("-x", "--path-sgd-iter-max", dest="sgd_iter_max", type=int)
    p.add_argument("-g", "--path-sgd-eps", dest="sgd_eps", type=float)
    p.add_argument("-j", "--path-sgd-delta", dest="sgd_delta", type=float)
    p.add_argument("-v", "--path-sgd-eta-max", dest="sgd_eta_max", type=float)
    p.add_argument("-a", "--path-sgd-zipf-theta", dest="sgd_zipf_theta", type=float)
    p.add_argument("-k", "--path-sgd-zipf-space", dest="sgd_zipf_space", type=int)
    p.add_argument(
        "-I", "--path-sgd-zipf-space-max", dest="sgd_zipf_space_max", type=int
    )
    p.add_argument(
        "-l",
        "--path-sgd-zipf-space-quantization-step",
        dest="sgd_zipf_space_quantization_step",
        type=int,
    )
    p.add_argument("-K", "--path-sgd-cooling", dest="sgd_cooling", type=float)
    p.add_argument(
        "-F",
        "--iteration-max-learning-rate",
        dest="sgd_iter_with_max_learning_rate",
        type=int,
    )
    p.add_argument("-u", "--path-sgd-snapshot", dest="sgd_snapshot", default=None)
    p.add_argument("-H", "--target-paths", dest="sgd_target_paths", default=None)
    p.add_argument("-q", "--path-sgd-seed", dest="sgd_seed", default=None)
    p.add_argument(
        "-f", "--path-sgd-use-paths", dest="sgd_use_paths", default=None
    )
    p.add_argument(
        "-G", "--path-sgd-min-term-updates-paths",
        dest="sgd_mtu_paths", type=float, default=None,
    )
    p.add_argument(
        "-U", "--path-sgd-min-term-updates-nodes",
        dest="sgd_mtu_nodes", type=float, default=None,
    )
    p.add_argument(
        "-y", "--path-sgd-zipf-max-num-distributions",
        dest="sgd_zipf_max_dists", type=int, default=None,
    )
    p.add_argument(
        "-e", "--path-sgd-layout", dest="sgd_layout_out", default=None
    )
    p.add_argument("-B", "--breadth-first-chunk", type=int, default=0)
    p.add_argument("-Z", "--depth-first-chunk", type=int, default=0)
    # not applicable to this design (accepted for drop-in parity):
    # indexes are built in memory and no temp files are used
    p.add_argument("-X", "--path-index", default=None)
    p.add_argument("-C", "--temp-dir", default=None)
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-P", "--progress", action="store_true")
    p.add_argument("--metrics", default=None, metavar="FILE",
                   help="write JSONL run metrics (see utils/metrics.py)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the optimization")
    p.set_defaults(fn=cmd_sort)

    p = sub.add_parser("layout", help="2D PG-SGD layout")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--out", default=None)
    p.add_argument("-T", "--tsv", default=None)
    p.add_argument("-X", "--path-index", default=None)
    p.add_argument("-C", "--temp-dir", default=None)
    p.add_argument("-f", "--path-sgd-use-paths", default=None)
    p.add_argument("-N", "--init", "--layout-initialization", dest="init",
                   default="d", choices=list("drugh"))
    p.add_argument("-G", "--path-sgd-min-term-updates-paths", type=float)
    p.add_argument("-U", "--path-sgd-min-term-updates-nodes", type=float)
    p.add_argument("-j", "--path-sgd-delta", type=float)
    p.add_argument("-g", "--path-sgd-eta", type=float)
    p.add_argument("-v", "--path-sgd-eta-max", type=float)
    p.add_argument("-a", "--path-sgd-zipf-theta", type=float)
    p.add_argument("-x", "--path-sgd-iter-max", "--iter-max",
                   dest="iter_max", type=int, default=None)
    p.add_argument("-K", "--path-sgd-cooling", type=float)
    p.add_argument("-F", "--path-sgd-iteration-max-learning-rate", type=int)
    p.add_argument("-k", "--path-sgd-zipf-space", type=int)
    p.add_argument("-I", "--path-sgd-zipf-space-max", type=int)
    p.add_argument("-l", "--path-sgd-zipf-space-quantization-step", type=int)
    p.add_argument("-q", "--path-sgd-seed", type=int)
    p.add_argument("-u", "--path-sgd-snapshot", default=None)
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-P", "--progress", action="store_true")
    p.add_argument("--metrics", default=None, metavar="FILE",
                   help="write JSONL per-iteration metrics (forces the "
                        "per-iteration driver)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the optimization")
    p.set_defaults(fn=cmd_layout)

    p = sub.add_parser("paths", help="path information")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--out", default=None)
    p.add_argument("-L", "--list", "--list-paths", action="store_true")
    p.add_argument("-e", "--list-path-start-end", action="store_true")
    p.add_argument("-l", "--lengths", action="store_true")
    p.add_argument("-f", "--fasta", action="store_true")
    p.add_argument("-w", "--fasta-line-width", type=int, default=0)
    p.add_argument("-H", "--haplotypes", action="store_true")
    p.add_argument("-D", "--delim", default=None)
    p.add_argument("-p", "--delim-pos", type=int, default=1)
    p.add_argument("-N", "--scale-by-node-length", "-s",
                   dest="scale_by_node_length", action="store_true")
    p.add_argument("--non-reference-nodes", default=None)
    p.add_argument("--non-reference-ranges", default=None)
    p.add_argument("--coverage-levels", default=None)
    p.add_argument("--fraction-levels", default=None)
    p.add_argument("--path-range-class", action="store_true")
    p.add_argument("--min-size", type=int, default=0)
    p.add_argument("--show-step-ranges", action="store_true")
    p.add_argument("-O", "--overlaps", default=None)
    p.add_argument("-K", "--keep-paths", default=None)
    p.add_argument("-X", "--drop-paths", default=None)
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-P", "--progress", action="store_true")
    p.set_defaults(fn=cmd_paths)

    from .commands2 import register as register2
    from .commands3 import register as register3

    register2(sub)
    register3(sub)
    return ap


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except BrokenPipeError:
        # downstream closed (e.g. | head); exit quietly like a unix tool
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        return 0


if __name__ == "__main__":
    sys.exit(main())
