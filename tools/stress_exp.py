"""2D layout convergence experiment harness (round-2 diagnosis).

Exports DRB1 to the seq_layout2d dump format, runs the C++ ground truth
in the three batch-apply modes, runs our JAX path, and prints the stress
(sum_of_path_node_distances all_2d_by_nucleotides) for each, next to the
reference fixture's.
"""

import os
import struct
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import odgi_tpu
from odgi_tpu.algorithms.layout import init_layout
from odgi_tpu.algorithms.stats import sum_of_path_node_distances
from odgi_tpu.io.lay import load_lay

GFA = "/root/reference/test/DRB1-3123_unsorted.gfa"
FIXTURE_LAY = "/root/reference/test/DRB1-3123_unsorted.og.lay"


def export_dump(g, coords0, path):
    with open(path, "wb") as f:
        f.write(struct.pack("<qqq", g.num_nodes, g.num_steps, g.num_paths))
        f.write(np.asarray(g.node_len, np.int32).tobytes())
        f.write((np.asarray(g.step_handle, np.int64) >> 1).astype(np.int32).tobytes())
        f.write((np.asarray(g.step_handle, np.int64) & 1).astype(np.uint8).tobytes())
        f.write(np.asarray(g.step_pos, np.int64).tobytes())
        f.write(np.asarray(g.path_offset, np.int64).tobytes())
        f.write(np.asarray(coords0, np.float64).tobytes())


def stress(g, coords):
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    r = sum_of_path_node_distances(g, (c[:, 0], c[:, 1]))
    return r.all_2d_by_nucleotides


def main():
    # the fixture layout was computed on the unsorted .og's node order
    gu = odgi_tpu.parse_gfa(GFA)
    print(f"fixture stress: {stress(gu, load_lay(FIXTURE_LAY)):.4f}")

    coords0 = init_layout(gu, "d")
    print(f"init-d  stress: {stress(gu, coords0):.4f}")

    dump = "/tmp/drb1.dump"
    export_dump(gu, coords0, dump)
    exe = "/tmp/seq_layout2d"
    subprocess.run(
        ["g++", "-O2", "-o", exe, "/root/repo/tools/seq_layout2d.cpp"], check=True
    )
    for mode, batch, label in [
        (0, 1, "sequential"),
        (1, 1024, "mean-1k"),
        (1, 32768, "mean-32k"),
        (2, 1024, "sum-1k"),
        (2, 32768, "sum-32k"),
    ]:
        out = f"/tmp/drb1.coords.{mode}.{batch}"
        subprocess.run([exe, dump, out, str(mode), str(batch)], check=True)
        c = np.fromfile(out, np.float64).reshape(-1, 2)
        print(f"cpp mode={label:<10} stress: {stress(gu, c):.4f}")


if __name__ == "__main__":
    main()
