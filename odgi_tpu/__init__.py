"""odgi_tpu: a TPU-native pangenome variation-graph engine.

A ground-up re-design of the capabilities of pangenome/odgi for TPU
hardware: the graph is an immutable bundle of flat device-friendly tensors
(core.graph.GraphTensors), graph-shaping algorithms are batched JAX/Pallas
kernels (ops.sgd: path-guided SGD 1D sort + 2D layout), analytics are
vectorized segment ops, and multi-chip scale-out uses jax.sharding meshes
with psum delta merging (parallel).
"""

from .core.graph import GraphBuilder, GraphTensors
from .io.gfa import parse_gfa, write_gfa
from .io.og import load_graph, save_graph
from .io.lay import load_layout, save_layout

__version__ = "0.1.0"
