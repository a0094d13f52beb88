"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip hardware is not available in CI; we validate sharding on a
virtual CPU mesh (this is our 'fake backend' analog of the reference's
absent distributed tests — see SURVEY.md §4).
"""

import os

# XLA_FLAGS must be set before backend init; JAX_PLATFORMS is forced to
# 'axon' by the environment's sitecustomize, so override via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE_TEST_DIR = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def t_gfa():
    from odgi_tpu import parse_gfa

    return parse_gfa(str(REFERENCE_TEST_DIR / "t.gfa"))


@pytest.fixture(scope="session")
def drb_graph():
    from odgi_tpu import parse_gfa

    return parse_gfa(str(REFERENCE_TEST_DIR / "DRB1-3123.gfa"))
