"""Test harness config.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding
paths (shard_map/psum over a Mesh) are exercised without TPU hardware,
mirroring the strategy mandated in SURVEY.md §4.
"""
import os

# The axon sitecustomize force-sets JAX_PLATFORMS=axon at interpreter
# start, so overriding the env var is not enough — use jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref():
    if not REFERENCE.exists():
        pytest.skip("reference tree not available")
    return REFERENCE


@pytest.fixture(scope="session")
def toy_graph(ref):
    from vgan_tpu.graph.packed import PackedGraph

    return PackedGraph.from_gfa(str(ref / "test/reconstructInputSeq/target_graph.gfa"))


@pytest.fixture(scope="session")
def toy_reads(ref):
    from vgan_tpu.io.gam import read_gam

    return read_gam(str(ref / "test/reconstructInputSeq/test_reads.gam"))
