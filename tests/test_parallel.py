"""
Multi-device parallelism tests on the virtual 8-device CPU mesh:
sharded reweighting matches the single-device kernel, and sharding
helpers pad/replicate correctly.
"""

import numpy as np
import pytest

from evcouplings_tpu.ops.weights import num_cluster_members
from evcouplings_tpu.parallel import (
    make_mesh,
    num_cluster_members_sharded,
    replicate,
    shard_rows,
)


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == 8

        mesh2 = make_mesh(4)
        assert mesh2.devices.size == 4

    def test_shard_rows_pads(self):
        mesh = make_mesh()
        arr = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
        sharded, n = shard_rows(arr, mesh)
        assert n == 10
        assert sharded.shape[0] % 8 == 0
        assert np.asarray(sharded)[:10] == pytest.approx(arr)

    def test_replicate(self):
        mesh = make_mesh()
        tree = {"a": np.ones(4), "b": np.zeros((2, 2))}
        rep = replicate(tree, mesh)
        assert np.asarray(rep["a"]) == pytest.approx(tree["a"])


class TestShardedReweighting:
    def test_matches_single_device(self):
        rng = np.random.default_rng(5)
        m = rng.integers(0, 21, size=(500, 60))
        m[5] = m[3]
        m[499] = m[0]

        ref = num_cluster_members(m, 0.8)
        got = num_cluster_members_sharded(
            m, 0.8, mesh=make_mesh(), block_size=32
        )
        assert np.array_equal(ref, got)

    def test_uneven_rows(self):
        rng = np.random.default_rng(6)
        m = rng.integers(0, 5, size=(123, 40))
        ref = num_cluster_members(m, 0.5)
        got = num_cluster_members_sharded(
            m, 0.5, mesh=make_mesh(4), block_size=16
        )
        assert np.array_equal(ref, got)
