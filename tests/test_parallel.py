"""Mesh-sharded engine on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from datok_tpu.parallel.mesh import ShardedEngine


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("data",))


@pytest.fixture(scope="module")
def sharded(mat_de, mesh8):
    return ShardedEngine(mat_de, mesh=mesh8)


def test_sharded_matches_oracle(sharded, mat_de):
    texts = [
        f"Lane {i}: Der alte Mann las z.B. die readme.txt am 5.9.2018!\x04"
        for i in range(19)  # non-multiple of shard count exercises padding
    ] + ["", "Kurz."]
    outs = sharded.tokenize_batch(texts)
    for t, o in zip(texts, outs):
        assert o == mat_de.tokenize(t)


def test_corpus_stats(sharded):
    texts = ["Ein Satz. Und noch einer!\x04", "Zweiter Text.\x04", "dritter"]
    stats = sharded.corpus_stats(texts)
    assert stats["texts"] == 3
    assert stats["tokens"] == 11
    assert stats["shards"] == 8
    assert stats["chars"] == sum(len(t) for t in texts)


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    ys, bad, steps, exits = fn(*args)
    assert int(bad.sum()) == 0
    g.dryrun_multichip(8)
