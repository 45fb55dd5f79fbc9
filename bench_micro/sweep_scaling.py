#!/usr/bin/env python
"""Scaling evidence on the virtual CPU mesh (BASELINE.md north star).

This workload is embarrassingly parallel: the transition tables are
replicated, lanes are data-parallel, and the ONLY collective is the
final counter psum — so multi-chip efficiency is governed by
(a) per-shard work balance and (b) padded-lane waste, both measured
here per mesh size on a skewed corpus, with and without the
shard-aware length balancing (`parallel.mesh.balance_perm`).

Wall-clock weak scaling is NOT meaningful on this host: the N virtual
XLA CPU devices share 2 physical cores, so device-seconds serialize.
On real hardware each shard owns a chip and runs its local machine
with no cross-shard synchronization until the psum; predicted
efficiency = balance_efficiency × (1 − padded_fraction), reported
per point.

    python bench_micro/sweep_scaling.py  # writes MULTICHIP_SCALING.json
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from jax.sharding import Mesh

    import datok_tpu as dt
    from datok_tpu.parallel.mesh import ShardedEngine, balance_perm
    from bench import BENCH_TEXT

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    devs = jax.devices()

    # skewed per-shard work: doc lengths vary 8x, long docs clustered
    rng = np.random.RandomState(3)
    def corpus(n_docs, per_doc):
        out = []
        for i in range(n_docs):
            L = int(per_doc * (0.25 + 1.75 * (i / max(1, n_docs - 1))))
            out.append((BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2] + ".\x04")
        return out

    results = []
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(devs[:n]), ("data",))
        eng = ShardedEngine(tok, mesh=mesh, engine="hot")
        docs = corpus(16 * n, 512)  # fixed per-shard work (weak scaling)
        for balanced in (False, True):
            stats = eng.corpus_stats(docs, balance=balanced)
            results.append({
                "shards": n,
                "entry_point": "corpus_stats",
                "balanced": balanced,
                "balance_efficiency": stats["balance_efficiency"],
                "padded_fraction": stats["padded_fraction"],
                "predicted_mesh_efficiency": round(
                    stats["balance_efficiency"]
                    * (1 - stats["padded_fraction"]), 4
                ),
                "shard_steps": stats["shard_steps"],
                "fallback_lanes": stats["fallback_lanes"],
            })
            print(json.dumps(results[-1]), flush=True)

        # SECOND entry point (round-3 verdict #8): the overlapped wave
        # pipeline, whose prep thread applies balance_perm per wave —
        # aggregate per-wave balance over the whole skewed corpus
        from datok_tpu.runtime.overlap import waves_pipelined

        text_items = ((None, d) for d in docs)
        tot_max = tot_mean = 0.0
        waves = 0
        for _wave in waves_pipelined(eng, text_items, lanes=16 * n):
            steps = np.asarray(eng.last_shard_steps, dtype=np.float64)
            if steps.size and steps.max() > 0:
                tot_max += float(steps.max())
                tot_mean += float(steps.mean())
                waves += 1
        results.append({
            "shards": n,
            "entry_point": "waves_pipelined",
            "balanced": True,
            "balance_efficiency": round(tot_mean / tot_max, 4)
            if tot_max else 1.0,
            "waves": waves,
        })
        print(json.dumps(results[-1]), flush=True)

    out = {
        "note": (
            "virtual 8-device CPU mesh; zero cross-shard communication "
            "until the final counter psum, so real-mesh efficiency = "
            "balance_efficiency x (1 - padded_fraction); wall-clock "
            "not meaningful on 2 shared host cores"
        ),
        "points": results,
    }
    with open("MULTICHIP_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote MULTICHIP_SCALING.json")


if __name__ == "__main__":
    main()
