"""Worker for the 2-process jax.distributed integration test
(tests/test_multiprocess.py). Run as:
``python tests/mp_worker.py <coordinator> <nprocs> <rank>``.

Exercises the multi-host control plane against a REAL multi-process jax
runtime (reference behaviors: gaiavision broadcast_object pickle transport,
cross_arch_eval_hooks.py:59 meta sync, apis/test.py:112-186 result gather,
sharded val sweep with cross-process confusion-matrix reduction).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, nprocs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs, jax.process_count()

    from gaiaseg_tpu.parallel.mesh import all_gather_objects, broadcast_object

    # 1. broadcast_object carries arbitrary python metas (strings included)
    meta = {"name": "R50", "arch.backbone.body.depth": [3, 4, 6, 3]} \
        if rank == 0 else None
    got = broadcast_object(meta)
    assert got == {"name": "R50", "arch.backbone.body.depth": [3, 4, 6, 3]}, got

    # 2. all_gather_objects returns rank-ordered python objects
    gathered = all_gather_objects({"rank": rank, "tag": f"r{rank}"})
    assert [g["rank"] for g in gathered] == list(range(nprocs)), gathered

    # 3. sharded evaluation: each process sweeps a disjoint val slice; the
    # summed confusion matrix must equal the single-process sweep
    import numpy as np
    from gaiaseg_tpu.data.loader import BatchLoader

    class TinySet:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"img": rng.rand(8, 8, 3).astype(np.float32),
                    "gt": rng.randint(0, 3, (8, 8)), "idx": i}

    loader = BatchLoader(TinySet(), 2, shuffle=False, drop_last=False,
                         shard_id=rank, num_shards=nprocs, prefetch=0)
    seen = []
    for b in loader:
        n = len(b["idx"]) - b.get("pad_count", 0)
        seen.extend(int(i) for i in b["idx"][:n])
    all_seen = sorted(sum(all_gather_objects(seen), []))
    assert all_seen == list(range(7)), all_seen

    print(f"mp_worker rank {rank}: OK", flush=True)


if __name__ == "__main__":
    main()
