"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL stack (SURVEY.md §2.10):
MMDistributedDataParallel gradient allreduce, SyncBN stats, object
broadcast, result gathers all collapse into ONE ``jax.sharding.Mesh`` with a
``data`` axis — XLA inserts ICI collectives under ``jit``. The ``model``
axis is declared (size 1 by default) so tensor-parallel shardings can land
without re-plumbing (SURVEY.md §2.10: "leave named axes open").

The reference's ``find_unused_parameters=True`` DDP hack (apis/train.py:91-95,
needed because sampled subnets leave params unused) disappears entirely:
masking keeps the graph static, zeros flow through inactive slices, and every
parameter always has a (possibly zero) gradient.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """data x model mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch with leading batch dim sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _path_str(path) -> str:
    out = []
    for p in path:
        out.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(out).lower()


def tp_spec(path: str, shape, tp: int,
            min_size: int = 1 << 16) -> PartitionSpec:
    """Tensor-parallel PartitionSpec for one parameter leaf.

    Megatron-style pairing for transformer blocks so GSPMD needs one
    collective per block instead of one per matmul: column-parallel
    (shard OUTPUT dim) for qkv / fc1, row-parallel (shard INPUT dim,
    partial-sum output) for the attention out-projection / fc2. Everything
    else: shard the last (output-channel) dim when divisible and the leaf
    is big enough to matter; small/1-D leaves (biases, norms, BN stats,
    layer scales) stay replicated — XLA slices them at use sites.
    """
    if tp <= 1 or len(shape) < 2:
        return P()
    nd = len(shape)
    # whole path-segment match: the attention out-projection module is
    # named exactly "proj" (elastic_transformer.py) — a substring match
    # would also hit e.g. an ASPP head's "c1_proj" conv and row-shard a
    # non-Megatron-paired kernel (correct under GSPMD but inserts
    # unintended resharding collectives)
    segs = path.split("/")
    if any(k in segs for k in ("proj", "fc2")) and shape[-2] % tp == 0 \
            and int(np.prod(shape)) >= min_size:
        return P(*([None] * (nd - 2)), MODEL_AXIS, None)
    if shape[-1] % tp == 0 and int(np.prod(shape)) >= min_size:
        return P(*([None] * (nd - 1)), MODEL_AXIS)
    return P()


def shard_state(tree: Any, mesh: Mesh, min_size: int = 1 << 16) -> Any:
    """Place a train-state pytree with tensor-parallel param shardings
    over the ``model`` axis (replicated when the axis is size 1 — then
    identical to :func:`replicate`). Works on the whole TrainState:
    optimizer momenta mirror their parameter's sharding because the rule
    depends only on (path, shape). ``min_size`` gates which leaves are
    worth sharding (tests/dry runs lower it to exercise TP on tiny
    models)."""
    tp = mesh.shape[MODEL_AXIS]

    def place(path, x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        spec = tp_spec(_path_str(path), x.shape, tp, min_size=min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_report(tree: Any) -> Dict[str, str]:
    """{path: partition spec} for every leaf sharded over the ``model``
    axis — the audit trail for ``shard_state`` (a substring-matching spec
    rule that silently sharded the wrong leaves once; tests assert on this
    report so the rule set stays anchored)."""
    report: Dict[str, str] = {}

    def visit(path, x):
        spec = getattr(getattr(x, "sharding", None), "spec", None)
        if spec and any(MODEL_AXIS in str(s) for s in spec
                        if s is not None):
            report[_path_str(path)] = str(spec)

    jax.tree_util.tree_map_with_path(visit, tree)
    return report


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces torch.distributed.launch + NCCL
    rendezvous, reference scripts/train_local.sh). No-op single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def broadcast_object(obj: Any, is_source: Optional[bool] = None) -> Any:
    """Broadcast an arbitrary python object from process 0 (replaces the
    reference's pickle-to-CUDA-tensor NCCL hack, reference
    apis/test.py:117-129 and gaiavision ``broadcast_object``). Identity in
    single-process runs.

    Sampler metas contain python strings/dicts (``{'name': 'R50', ...}``),
    which ``multihost_utils.broadcast_one_to_all`` cannot carry (it takes
    array pytrees) — so: pickle -> uint8 array (length broadcast first so
    non-source processes allocate the matching shape) -> unpickle.
    """
    if jax.process_count() == 1:
        return obj
    import pickle
    from jax.experimental import multihost_utils
    if is_source is None:
        is_source = jax.process_index() == 0
    payload = pickle.dumps(obj) if is_source else b""
    n = multihost_utils.broadcast_one_to_all(
        np.asarray([len(payload)], np.int32), is_source=is_source)
    buf = np.zeros(int(n[0]), np.uint8)
    if is_source:
        buf[:] = np.frombuffer(payload, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=is_source)
    return pickle.loads(np.asarray(buf).tobytes())


def all_gather_objects(obj: Any) -> list:
    """Gather one python object per process to every process, ordered by
    process index (replaces collect_results_cpu/gpu, reference
    apis/test.py:112-186). Single-process: ``[obj]``. Same pickle->uint8
    transport as ``broadcast_object``; payloads are padded to the max
    length before the array allgather, then truncated per true length."""
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int32))          # [P, 1]
    lens = np.asarray(lens).reshape(-1)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[:payload.size] = payload
    bufs = np.asarray(multihost_utils.process_allgather(buf))  # [P, maxlen]
    return [pickle.loads(bufs[i, :int(lens[i])].tobytes())
            for i in range(bufs.shape[0])]
