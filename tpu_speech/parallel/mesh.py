"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP over NCCL
(SPIRAL/README.md:36-42; PL `accelerator='ddp'`). The TPU-native equivalent is
a 1-D (or 2-D, for future model parallelism) ``jax.sharding.Mesh`` with the
batch sharded over the 'data' axis and parameters replicated; XLA inserts the
gradient all-reduce over ICI automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    seq_parallel: int = 1,
) -> Mesh:
    """1-D data mesh by default; adds a 'seq' axis when seq_parallel > 1
    (long-sequence activation sharding, see ``seq_constrainer``) and a
    'model' axis when model_parallel > 1 (tensor-parallel params, see
    ``shard_params_tp``). Axis order data > seq > model keeps the data
    all-reduce on the outermost (slowest) ring."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        assert len(devs) >= n_devices, (
            f"requested {n_devices} devices, only {len(devs)} available"
        )
        devs = devs[:n_devices]
    n = len(devs)
    assert n % (model_parallel * seq_parallel) == 0, (
        n, model_parallel, seq_parallel
    )
    shape = [n // (model_parallel * seq_parallel)]
    axes = [DATA_AXIS]
    if seq_parallel > 1:
        shape.append(seq_parallel)
        axes.append(SEQ_AXIS)
    if model_parallel > 1:
        shape.append(model_parallel)
        axes.append(MODEL_AXIS)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over 'data';
    rank-0 leaves (per-step scalars) are replicated.

    Single-process: plain device_put. Multi-process (jax.distributed): each
    host holds only its contiguous slice of the global batch, assembled into
    one global array via ``jax.make_array_from_process_local_data``."""
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    scalar = NamedSharding(mesh, P())
    multiproc = jax.process_count() > 1

    def put(a):
        nd = getattr(a, "ndim", None)
        if nd is None:
            nd = np.ndim(a)
        if nd == 0:
            return jax.device_put(a, scalar)
        if multiproc:
            return jax.make_array_from_process_local_data(
                sharded, np.asarray(a)
            )
        return jax.device_put(a, sharded)

    return jax.tree.map(put, batch)


def shard_microbatches(mesh: Mesh, batch):
    """Place a pytree of stacked micro-batches (gradient accumulation):
    leaves are [n_micro, batch, ...] with the batch axis (axis 1) sharded
    over 'data' and the micro axis unsharded (scanned inside the jit step).
    Rank-1 leaves ([n_micro] stacked per-step scalars) are replicated."""
    sharded = NamedSharding(mesh, P(None, DATA_AXIS))
    repl = NamedSharding(mesh, P())
    multiproc = jax.process_count() > 1

    def put(a):
        nd = getattr(a, "ndim", None)
        if nd is None:
            nd = np.ndim(a)
        if nd <= 1:
            return jax.device_put(a, repl)
        if multiproc:
            return jax.make_array_from_process_local_data(
                sharded, np.asarray(a)
            )
        return jax.device_put(a, sharded)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def seq_constrainer(mesh: Optional[Mesh]):
    """Returns f(x) anchoring (batch, time, ...) activations to
    P(data, seq, ...) when the mesh has a 'seq' axis; identity otherwise.

    Sequence parallelism for long inputs (SPIRAL trains on 250k-sample /
    ~1560-frame crops, spiral_base_pretrain_ls960.py crop config): anchor the
    featurizer outputs and encoder outputs, and XLA's SPMD partitioner
    propagates the time-sharding through the network between the anchors —
    halo exchanges for the stride/conv frontend, k/v all-gathers for
    attention — so per-chip activation memory scales down with the seq axis.
    A pure placement change: the loss is bitwise the math of the unsharded
    step (validated in __graft_entry__.dryrun_multichip and
    tests/test_distributed.py)."""
    if mesh is None or SEQ_AXIS not in mesh.axis_names:
        return lambda x: x

    def constrain(x):
        if getattr(x, "ndim", 0) < 2:
            return x
        spec = P(DATA_AXIS, SEQ_AXIS, *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def fsdp_shardings(mesh: Mesh, tree, min_size: int = 2 ** 14):
    """ZeRO-3-style sharding SPECS for params/optimizer state over the 'data'
    axis (a pytree of NamedSharding matching `tree`).

    The reference has no ZeRO/FSDP (SURVEY §2.5: "NO") — DDP replicates the
    whole optimizer state per GPU. On TPU the same mesh axis that shards the
    batch can also shard the parameter/optimizer buffers: each leaf is split
    along its largest dim divisible by the data-axis size, XLA all-gathers
    params where the forward needs them, reduce-scatters the gradients, and
    the AdamW update runs shard-wise — per-chip state memory drops ~linearly
    with the mesh (spiral-large's ~600 M-param class is the motivating case).
    Leaves smaller than `min_size` elements (biases, norm scales, scalars)
    stay replicated: gathering them costs more than storing them.
    """
    size = mesh.shape[DATA_AXIS]
    repl = NamedSharding(mesh, P())

    def spec(a):
        shape = tuple(getattr(a, "shape", ()))
        if not shape or int(np.prod(shape)) < min_size:
            return repl
        best_dim, best = -1, 0
        for i, d in enumerate(shape):
            if d % size == 0 and d > best:
                best_dim, best = i, d
        if best_dim < 0:
            return repl
        parts = [None] * len(shape)
        parts[best_dim] = DATA_AXIS
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, tree)


def shard_state_fsdp(mesh: Mesh, tree, min_size: int = 2 ** 14):
    """Place a train-state pytree with ZeRO-3-style sharding (see
    ``fsdp_shardings``). Pair with the step factory's ``state_shardings``
    argument so the updated state is pinned to the same placement (donated
    jit would otherwise let XLA re-decide the output layout)."""
    return jax.tree.map(
        jax.device_put, tree, fsdp_shardings(mesh, tree, min_size)
    )


def shard_params_tp(mesh: Mesh, tree):
    """Tensor-parallel parameter placement over the reserved 'model' axis:
    every rank>=2 leaf whose last (output-feature) dim divides the model-axis
    size is column-sharded; everything else is replicated. The train step
    itself is unchanged — XLA propagates the shardings and inserts the
    all-gathers/reduce-scatters (nothing in the reference requires TP,
    SURVEY §2.5; this keeps the mesh design demonstrably open for it)."""
    size = mesh.shape[MODEL_AXIS]
    repl = NamedSharding(mesh, P())

    def put(a):
        nd = getattr(a, "ndim", 0)
        if nd >= 2 and a.shape[-1] % size == 0 and a.shape[-1] >= size:
            spec = P(*([None] * (nd - 1) + [MODEL_AXIS]))
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.device_put(a, repl)

    return jax.tree.map(put, tree)
