"""Device mesh + sharding layer — the framework's single communication
abstraction (SURVEY.md §2.4).

The reference has no distributed layer beyond single-process
`torch.nn.DataParallel` around the featurizer CNNs
(/root/reference/construct_graph/graph_constructor.py:124,179). Here one
`jax.sharding.Mesh` serves every parallel axis:

  * data parallelism: slides/batches sharded over the 'data' axis, params
    replicated, gradient all-reduce inserted by XLA (ICI collectives);
  * featurizer patch-sharding: patch batches sharded the same way;
  * (reserved) node-sharded big-graph mode for slides that exceed one
    core's HBM — 'graph-context parallelism'.

Everything works unchanged on a forced-host CPU mesh for testing.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import TypedGraph

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stack_graphs(graphs: Sequence[TypedGraph]) -> TypedGraph:
    """Stack equal-shape TypedGraphs along a new leading device axis.

    The result is a TypedGraph whose arrays are [n_dev, ...]; models consume
    it through `jax.vmap` with the leading axis sharded over the mesh —
    pure data parallelism with zero resharding.
    """
    g0 = graphs[0]
    # host numpy stacking (loader leaves are host numpy by contract —
    # jnp.stack would commit to the default device, and shard_stacked's
    # device_put would then transfer a second time)
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *graphs
    )
    return stacked.replace(
        n_graphs=g0.n_graphs,
        n_node_types=g0.n_node_types,
        n_edge_types=g0.n_edge_types,
    )


def shard_stacked(stacked, mesh: Mesh):
    """Place a stacked pytree with its leading axis sharded over the mesh."""
    sh = data_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def make_sharded_batch_apply(fn, mesh: Mesh):
    """DP forward with PER-DEVICE unbatched programs: `fn(batch) -> pytree
    of [B, ...]` is shard_mapped over the batch dim, so each device runs
    the original single-device program on its local slice — Pallas kernels
    and other SPMD-opaque ops inside need no partitioning rules (unlike
    make_dp_featurizer's sharding-annotation form, which relies on XLA to
    partition the batched program). Used by the constructor pipeline to
    scale the two-CNN patch stream over all local devices — the TPU-native
    successor of the reference's `torch.nn.DataParallel` around its
    featurizer CNNs (/root/reference/construct_graph/graph_constructor.py:
    124,179).

    The global batch must be divisible by the mesh size (callers pad);
    closures over weights are allowed (replicated). Outputs keep the batch
    dim sharded; np.asarray on them gathers to host."""
    # check_vma=False: pallas_call outputs (the fused KimiaNet path) carry
    # no varying-mesh-axes annotation, which the replication checker needs
    body = jax.shard_map(
        fn, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(body)


def make_dp_featurizer(apply_fn, mesh: Mesh):
    """Data-parallel featurizer forward: patches sharded on the batch dim,
    params replicated — the TPU-native successor of the reference's
    `torch.nn.DataParallel` around its featurizer CNNs
    (/root/reference/construct_graph/graph_constructor.py:124,179).

    apply_fn(variables, patches) -> features. XLA inserts the scatter over
    ICI; there is no gather — downstream graph construction consumes the
    sharded features in place. Batch size must be divisible by the mesh.
    """
    rep = replicated(mesh)
    sh = data_sharded(mesh)
    return jax.jit(apply_fn, in_shardings=(rep, sh), out_shardings=sh)
