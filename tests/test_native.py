"""Native C++ packer tests: equality with the NumPy path + sort golden."""
import numpy as np
import pytest

from wsi_hgnn_tpu import native
from wsi_hgnn_tpu.graph import batch_graphs, from_arrays


def make(n, e, seed):
    rng = np.random.RandomState(seed)
    return from_arrays(
        rng.randn(n, 8).astype(np.float32),
        rng.randint(0, n, e), rng.randint(0, n, e),
        node_type=rng.randint(0, 6, n), esign=rng.randint(0, 2, e),
        sim=rng.randn(e), n_node_types=6,
        node_capacity=64, edge_capacity=128,
    )


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ toolchain expected in this environment"


def test_native_pack_matches_numpy():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    graphs = [make(10, 30, 1), make(20, 50, 2), make(5, 12, 3)]

    gb_native = batch_graphs(graphs, node_capacity=64, edge_capacity=128)

    # force the numpy path by monkeypatching
    import wsi_hgnn_tpu.native as nat

    orig = nat.pack_batch_native
    try:
        nat.pack_batch_native = lambda *a, **k: None
        gb_np = batch_graphs(graphs, node_capacity=64, edge_capacity=128)
    finally:
        nat.pack_batch_native = orig

    for field in ("feat", "node_type", "node_graph", "node_mask", "src",
                  "dst", "esign", "sim", "edge_mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(gb_native, field)),
            np.asarray(getattr(gb_np, field)),
            err_msg=field,
        )


def test_native_pack_capacity_error():
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    graphs = [make(40, 100, 4), make(40, 100, 5)]
    with pytest.raises(ValueError):
        batch_graphs(graphs, node_capacity=64, edge_capacity=128)


def test_native_sort_edges():
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 50, 1000).astype(np.int64)
    perm = native.sort_edges_native(keys, 50)
    sorted_keys = keys[perm]
    assert np.all(np.diff(sorted_keys) >= 0)
    # stable: equal keys keep original order
    for k in range(50):
        orig_order = np.where(keys == k)[0]
        np.testing.assert_array_equal(perm[sorted_keys == k], orig_order)
    with pytest.raises(ValueError):
        native.sort_edges_native(np.array([60], np.int64), 50)


def test_numpy_fallback_keeps_edge_weight():
    """The explainer's per-edge mask must survive batching on the NumPy
    fallback path too (the native packer already carries it)."""
    graphs = [make(6, 14, 4), make(4, 9, 5)]
    graphs = [
        g.replace(edge_weight=np.linspace(0.1, 0.9, len(np.asarray(g.src)))
                  .astype(np.float32))
        for g in graphs
    ]
    import wsi_hgnn_tpu.native as nat

    orig = nat.pack_batch_native
    try:
        nat.pack_batch_native = lambda *a, **k: None
        gb = batch_graphs(graphs, node_capacity=16, edge_capacity=32)
    finally:
        nat.pack_batch_native = orig
    assert gb.edge_weight is not None
    e1 = int(np.asarray(graphs[0].edge_mask).sum())
    e2 = int(np.asarray(graphs[1].edge_mask).sum())
    np.testing.assert_allclose(np.asarray(gb.edge_weight)[:e1],
                               np.asarray(graphs[0].edge_weight)[:e1])
    np.testing.assert_allclose(np.asarray(gb.edge_weight)[e1:e1 + e2],
                               np.asarray(graphs[1].edge_weight)[:e2])
