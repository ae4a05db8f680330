"""Converter smoke test: reference pickled-DGL graphs -> .npz -> TypedGraph.

tools/convert_reference_graphs.py is the first step of the AUC-parity
runbook (README "Reproducing the reference's numbers"): a data-holding user
unpickles the reference's DGL graphs (/root/reference/get_graph.py:279-289)
and re-emits them as this framework's npz graphs. No real DGL here — the
converter only touches the DGL *object API* (ntypes/num_nodes/edges/data),
so a pure-python shim stands in, with torch tensors for the `.numpy()`
calls (torch is a framework dependency already).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from wsi_hgnn_tpu.data import load_graph_npz, save_graph_npz  # noqa: E402


class _NodeView:
    def __init__(self, data):
        self.data = data


# the converter accesses g.edges(etype=...) AND g.edges[(s,e,d)].data —
# DGL's edges attribute is both callable and subscriptable
class _EdgeView:
    def __init__(self, graph):
        self._g = graph

    def __call__(self, etype=None):
        return self._g._edges[etype]

    def __getitem__(self, k):
        return _NodeView({"sim": self._g._sims[k]} if k in self._g._sims else {})


class FakeHeteroGraph:
    """The slice of the DGL heterograph API the converter consumes:
    ntypes, num_nodes(nt), nodes[nt].data['feat'], canonical_etypes,
    edges(etype=...), edges[(s,e,d)].data['sim']."""

    def __init__(self, feats_by_type, edges_by_canonical, sims):
        import torch

        self._feats = {nt: torch.tensor(f) for nt, f in feats_by_type.items()}
        self._edges = {
            k: (torch.tensor(u), torch.tensor(v))
            for k, (u, v) in edges_by_canonical.items()
        }
        self._sims = {k: torch.tensor(s) for k, s in sims.items()}
        self.ntypes = list(feats_by_type)
        self.canonical_etypes = list(edges_by_canonical)
        self.nodes = {nt: _NodeView({"feat": t}) for nt, t in self._feats.items()}
        self.edges = _EdgeView(self)

    def num_nodes(self, nt):
        return self._feats[nt].shape[0]


class FakeHomoGraph:
    def __init__(self, feat, src, dst, etype_ids, sim):
        import torch

        self.ndata = {"feat": torch.tensor(feat)}
        self.edata = {"_TYPE": torch.tensor(etype_ids), "sim": torch.tensor(sim)}
        self._src = torch.tensor(src)
        self._dst = torch.tensor(dst)

    def edges(self):
        return self._src, self._dst

    def num_nodes(self):
        return self.ndata["feat"].shape[0]


@pytest.fixture()
def fake_hetero():
    rng = np.random.RandomState(0)
    # 3 populated node types out of 6 (DGL drops empty ones), unsorted names
    feats = {
        "2": rng.randn(3, 16).astype(np.float32),
        "0": rng.randn(2, 16).astype(np.float32),
        "5": rng.randn(1, 16).astype(np.float32),
    }
    edges = {
        ("0", "pos", "2"): (np.array([0, 1]), np.array([1, 2])),
        ("2", "neg", "0"): (np.array([0]), np.array([1])),
        ("2", "pos", "5"): (np.array([2]), np.array([0])),
        ("5", "neg", "5"): (np.array([], np.int64), np.array([], np.int64)),
    }
    sims = {
        ("0", "pos", "2"): np.array([0.5, 0.25], np.float32),
        ("2", "neg", "0"): np.array([-0.75], np.float32),
        ("2", "pos", "5"): np.array([0.125], np.float32),
    }
    return FakeHeteroGraph(feats, edges, sims), feats


def test_convert_hetero_roundtrip(tmp_path, fake_hetero):
    from convert_reference_graphs import convert_hetero

    g, feats = fake_hetero
    d = convert_hetero(g)

    # node order is type-major over SORTED int type names: 0(2), 2(3), 5(1)
    np.testing.assert_allclose(
        d["feat"], np.concatenate([feats["0"], feats["2"], feats["5"]])
    )
    np.testing.assert_array_equal(d["node_type"], [0, 0, 2, 2, 2, 5])
    # ("0","pos","2"): src 0,1 -> global 0,1; dst 1,2 -> offset 2 -> 3,4
    # ("2","neg","0"): src 0 -> 2; dst 1 -> 1
    # ("2","pos","5"): src 2 -> 4; dst 0 -> offset 5 -> 5
    np.testing.assert_array_equal(d["src"], [0, 1, 2, 4])
    np.testing.assert_array_equal(d["dst"], [3, 4, 1, 5])
    np.testing.assert_array_equal(d["esign"], [1, 1, 0, 1])
    np.testing.assert_allclose(d["sim"], [0.5, 0.25, -0.75, 0.125])

    save_graph_npz(str(tmp_path / "s.npz"), **d)
    tg = load_graph_npz(str(tmp_path / "s.npz"))
    assert not tg.is_homogeneous
    # graphs load padded to a capacity bucket; the masks carry real counts
    assert int(np.asarray(tg.node_mask).sum()) == 6
    assert int(np.asarray(tg.edge_mask).sum()) == 4
    np.testing.assert_array_equal(np.asarray(tg.node_type)[:6], d["node_type"])
    np.testing.assert_allclose(np.asarray(tg.feat)[:6], d["feat"])


def test_convert_homo_roundtrip(tmp_path):
    from convert_reference_graphs import convert_homo

    rng = np.random.RandomState(1)
    feat = rng.randn(4, 8).astype(np.float32)
    g = FakeHomoGraph(
        feat,
        src=np.array([0, 1, 2]), dst=np.array([1, 2, 3]),
        etype_ids=np.array([1, 0, 1], np.int64),
        sim=np.array([0.5, -0.5, 0.25], np.float32),
    )
    d = convert_homo(g)
    np.testing.assert_array_equal(d["esign"], [1, 0, 1])
    assert d["node_type"] is None and d["is_hetero"] is False

    save_graph_npz(str(tmp_path / "h.npz"), **d)
    tg = load_graph_npz(str(tmp_path / "h.npz"))
    # homogeneous load adds self loops (reference data.py:120-121)
    assert tg.is_homogeneous
    assert int(np.asarray(tg.node_mask).sum()) == 4
    assert int(np.asarray(tg.edge_mask).sum()) == 3 + 4


def test_converted_graph_trains_one_step(tmp_path, fake_hetero):
    """A converted hetero graph drives the real HEAT4 forward."""
    import jax

    from convert_reference_graphs import convert_hetero
    from wsi_hgnn_tpu.graph.batch import batch_graphs
    from wsi_hgnn_tpu.models import HEATNet4

    g, _ = fake_hetero
    d = convert_hetero(g)
    save_graph_npz(str(tmp_path / "s.npz"), **d)
    tg = load_graph_npz(str(tmp_path / "s.npz"))
    batched = batch_graphs([tg])

    model = HEATNet4(in_dim=16, hidden_dim=8, out_dim=2, n_layers=1,
                     n_heads=2, n_node_types=6, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), batched)
    logits = model.apply(params, batched, train=False)
    assert logits.shape == (1, 2) and np.all(np.isfinite(np.asarray(logits)))
