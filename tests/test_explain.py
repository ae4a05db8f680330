"""Explainer tests: planted-signal recovery + geometry golden tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu.explain import (
    GemExplainer,
    GNNExplainer,
    HetGemExplainer,
    points_in_polygon,
)
from wsi_hgnn_tpu.graph import from_arrays, ops, to_homogeneous
from wsi_hgnn_tpu import models


def planted_graph(n=20, d=8, seed=0, n_signal=4):
    """Graph whose class evidence lives in the first `n_signal` nodes."""
    rng = np.random.RandomState(seed)
    feat = rng.randn(n, d).astype(np.float32) * 0.1
    feat[:n_signal] += 3.0  # signal nodes
    e = 3 * n
    src = rng.randint(0, n, e)
    dst = rng.randint(0, n, e)
    g = from_arrays(feat, src, dst, node_type=rng.randint(0, 3, n),
                    esign=rng.randint(0, 2, e), sim=rng.randn(e),
                    n_node_types=3, node_capacity=32, edge_capacity=128,
                    add_self_loops=True)
    return g


def make_model_fn(g):
    model = models.GCN(8, 16, 2, 2, graph_pooling_type="mean")
    gh = to_homogeneous(g)
    params = model.init(jax.random.PRNGKey(1), gh)

    def model_fn(graph, feat_override=None):
        if feat_override is not None:
            graph = graph.replace(feat=feat_override)
        return model.apply(params, to_homogeneous(graph), train=False)

    return model_fn


def test_edge_weight_masks_messages():
    g = planted_graph()
    h = np.asarray(ops.copy_u_sum(g, g.feat))
    g0 = g.replace(edge_weight=jnp.zeros(g.num_edges))
    h0 = np.asarray(ops.copy_u_sum(g0, g.feat))
    assert np.allclose(h0, 0)
    ghalf = g.replace(edge_weight=jnp.full(g.num_edges, 0.5))
    hh = np.asarray(ops.copy_u_sum(ghalf, g.feat))
    np.testing.assert_allclose(hh, h * 0.5, rtol=1e-6)


def test_gnn_explainer_runs_and_masks_in_range():
    g = planted_graph()
    model_fn = make_model_fn(g)
    explainer = GNNExplainer(g, model_fn, num_hops=1, epochs=20)
    out_g, node_mask = explainer.explain_node(None)
    assert node_mask.shape == (20,)
    assert np.all((node_mask >= 0) & (node_mask <= 1))
    assert out_g.edge_weight is not None
    # masks actually moved away from initialisation (optimisation happened)
    assert node_mask.std() > 1e-4


def test_gem_explainer_finds_signal_nodes():
    g = planted_graph()
    model_fn = make_model_fn(g)
    logits = model_fn(g)
    label = int(np.asarray(logits).argmax())
    gem = GemExplainer(g, lambda gr: model_fn(gr), label, batch_size=8)
    mask = gem.explain_node()
    assert mask.shape == (20,)
    assert mask.min() == 0.0 and mask.max() == 1.0  # min-max normalised
    # the reference formula CE(pred - pred_alt, label) (GEM.py:47) gives
    # influential nodes a LOW delta (removing them drops the label logit,
    # making the difference vector favour the label); assert the signal
    # group is cleanly separated from the background group either way
    assert abs(mask[:4].mean() - mask[4:].mean()) > 0.2


def test_het_gem_explainer_groups_by_type():
    g = planted_graph()
    model_fn = make_model_fn(g)
    label = int(np.asarray(model_fn(g)).argmax())
    gem = HetGemExplainer(g, lambda gr: model_fn(gr), label, batch_size=8)
    # edges collapsed to 'pos'
    assert int(np.asarray(gem.graph.esign).min()) == 1
    by_type = gem.explain_node()
    ntypes = np.asarray(g.node_type)[:20]
    for t in range(3):
        assert by_type[str(t)].shape == ((ntypes == t).sum(),)
    flat = gem.flat_scores()
    assert flat.shape == (20,)


# --------------------------------------------------------------------------
# Literal-fixture goldens (VERDICT r4 item 3): the explainer LOSSES are
# pinned against an independent NumPy oracle on a tiny UNPADDED graph (real
# == total nodes/edges, so the reference's mean-over-all and this repo's
# mean-over-real coincide exactly). A mis-weighted regulariser or a wrong
# optimisation step changes these numbers and fails here, the way
# test_convert_fixtures.py pins each model family.
#   GNNExplainer loss: prediction + edge size/entropy + feat size/entropy,
#     reference coefficients edge_size=0.005 feat_size=0.1 edge_ent=1.0
#     feat_ent=0.1 eps=1e-15 (/root/reference/explainers/gnn_explainer.py:
#     37-43,:84-103, constructor default feat_size=0.1 at :47-49).
#   GEM: delta_i = CE(pred - pred_without_i, label), min-max normalised
#     (/root/reference/explainers/GEM.py:31-54); HetGem: loss -
#     loss_without_i, unnormalised (gem_het.py:30-39).
# --------------------------------------------------------------------------

_GOLD_N, _GOLD_E, _GOLD_D, _GOLD_C = 6, 10, 4, 3


def _golden_graph():
    """Unpadded pinned graph: capacities == real counts."""
    rng = np.random.RandomState(42)
    feat = rng.randn(_GOLD_N, _GOLD_D).astype(np.float32)
    src = np.array([0, 1, 2, 3, 4, 5, 0, 2, 4, 1], np.int32)
    dst = np.array([1, 2, 3, 4, 5, 0, 3, 5, 1, 4], np.int32)
    g = from_arrays(
        feat, src, dst, node_type=rng.randint(0, 2, _GOLD_N),
        esign=rng.randint(0, 2, _GOLD_E), sim=rng.randn(_GOLD_E),
        n_node_types=2, node_capacity=_GOLD_N, edge_capacity=_GOLD_E,
    )
    W = rng.randn(_GOLD_D, _GOLD_C).astype(np.float32)
    return g, feat, src, dst, W


def _golden_model_fn(W):
    """Hand-replicable message-passing readout that honours edge_weight and
    both masks the way the zoo does (messages killed by edge_mask/weight,
    pooling over real nodes)."""
    def model_fn(graph, feat_override=None):
        h = graph.feat if feat_override is None else feat_override
        nm = graph.node_mask.astype(jnp.float32)
        em = graph.edge_mask.astype(jnp.float32)
        ew = (jnp.ones(graph.num_edges, jnp.float32)
              if graph.edge_weight is None else graph.edge_weight)
        h = h * nm[:, None]
        msg = h[graph.src] * (ew * em)[:, None]
        agg = jnp.zeros_like(h).at[graph.dst].add(msg)
        pooled = (agg * nm[:, None]).sum(0) / jnp.maximum(nm.sum(), 1.0)
        return (pooled @ jnp.asarray(W))[None]
    return model_fn


def _np_forward(feat, src, dst, W, node_sig, edge_sig, dead_node=None):
    """float64 oracle of _golden_model_fn under mask multipliers."""
    h = feat.astype(np.float64) * node_sig[:, None]
    agg = np.zeros_like(h)
    for e in range(len(src)):
        if dead_node is not None and (src[e] == dead_node or dst[e] == dead_node):
            continue
        agg[dst[e]] += h[src[e]] * edge_sig[e]
    keep = np.ones(len(feat), bool)
    if dead_node is not None:
        keep[dead_node] = False
        agg[~keep] = 0.0
        h_count = keep.sum()
    else:
        h_count = len(feat)
    pooled = agg[keep].sum(0) / h_count if dead_node is not None \
        else agg.sum(0) / h_count
    return pooled @ W.astype(np.float64)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_gnnexplainer_loss(feat, src, dst, W, node_logits, edge_logits,
                          pred_label, edge_size, feat_size, edge_ent,
                          feat_ent, eps=1e-15):
    """The reference loss, term for term (gnn_explainer.py:84-103)."""
    mn = _sigmoid(node_logits.astype(np.float64))
    me = _sigmoid(edge_logits.astype(np.float64))
    logits = _np_forward(feat, src, dst, W, mn, me)
    loss = -logits[pred_label]
    loss += me.sum() * edge_size
    ent_e = -me * np.log(me + eps) - (1 - me) * np.log(1 - me + eps)
    loss += edge_ent * ent_e.mean()
    loss += mn.mean() * feat_size
    ent_n = -mn * np.log(mn + eps) - (1 - mn) * np.log(1 - mn + eps)
    loss += feat_ent * ent_n.mean()
    return float(loss)


def test_gnn_explainer_loss_golden():
    """The jitted explainer step's LOSS equals the NumPy oracle under THREE
    coefficient settings (over-determined: any single mis-weighted
    regulariser term breaks at least one setting)."""
    from wsi_hgnn_tpu.explain.gnn_explainer import _step_fn

    g, feat, src, dst, W = _golden_graph()
    model_fn = _golden_model_fn(W)
    pred_label = 1
    rng = np.random.RandomState(3)
    masks0 = {
        "node": jnp.asarray(rng.randn(_GOLD_N).astype(np.float32)),
        "edge": jnp.asarray(rng.randn(_GOLD_E).astype(np.float32)),
    }
    settings = [
        (0.005, 0.1, 1.0, 0.1),   # the reference operating point
        (0.3, 0.7, 2.0, 0.5),
        (1.0, 0.0, 0.0, 3.0),
    ]
    for edge_size, feat_size, edge_ent, feat_ent in settings:
        tx, step = _step_fn(model_fn, edge_size, feat_size, edge_ent,
                            feat_ent, 1e-15, 0.01)
        _, _, loss = step(masks0, tx.init(masks0), g, pred_label)
        expect = _np_gnnexplainer_loss(
            feat, src, dst, W, np.asarray(masks0["node"]),
            np.asarray(masks0["edge"]), pred_label,
            edge_size, feat_size, edge_ent, feat_ent,
        )
        np.testing.assert_allclose(float(loss), expect, rtol=3e-5,
                                   err_msg=str((edge_size, feat_size,
                                                edge_ent, feat_ent)))


def test_gnn_explainer_adam_step_golden():
    """One mask Adam update equals the closed form at t=1 (optax adam,
    b1=.9 b2=.999 eps=1e-8: update = -lr * g / (|g| + eps)) with g from
    float64 central finite differences of the NumPy loss oracle."""
    from wsi_hgnn_tpu.explain.gnn_explainer import _step_fn

    g, feat, src, dst, W = _golden_graph()
    model_fn = _golden_model_fn(W)
    pred_label, lr = 1, 0.01
    coeffs = (0.005, 0.1, 1.0, 0.1)
    rng = np.random.RandomState(5)
    node0 = rng.randn(_GOLD_N).astype(np.float32)
    edge0 = rng.randn(_GOLD_E).astype(np.float32)
    masks0 = {"node": jnp.asarray(node0), "edge": jnp.asarray(edge0)}

    tx, step = _step_fn(model_fn, *coeffs, 1e-15, lr)
    masks1, _, _ = step(masks0, tx.init(masks0), g, pred_label)

    def loss_at(nl, el):
        return _np_gnnexplainer_loss(feat, src, dst, W, nl, el,
                                     pred_label, *coeffs)

    h = 1e-5
    grad_n = np.zeros(_GOLD_N)
    for i in range(_GOLD_N):
        up, dn = node0.astype(np.float64).copy(), node0.astype(np.float64).copy()
        up[i] += h
        dn[i] -= h
        grad_n[i] = (loss_at(up, edge0) - loss_at(dn, edge0)) / (2 * h)
    grad_e = np.zeros(_GOLD_E)
    for i in range(_GOLD_E):
        up, dn = edge0.astype(np.float64).copy(), edge0.astype(np.float64).copy()
        up[i] += h
        dn[i] -= h
        grad_e[i] = (loss_at(node0, up) - loss_at(node0, dn)) / (2 * h)

    exp_node = node0 - lr * grad_n / (np.abs(grad_n) + 1e-8)
    exp_edge = edge0 - lr * grad_e / (np.abs(grad_e) + 1e-8)
    np.testing.assert_allclose(np.asarray(masks1["node"]), exp_node, atol=2e-5)
    np.testing.assert_allclose(np.asarray(masks1["edge"]), exp_edge, atol=2e-5)


def _np_ce(logits, label):
    z = logits - logits.max()
    return float(-(z[label] - np.log(np.exp(z).sum())))


def test_gnn_explainer_trajectory_matches_torch():
    """The FULL mask optimisation (30 compounded Adam steps through
    GNNExplainer.explain_node, the public API) lands on the same masks as
    an independent torch twin of the reference loop
    (gnn_explainer.py:71-77 init, :84-103 loss, :172-181 Adam loop) run
    from the identical initialisation. Extends the single-step goldens to
    the multi-step composition: a mis-weighted regulariser, a wrong Adam
    hyperparameter, or a drifting mask pytree would compound and diverge."""
    torch = pytest.importorskip("torch")
    from math import sqrt

    g, feat, src, dst, W = _golden_graph()
    model_fn = _golden_model_fn(W)
    epochs, lr, seed = 30, 0.01, 9
    coeffs = dict(edge_size=0.005, feat_size=0.1, edge_ent=1.0,
                  feat_ent=0.1, eps=1e-15)

    explainer = GNNExplainer(g, model_fn, num_hops=1, epochs=epochs,
                             lr=lr, edge_size=coeffs["edge_size"],
                             feat_size=coeffs["feat_size"], seed=seed)
    out_g, node_mask = explainer.explain_node(None)
    edge_mask = np.asarray(out_g.edge_weight)

    # replicate explain_node's deterministic init (gnn_explainer.py:76:
    # node noise * 0.1, edge std = relu gain over real nodes)
    n, e = feat.shape[0], len(src)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    node0 = np.asarray(jax.random.normal(k1, (n,))) * 0.1
    std = sqrt(2.0) * sqrt(2.0 / (2 * n))
    edge0 = np.asarray(jax.random.normal(k2, (e,))) * std

    pred_label = int(np.asarray(model_fn(g, None)).reshape(-1).argmax())
    node_l = torch.nn.Parameter(torch.from_numpy(node0.astype(np.float32)))
    edge_l = torch.nn.Parameter(torch.from_numpy(edge0.astype(np.float32)))
    opt = torch.optim.Adam([node_l, edge_l], lr=lr)
    tfeat = torch.from_numpy(feat)
    tsrc = torch.from_numpy(src.astype(np.int64))
    tdst = torch.from_numpy(dst.astype(np.int64))
    tW = torch.from_numpy(W)
    eps = coeffs["eps"]
    for _ in range(epochs):
        opt.zero_grad()
        mn, me = torch.sigmoid(node_l), torch.sigmoid(edge_l)
        h = tfeat * mn[:, None]
        agg = torch.zeros_like(h).index_add(0, tdst, h[tsrc] * me[:, None])
        logits = (agg.sum(0) / n) @ tW
        loss = -logits[pred_label]
        loss = loss + me.sum() * coeffs["edge_size"]
        ent_e = -me * torch.log(me + eps) - (1 - me) * torch.log(1 - me + eps)
        loss = loss + coeffs["edge_ent"] * ent_e.mean()
        loss = loss + mn.mean() * coeffs["feat_size"]
        ent_n = -mn * torch.log(mn + eps) - (1 - mn) * torch.log(1 - mn + eps)
        loss = loss + coeffs["feat_ent"] * ent_n.mean()
        loss.backward()
        opt.step()

    with torch.no_grad():
        np.testing.assert_allclose(
            node_mask, torch.sigmoid(node_l).numpy(), atol=1e-4, rtol=0,
            err_msg="node mask diverged from the torch twin")
        np.testing.assert_allclose(
            edge_mask, torch.sigmoid(edge_l).numpy(), atol=1e-4, rtol=0,
            err_msg="edge mask diverged from the torch twin")
    # and the optimisation actually moved the masks
    assert np.abs(node_mask - _sigmoid(node0)).max() > 1e-3


def test_gem_loss_delta_golden():
    """GemExplainer's full score vector equals the NumPy leave-one-out
    oracle: delta_i = CE(pred - pred_without_i, label), min-max normalised
    (GEM.py:31-54); HetGem's flat_scores equals loss - loss_without_i
    (gem_het.py:30-39)."""
    g, feat, src, dst, W = _golden_graph()
    model_fn = _golden_model_fn(W)
    label = 2
    ones_e = np.ones(_GOLD_E)
    pred = _np_forward(feat, src, dst, W, np.ones(_GOLD_N), ones_e)

    deltas = np.zeros(_GOLD_N)
    het_deltas = np.zeros(_GOLD_N)
    base_loss = _np_ce(pred, label)
    for i in range(_GOLD_N):
        alt = _np_forward(feat, src, dst, W, np.ones(_GOLD_N), ones_e,
                          dead_node=i)
        deltas[i] = _np_ce(pred - alt, label)
        het_deltas[i] = base_loss - _np_ce(alt, label)
    lo, hi = deltas.min(), deltas.max()
    expect = (deltas - lo) / (hi - lo)

    gem = GemExplainer(g, lambda gr: model_fn(gr), label, batch_size=4)
    np.testing.assert_allclose(gem.explain_node(), expect, atol=1e-5)

    het = HetGemExplainer(g, lambda gr: model_fn(gr), label, batch_size=4)
    np.testing.assert_allclose(het.flat_scores(), het_deltas, atol=1e-5)


def test_points_in_polygon_golden():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    pts = np.array([[5, 5], [15, 5], [-1, -1], [9.99, 9.99], [5, 20]], float)
    inside = points_in_polygon(pts, square)
    np.testing.assert_array_equal(inside, [True, False, False, True, False])
    # concave polygon
    concave = np.array([[0, 0], [10, 0], [10, 10], [5, 5], [0, 10]], float)
    pts = np.array([[5, 8], [2, 6], [8, 6]], float)
    inside = points_in_polygon(pts, concave)
    np.testing.assert_array_equal(inside, [False, True, True])


# --------------------------------------------------------------------------
# C14 orchestration fixture: the full ExplainGraph.eval() loop on a
# synthetic thumbnail + toy annotation XML + planted-signal graph
# (reference evaluator/explain_graphs.py:151-184)
# --------------------------------------------------------------------------

_XML_TMPL = """<?xml version="1.0"?>
<ASAP_Annotations><Annotations><Annotation Type="Polygon">
<Coordinates>
<Coordinate Order="0" X="0" Y="0"/>
<Coordinate Order="1" X="1024" Y="0"/>
<Coordinate Order="2" X="1024" Y="1024"/>
<Coordinate Order="3" X="0" Y="1024"/>
</Coordinates>
</Annotation></Annotations></ASAP_Annotations>
"""


def _c16_fixture(tmp_path, slides=("test_001", "test_002")):
    """4x4 tile grid per slide, level 2, patch 256: tile (col,row) has its
    level-0 centre at (512*col+256, 512*row+256); the annotation polygon
    covers [0,1024]^2, so exactly the col<2 & row<2 tiles are tumor."""
    from PIL import Image

    from wsi_hgnn_tpu.data import save_graph_npz

    patches = tmp_path / "patches"
    wsis = tmp_path / "wsis"
    annots = tmp_path / "annots"
    graphs = tmp_path / "graphs"
    for d in (patches, wsis, annots, graphs):
        d.mkdir()

    rng = np.random.RandomState(0)
    paths = []
    for slide in slides:
        pd = patches / slide
        pd.mkdir()
        tumor = np.zeros(16, np.float32)
        for i in range(16):
            col, row = i // 4, i % 4
            (pd / f"{col}_{row}.jpeg").touch()  # only the NAME is consumed
            tumor[i] = float(col < 2 and row < 2)
        # planted signal: channel 0 marks tumor tiles
        feat = rng.randn(16, 8).astype(np.float32) * 0.1
        feat[:, 0] = tumor * 3.0
        src = np.arange(16, dtype=np.int64)
        dst = np.roll(src, 1)
        save_graph_npz(
            str(graphs / f"{slide}.npz"), feat, src, dst,
            esign=np.ones(16, np.int64),
            sim=np.ones(16, np.float32), n_node_types=1, is_hetero=False,
        )
        paths.append(str(graphs / f"{slide}.npz"))
        Image.fromarray(np.zeros((2048, 2048, 3), np.uint8)).save(
            wsis / f"{slide}.png"
        )
        (annots / f"{slide}.xml").write_text(_XML_TMPL)

    (tmp_path / "eval_list.txt").write_text("\n".join(paths))
    (tmp_path / "reference.csv").write_text(
        "NAME,LABEL\n" + "\n".join(f"{s},Tumor" for s in slides) + "\n"
    )

    cfg = {
        "datasets": {
            "dataset": "C16",
            "patches_path": str(patches) + "/",
            "wsi_path": str(wsis) + "/",
            "eval_path": str(tmp_path / "eval_list.txt"),
            "reference_csv": str(tmp_path / "reference.csv"),
        },
        "checkpoint": {"path": str(tmp_path / "ckpt")},
        "GNN": {
            "name": "GCN", "num_layers": 2, "in_dim": 8, "hidden_dim": 16,
            "out_dim": 2, "feat_drop": 0.0, "graph_pooling_type": "mean",
        },
        "eval": {
            "explainer_name": "GemExplainer",
            "explain_path": str(tmp_path / "plots") + "/",
            "annotation_path": str(annots) + "/",
            "level": 2,
            "patch_size": 256,
        },
    }

    # ExplainGraph loads its trained weights LOUDLY (the reference's
    # load_state_dict semantics) — write a checkpoint for the fixture
    import jax

    from wsi_hgnn_tpu.config import parse_gnn_model
    from wsi_hgnn_tpu.graph import from_arrays
    from wsi_hgnn_tpu.train.checkpoint import CheckpointManager

    model, _ = parse_gnn_model(cfg["GNN"])
    g0 = from_arrays(feat, src, dst, n_node_types=1)
    variables = model.init(jax.random.PRNGKey(0), g0)
    CheckpointManager(cfg["checkpoint"]["path"]).write_new_version(
        cfg, {"params": variables["params"], "batch_stats": {}}, {"Epoch": 1}
    )
    return cfg


def test_explain_graph_eval_full_loop(tmp_path, monkeypatch):
    """The whole C14 loop — XML polygons -> patch coords -> per-slide
    ROC-AUC -> overlay images. The explainer itself has separate
    planted-signal tests above; here it is pinned to the planted channel so
    the coordinate/label plumbing must give per-slide AUC == 1.0."""
    pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    from wsi_hgnn_tpu.explain.explain_graphs import ExplainGraph

    cfg = _c16_fixture(tmp_path)
    # a stray SUBDIRECTORY in a patch dir must not shift/crash the
    # coordinate mapping: the graph's node order came from list_patches
    # (sorted files only — a dotfile would already have crashed graph
    # construction loudly at decode), so get_patch_coords must enumerate
    # identically
    (tmp_path / "patches" / "test_001" / "thumbs").mkdir()
    eg = ExplainGraph(cfg)
    assert len(eg.eval_data) == 2  # both slides are tumor-labelled
    assert len(eg.get_patch_coords("test_001")) == 16  # stray dir ignored

    monkeypatch.setattr(
        ExplainGraph, "explain_one",
        lambda self, graph, label: np.asarray(graph.feat)[
            : int(np.asarray(graph.node_mask).sum()), 0
        ],
    )
    aucs = eg.eval()
    assert len(aucs) == 2
    np.testing.assert_allclose(aucs, 1.0)
    for slide in ("test_001", "test_002"):
        assert (tmp_path / "plots" / f"{slide}.png").exists()
        assert (tmp_path / "plots" / f"{slide}.jpeg").exists()


def test_explain_graph_eval_real_explainer(tmp_path):
    """Same loop with the real GemExplainer + random-init GCN: must run end
    to end and produce finite AUCs (no accuracy claim from random weights).
    Both slides must reuse ONE compiled leave-one-out chunk program — the
    gem.py lru_cache keys on the model callable, so explain_one has to
    pass the stable bound method, not a per-slide lambda (a fresh lambda
    per slide meant a multi-second XLA recompile per slide on TPU)."""
    pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    from wsi_hgnn_tpu.explain import gem
    from wsi_hgnn_tpu.explain.explain_graphs import ExplainGraph

    cfg = _c16_fixture(tmp_path, slides=("test_003", "test_004"))
    eg = ExplainGraph(cfg)
    gem._gem_chunk_fn.cache_clear()
    aucs = eg.eval()
    assert len(aucs) == 2 and np.isfinite(aucs).all()
    info = gem._gem_chunk_fn.cache_info()
    assert info.misses == 1 and info.hits >= 1


def test_explain_graph_requires_checkpoint(tmp_path):
    """A missing checkpoint must raise (the reference loads its trained
    weights loudly, explain_graphs.py:42-43) — explaining random weights
    would print plausible-looking AUCs."""
    pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    import shutil

    from wsi_hgnn_tpu.explain.explain_graphs import ExplainGraph

    cfg = _c16_fixture(tmp_path, slides=("test_009",))
    shutil.rmtree(cfg["checkpoint"]["path"])
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        ExplainGraph(cfg)
