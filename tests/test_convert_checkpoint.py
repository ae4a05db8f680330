"""Reference-checkpoint conversion (tools/convert_reference_checkpoint.py).

Round-trip strategy: build OUR model's params, project them into a
synthetic reference-style torch state dict (the inverse mapping, written
here with torch's documented layouts: nn.Linear weight [out, in], DGL
GraphConv weight [in, out], Conv1d weight [1, C, 1], edge_types-major
relation enumeration), run the converter, and require the recovered tree
to equal the original exactly. Then drive a converted checkpoint through
SlidePredictor to pin the end-to-end migration path.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu import models
from wsi_hgnn_tpu.graph import to_homogeneous
from wsi_hgnn_tpu.graph.build import build_batch_device

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_reference_checkpoint import (  # noqa: E402
    _rel_perm,
    convert_gnn_state_dict,
)

T, D, H = 6, 8, 16
EDGE_TYPES = ["pos", "neg"]  # the reference configs' order (HGT_Kimia_v2.yml)


def graph():
    rng = np.random.RandomState(0)
    return build_batch_device(
        rng.randn(1, 32, D).astype(np.float32),
        rng.randint(0, T, (1, 32)).astype(np.int32),
        np.ones((1, 32), bool), 4, T,
    )


def typed_to_sd(sd, fmt, p):
    for t in range(p["kernel"].shape[0]):
        sd[fmt.format(t=t) + ".weight"] = np.asarray(p["kernel"][t]).T
        sd[fmt.format(t=t) + ".bias"] = np.asarray(p["bias"][t])


def lin_to_sd(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["kernel"]).T
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def assert_trees_equal(got, want):
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0),
        got, want,
    )


def heat_layers_to_sd(sd, params, n_layers):
    for i in range(n_layers):
        layer = params[f"gcs_{i}"]
        for name in ("k_linears", "q_linears", "v_linears", "a_linears"):
            typed_to_sd(sd, f"gcs.{i}.{name}.{{t}}", layer[name])
        sd[f"gcs.{i}.skip"] = np.asarray(layer["skip"])


@pytest.mark.parametrize("which", ["HEAT2", "HEAT4"])
def test_heat_round_trip(which):
    cls = models.HEATNet4 if which == "HEAT4" else models.HEATNet2
    model = cls(in_dim=D, hidden_dim=H, out_dim=2, n_layers=2, n_heads=2,
                n_node_types=T)
    params = model.init(jax.random.PRNGKey(0), graph())["params"]

    sd = {}
    typed_to_sd(sd, "adapt_ws.{t}", params["adapt_ws"])
    heat_layers_to_sd(sd, params, 2)
    for i in range(2):
        lin_to_sd(sd, f"gcs.{i}.e_linear", params[f"gcs_{i}"]["e_linear"])
    typed_to_sd(sd, "linears_prediction.{t}", params["linears_prediction"])
    if which == "HEAT4":
        for t in range(T):
            # Conv1d(C, 1, 1, bias=False): weight [1, C, 1]
            sd[f"attn.{t}.op.weight"] = (
                np.asarray(params[f"attn_{t}"]["op"]["kernel"])[None, :, :])
        for head in ("head_2", "head_1", "head"):
            lin_to_sd(sd, head, params[head])

    cfg = {"name": which, "n_node_types": T, "num_layers": 2,
           "edge_types": EDGE_TYPES}
    got = convert_gnn_state_dict(cfg, sd)["params"]
    assert_trees_equal(got, params)


def test_hgt_round_trip():
    model = models.HGT(in_dim=D, hidden_dim=H, out_dim=2, n_layers=2,
                       n_heads=2, n_node_types=T)
    params = model.init(jax.random.PRNGKey(1), graph())["params"]

    perm = _rel_perm(EDGE_TYPES, T)
    sd = {}
    typed_to_sd(sd, "adapt_ws.{t}", params["adapt_ws"])
    heat_layers_to_sd(sd, params, 2)
    for i in range(2):
        layer = params[f"gcs_{i}"]
        for t in range(T):
            sd[f"gcs.{i}.norms.{t}.weight"] = np.asarray(layer["norms"]["scale"][t])
            sd[f"gcs.{i}.norms.{t}.bias"] = np.asarray(layer["norms"]["bias"][t])
        for rel in ("relation_att", "relation_msg", "relation_pri"):
            ours = np.asarray(layer[rel])
            ref = np.empty_like(ours)
            ref[perm] = ours  # inverse of ours = ref[perm]
            sd[f"gcs.{i}.{rel}"] = ref
        typed_to_sd(sd, f"linears_prediction.{{t}}.{i}", params[f"pred_{i}"])

    cfg = {"name": "HGT", "n_node_types": T, "num_layers": 2,
           "edge_types": EDGE_TYPES}
    got = convert_gnn_state_dict(cfg, sd)["params"]
    assert_trees_equal(got, params)


def test_hetrgcn_round_trip():
    model = models.HetRGCN(in_dim=D, hidden_dim=H, out_dim=2, n_layers=2,
                           n_node_types=T)
    params = model.init(jax.random.PRNGKey(2), graph())["params"]

    perm = _rel_perm(EDGE_TYPES, T)
    sd = {}
    typed_to_sd(sd, "adapt_ws.{t}", params["adapt_ws"])
    for i in range(2):
        layer = params[f"layer_{i}"]
        for our_rel in range(2 * T * T):
            ref_name = int(perm[our_rel])
            sd[f"layers.{i}.weight.{ref_name}.weight"] = (
                np.asarray(layer["kernel"][our_rel]).T)
            sd[f"layers.{i}.weight.{ref_name}.bias"] = (
                np.asarray(layer["bias"][our_rel]))
        typed_to_sd(sd, f"linears_prediction.{{t}}.{i}", params[f"pred_{i}"])

    cfg = {"name": "HetRGCN", "n_node_types": T, "num_layers": 2,
           "edge_types": EDGE_TYPES}
    got = convert_gnn_state_dict(cfg, sd)["params"]
    assert_trees_equal(got, params)


def test_gcn_round_trip_and_unused_params_dropped():
    model = models.GCN(in_dim=D, hidden_dim=H, out_dim=2, n_layers=2,
                       graph_pooling_type="mean")
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(3), to_homogeneous(graph()))["params"])

    sd = {}
    for i in range(2):
        sd[f"layers.{i}.weight"] = np.asarray(params[f"conv_{i}"]["weight"]["kernel"])
        sd[f"layers.{i}.bias"] = np.asarray(params[f"conv_{i}"]["bias"])
        lin_to_sd(sd, f"linears_prediction.{i}", params[f"pred_{i}"])
    # the reference also stores linears_prediction.{n_layers}, which its
    # forward never uses (GCN.py:40-46 vs :68-77) — must be ignored
    sd["linears_prediction.2.weight"] = np.zeros((2, H), np.float32)
    sd["linears_prediction.2.bias"] = np.zeros(2, np.float32)
    lin_to_sd(sd, "classify", params["classify"])

    cfg = {"name": "GCN", "num_layers": 2, "graph_pooling_type": "mean"}
    got = convert_gnn_state_dict(cfg, sd)["params"]
    assert_trees_equal(got, params)


def test_converted_checkpoint_serves(tmp_path):
    """End-to-end migration: reference-style state dict -> converted
    checkpoint dir -> SlidePredictor serves it (HEAT2 on the lattice
    fast path)."""
    from wsi_hgnn_tpu.config import loads_config
    from wsi_hgnn_tpu.serve import SlidePredictor
    from wsi_hgnn_tpu.train.checkpoint import CheckpointManager

    model = models.HEATNet2(in_dim=D, hidden_dim=H, out_dim=2, n_layers=2,
                            n_heads=2, n_node_types=T)
    g = graph()
    params = model.init(jax.random.PRNGKey(4), g)["params"]
    sd = {}
    typed_to_sd(sd, "adapt_ws.{t}", params["adapt_ws"])
    heat_layers_to_sd(sd, params, 2)
    for i in range(2):
        lin_to_sd(sd, f"gcs.{i}.e_linear", params[f"gcs_{i}"]["e_linear"])
    typed_to_sd(sd, "linears_prediction.{t}", params["linears_prediction"])

    cfg = loads_config(f"""
name: Converted
GNN:
  name: "HEAT2"
  n_node_types: {T}
  num_layers: 2
  in_dim: {D}
  hidden_dim: {H}
  out_dim: 2
  n_heads: 2
  feat_drop: 0.0
  graph_pooling_type: mean
checkpoint:
  path: "{tmp_path / 'ckpt'}"
""")
    converted = convert_gnn_state_dict(cfg["GNN"], sd)
    cm = CheckpointManager(str(tmp_path / "ckpt"))
    cm.write_new_version(cfg, converted, {"Epoch": 1})

    pred = SlidePredictor(cfg, radius=4, n_node_types=T)
    rng = np.random.RandomState(5)
    probs = pred.predict(rng.randn(30, D).astype(np.float32),
                         rng.randint(0, T, 30).astype(np.int32))
    assert probs.shape == (2,) and np.isfinite(probs).all()
    # and the converted weights equal the originals through the round trip
    assert_trees_equal(pred.variables["params"], params)


def test_gat_round_trip():
    from wsi_hgnn_tpu.config import parse_gnn_model

    model, _ = parse_gnn_model({
        "name": "GAT", "in_dim": D, "hidden_dim": H, "out_dim": 2,
        "num_layers": 2, "num_heads": 2, "num_out_heads": 1,
        "feat_drop": 0.0, "attn_drop": 0.0, "negative_slope": 0.2,
        "residual": False, "graph_pooling_type": "mean",
    })
    params = model.init(jax.random.PRNGKey(5), to_homogeneous(graph()))["params"]

    sd = {}
    for i in range(3):
        layer = params[f"gat_{i}"]
        sd[f"layers.{i}.fc.weight"] = np.asarray(layer["fc"]["kernel"]).T
        sd[f"layers.{i}.attn_l"] = np.asarray(layer["attn_l"])
        sd[f"layers.{i}.attn_r"] = np.asarray(layer["attn_r"])
        sd[f"layers.{i}.bias"] = np.asarray(layer["bias"]).reshape(-1)
        lin_to_sd(sd, f"linears_prediction.{i}", params[f"pred_{i}"])

    got = convert_gnn_state_dict(
        {"name": "GAT", "num_layers": 2, "graph_pooling_type": "mean"},
        sd)["params"]
    assert_trees_equal(got, params)


def test_gin_round_trip_with_batch_stats():
    from wsi_hgnn_tpu.config import parse_gnn_model

    model, _ = parse_gnn_model({
        "name": "GIN", "in_dim": D, "hidden_dim": H, "out_dim": 2,
        "num_layers": 2, "num_mlp_layers": 2, "feat_drop": 0.0,
        "graph_pooling_type": "sum", "neighbor_pooling_type": "sum",
        "learn_eps": False,
    })
    variables = model.init(jax.random.PRNGKey(6), to_homogeneous(graph()))
    params = jax.tree.map(np.asarray, variables["params"])
    rng = np.random.RandomState(0)
    # synthesize non-trivial running stats (init vars are 0-mean/1-var)
    stats = jax.tree.map(
        lambda a: rng.rand(*np.shape(a)).astype(np.float32) + 0.5,
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )

    sd = {}
    gin = params["gin_0"]
    for j in range(2):
        lin_to_sd(sd, f"layers.0.apply_func.mlp.linears.{j}",
                  gin["mlp"][f"linears_{j}"])
    for prefix, p, st in [
        ("layers.0.apply_func.mlp.batch_norms.0", gin["mlp"]["bn_0"],
         stats["gin_0"]["mlp"]["bn_0"]),
        ("layers.0.apply_func.bn", gin["bn"], stats["gin_0"]["bn"]),
    ]:
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])
        sd[prefix + ".running_mean"] = np.asarray(st["mean"])
        sd[prefix + ".running_var"] = np.asarray(st["var"])
    sd["layers.0.eps"] = np.float32(np.asarray(gin["eps"]))
    lin_to_sd(sd, "linears_prediction.0", params["pred_0"])
    # unused extra head (GIN.py:53-60 vs forward :83-89) must be ignored
    sd["linears_prediction.1.weight"] = np.zeros((2, H), np.float32)
    sd["linears_prediction.1.bias"] = np.zeros(2, np.float32)
    lin_to_sd(sd, "classify", params["classify"])

    got = convert_gnn_state_dict(
        {"name": "GIN", "num_layers": 2, "num_mlp_layers": 2}, sd)
    assert_trees_equal(got["params"], params)
    assert_trees_equal(got["batch_stats"], stats)


def test_ntpool_round_trip():
    from wsi_hgnn_tpu.config import parse_gnn_model

    model, _ = parse_gnn_model({
        "name": "GCN_NTPool", "in_dim": D, "hidden_dim": H, "out_dim": 2,
        "num_layers": 2, "n_node_types": T, "feat_drop": 0.0,
        "graph_pooling_type": "mean",
    })
    params = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(7), graph())["params"])

    sd = {}
    for i in range(2):
        sd[f"layers.{i}.weight"] = np.asarray(params[f"conv_{i}"]["weight"]["kernel"])
        sd[f"layers.{i}.bias"] = np.asarray(params[f"conv_{i}"]["bias"])
        typed_to_sd(sd, f"linears_prediction.{{t}}.{i}", params[f"pred_{i}"])
    # unused classify head dropped
    sd["classify.weight"] = np.zeros((2, H), np.float32)
    sd["classify.bias"] = np.zeros(2, np.float32)

    got = convert_gnn_state_dict(
        {"name": "GCN_NTPool", "num_layers": 2, "n_node_types": T}, sd)["params"]
    assert_trees_equal(got, params)


def test_gcn_att_pooling_round_trip():
    """graph_pooling_type='att' (the reference GCN's default): the
    GlobalAttentionPooling gate Linears must convert too."""
    from wsi_hgnn_tpu.config import parse_gnn_model

    model, _ = parse_gnn_model({
        "name": "GCN", "in_dim": D, "hidden_dim": H, "out_dim": 2,
        "num_layers": 2, "feat_drop": 0.0, "graph_pooling_type": "att",
    })
    params = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(8), to_homogeneous(graph()))["params"])

    sd = {}
    for i in range(2):
        sd[f"layers.{i}.weight"] = np.asarray(params[f"conv_{i}"]["weight"]["kernel"])
        sd[f"layers.{i}.bias"] = np.asarray(params[f"conv_{i}"]["bias"])
        lin_to_sd(sd, f"linears_prediction.{i}", params[f"pred_{i}"])
    sd["linears_prediction.2.weight"] = np.zeros((2, H), np.float32)
    sd["linears_prediction.2.bias"] = np.zeros(2, np.float32)
    lin_to_sd(sd, "classify", params["classify"])
    for i in range(3):
        lin_to_sd(sd, f"pools.{i}.gate_nn", params[f"pool_{i}"]["gate_nn"])

    got = convert_gnn_state_dict(
        {"name": "GCN", "num_layers": 2, "graph_pooling_type": "att"},
        sd)["params"]
    assert_trees_equal(got, params)


def test_validate_state_catches_config_mismatch():
    """Converting a HEAT4 state dict with a HEAT2 config parses (HEAT4's
    keys are a superset) but validate_state must fail with a readable
    diff instead of letting a silently-wrong checkpoint reach disk."""
    from convert_reference_checkpoint import validate_state

    model = models.HEATNet4(in_dim=D, hidden_dim=H, out_dim=2, n_layers=2,
                            n_heads=2, n_node_types=T)
    params = model.init(jax.random.PRNGKey(10), graph())["params"]
    sd = {}
    typed_to_sd(sd, "adapt_ws.{t}", params["adapt_ws"])
    heat_layers_to_sd(sd, params, 2)
    for i in range(2):
        lin_to_sd(sd, f"gcs.{i}.e_linear", params[f"gcs_{i}"]["e_linear"])
    typed_to_sd(sd, "linears_prediction.{t}", params["linears_prediction"])

    heat2_cfg = {"name": "HEAT2", "n_node_types": T, "num_layers": 2,
                 "in_dim": D, "hidden_dim": H, "out_dim": 2, "n_heads": 2,
                 "feat_drop": 0.0, "graph_pooling_type": "mean"}
    state = convert_gnn_state_dict(heat2_cfg, sd)
    with pytest.raises(ValueError, match="shape-mismatch"):
        validate_state(heat2_cfg, state)

    # and the matching config validates clean
    heat4_cfg = {**heat2_cfg, "name": "HEAT4"}
    for t in range(T):
        sd[f"attn.{t}.op.weight"] = (
            np.asarray(params[f"attn_{t}"]["op"]["kernel"])[None, :, :])
    for head in ("head_2", "head_1", "head"):
        lin_to_sd(sd, head, params[head])
    validate_state(heat4_cfg, convert_gnn_state_dict(heat4_cfg, sd))


def test_gin_att_pooling_and_single_mlp_round_trip():
    """GIN with graph_pooling_type='att' (a real reference operating
    point) maps pools 0..n_layers-2 plus pools.{n_layers} -> pool_last
    (pools.{n_layers-1} is unused, GIN.py:83-89); num_mlp_layers=1 maps
    the single `linear`."""
    from convert_reference_checkpoint import validate_state

    from wsi_hgnn_tpu.config import parse_gnn_model

    cfg = {"name": "GIN", "in_dim": D, "hidden_dim": H, "out_dim": 2,
           "num_layers": 2, "num_mlp_layers": 1, "feat_drop": 0.0,
           "graph_pooling_type": "att", "neighbor_pooling_type": "sum",
           "learn_eps": False}
    model, _ = parse_gnn_model(cfg)
    variables = model.init(jax.random.PRNGKey(11), to_homogeneous(graph()))
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    sd = {}
    gin = params["gin_0"]
    lin_to_sd(sd, "layers.0.apply_func.mlp.linear", gin["mlp"]["linear"])
    sd["layers.0.apply_func.bn.weight"] = np.asarray(gin["bn"]["scale"])
    sd["layers.0.apply_func.bn.bias"] = np.asarray(gin["bn"]["bias"])
    sd["layers.0.apply_func.bn.running_mean"] = np.asarray(
        stats["gin_0"]["bn"]["mean"])
    sd["layers.0.apply_func.bn.running_var"] = np.asarray(
        stats["gin_0"]["bn"]["var"])
    sd["layers.0.eps"] = np.float32(np.asarray(gin["eps"]))
    lin_to_sd(sd, "linears_prediction.0", params["pred_0"])
    sd["linears_prediction.1.weight"] = np.zeros((2, H), np.float32)
    sd["linears_prediction.1.bias"] = np.zeros(2, np.float32)
    lin_to_sd(sd, "classify", params["classify"])
    # pools: loop uses pools.0 (n_layers-1 = 1 entry); classify uses
    # pools.2; pools.1 is dead
    lin_to_sd(sd, "pools.0.gate_nn", params["pool_0"]["gate_nn"])
    sd["pools.1.gate_nn.weight"] = np.zeros((1, H), np.float32)
    sd["pools.1.gate_nn.bias"] = np.zeros(1, np.float32)
    lin_to_sd(sd, "pools.2.gate_nn", params["pool_last"]["gate_nn"])

    got = convert_gnn_state_dict(cfg, sd)
    assert_trees_equal(got["params"], params)
    assert_trees_equal(got["batch_stats"], stats)
    validate_state(cfg, got)
