"""Config-surface tests: every shipped YAML parses and its model/optimizer/
loss build; reference-named configs carry the reference's exact operating
points (VERDICT.md round-1 weak #4; /root/reference/configs)."""
import glob
import os

import pytest

from wsi_hgnn_tpu.config import (
    load_config,
    parse_gnn_model,
    parse_loss,
    parse_optimizer,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "[BCE]*", "*.yml"))
)
CONSTRUCT_CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "GraphConstruction", "*.yml"))
)
REFERENCE = "/root/reference/configs"


def test_inventory_nonempty():
    assert len(TRAIN_CONFIGS) >= 80
    assert len(CONSTRUCT_CONFIGS) == 8


@pytest.mark.parametrize("path", TRAIN_CONFIGS, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_train_config_builds(path):
    cfg = load_config(path)
    for section in ("datasets", "checkpoint", "optimizer", "GNN", "train", "eval"):
        assert section in cfg, f"{path} missing {section}"
    model, is_hetero = parse_gnn_model(cfg["GNN"])
    assert model is not None
    parse_optimizer(cfg["optimizer"])
    parse_loss(cfg["train"])
    hetero_models = {"GCN_NTPool", "HetRGCN", "HGT", "HEAT2", "HEAT4"}
    assert is_hetero == (cfg["GNN"]["name"] in hetero_models)


@pytest.mark.parametrize("path", CONSTRUCT_CONFIGS, ids=os.path.basename)
def test_construct_config_parses(path):
    cfg = load_config(path)
    gc = cfg["graph_constructor"]
    assert gc["encoder_name"] in ("kimia", "hover", "efficientnet-b4", "efficientnet-b7")
    assert gc["radius"] in (7, 9)
    assert "hovernet_config" in cfg and "kimianet_config" in cfg


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_reference_named_configs_match_operating_points():
    """For every reference YAML its parser can build, the same-named repo
    config must carry identical optimizer/GNN/train sections and
    save_checkpoint_freq (/root/reference/parser.py:48-174 key accesses)."""
    import yaml

    required = {
        "GAT": ["num_layers", "num_heads", "num_out_heads", "in_dim", "hidden_dim",
                "out_dim", "feat_drop", "attn_drop", "negative_slope", "graph_pooling_type"],
        "GCN": ["in_dim", "hidden_dim", "out_dim", "num_layers", "feat_drop", "graph_pooling_type"],
        "GCN_NTPool": ["in_dim", "hidden_dim", "out_dim", "num_layers", "feat_drop",
                       "graph_pooling_type", "n_node_types"],
        "GIN": ["in_dim", "hidden_dim", "out_dim", "num_layers", "num_mlp_layers",
                "feat_drop", "graph_pooling_type", "neighbor_pooling_type"],
        "HetRGCN": ["n_node_types", "edge_types", "in_dim", "hidden_dim", "out_dim",
                    "num_layers", "graph_pooling_type"],
        "HGT": ["n_node_types", "edge_types", "in_dim", "hidden_dim", "out_dim",
                "num_layers", "num_heads"],
        "HEAT2": ["n_node_types", "in_dim", "hidden_dim", "out_dim", "num_layers",
                  "n_heads", "feat_drop", "graph_pooling_type"],
        "HEAT4": ["n_node_types", "in_dim", "hidden_dim", "out_dim", "num_layers",
                  "n_heads", "feat_drop", "graph_pooling_type"],
    }
    n_checked = 0
    for ref_path in sorted(glob.glob(os.path.join(REFERENCE, "[BCE]*", "*.yml"))):
        ref = yaml.safe_load(open(ref_path))
        gnn = ref.get("GNN", {})
        name = gnn.get("name")
        if name not in required or any(k not in gnn for k in required[name]):
            continue  # the reference parser itself cannot build this one
        rel = os.path.relpath(ref_path, REFERENCE)
        repo_path = os.path.join(REPO, "configs", rel)
        assert os.path.exists(repo_path), f"missing reference-named config {rel}"
        mine = load_config(repo_path)
        for section in ("optimizer", "GNN", "train"):
            assert dict(mine[section]) == dict(ref[section]), (
                f"{rel} section {section} drifted: {dict(mine[section])} != {dict(ref[section])}"
            )
        assert (mine["checkpoint"]["save_checkpoint_freq"]
                == ref["checkpoint"]["save_checkpoint_freq"]), rel
        if "KNN" in ref:
            assert dict(mine.get("KNN", {})) == dict(ref["KNN"]), rel
        n_checked += 1
    assert n_checked == 24, f"expected 24 buildable reference configs, checked {n_checked}"


def test_adagrad_lr_decay_coupling_matches_torch():
    """The reference couples Adagrad's lr_decay to weight_decay
    (/root/reference/parser.py:21-25); verify exact update parity vs torch."""
    import numpy as np
    import jax.numpy as jnp
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(0)
    w0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) for _ in range(4)]

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adagrad([wt], lr=0.1, lr_decay=0.005, weight_decay=0.005)
    for g in grads:
        wt.grad = torch.tensor(g)
        opt.step()

    tx = parse_optimizer({"opt_method": "ADAGRAD", "lr": 0.1, "weight_decay": 0.005})
    p = jnp.asarray(w0)
    st = tx.init(p)
    for g in grads:
        u, st = tx.update(jnp.asarray(g), st, p)
        p = p + u
    assert np.allclose(wt.detach().numpy(), np.asarray(p), atol=1e-6)
