"""End-to-end training tests on synthetic slide graphs (SURVEY.md §4:
'end-to-end overfit-one-slide training tests')."""
import json
import os

import numpy as np
import pytest

from wsi_hgnn_tpu.config import loads_config
from wsi_hgnn_tpu.data import save_graph_npz
from wsi_hgnn_tpu.train import GNNTrainer, HomoGraphEvaluator
from wsi_hgnn_tpu.train.metrics import metrics as np_metrics


def make_synthetic_cohort(tmpdir, n_slides=12, hetero=True, d=16, seed=0):
    """Two-class cohort: class controls a feature-mean shift. Slide file
    names carry fake TCGA barcodes so the reference label logic applies."""
    rng = np.random.RandomState(seed)
    paths, normals = [], []
    for i in range(n_slides):
        label = i % 2
        n = rng.randint(20, 40)
        e = rng.randint(60, 120)
        feat = rng.randn(n, d).astype(np.float32) + label * 1.5
        src = rng.randint(0, n, e)
        dst = rng.randint(0, n, e)
        barcode = f"TCGA-{i:02d}-0000-01Z-00-DX1"
        p = os.path.join(str(tmpdir), f"{barcode}.npz")
        save_graph_npz(
            p, feat, src, dst,
            node_type=rng.randint(0, 6, n) if hetero else None,
            esign=rng.randint(0, 2, e),
            sim=rng.randn(e).astype(np.float32),
            n_node_types=6, is_hetero=hetero,
        )
        paths.append(p)
        if label == 0:
            normals.append(barcode[:16])
    train_list = os.path.join(str(tmpdir), "train.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(paths))
    normal_list = os.path.join(str(tmpdir), "normal.txt")
    with open(normal_list, "w") as f:
        f.write("\n".join(normals))
    return train_list, normal_list


CFG_TMPL = """
name: TestRun
train_type: gnn
eval_type: homo-graph
gpu_ids: '0'
datasets:
  dataset: "BRCA"
  task: "cancer classification"
  train_path: "{train}"
  eval_path: "{train}"
  valid_path: "{train}"
  normal_path: "{normal}"
  num_workers: 0
checkpoint:
  path: "{ckpt}"
  save_checkpoint_freq: 5
optimizer:
  opt_method: "ADAM"
  lr: 0.003
  weight_decay: 0.0005
GNN:
  name: "{gnn}"
  n_node_types: 6
  num_layers: 2
  num_heads: 2
  num_out_heads: 1
  num_mlp_layers: 2
  in_dim: 16
  hidden_dim: 32
  out_dim: 2
  n_heads: 2
  feat_drop: 0.1
  attn_drop: 0.1
  negative_slope: 0.2
  neighbor_pooling_type: mean
  graph_pooling_type: mean
train:
  num_epochs: {epochs}
  batch_size: 4
  loss: "CE"
eval:
  explainer_name: GemExplainer
"""


def run_trainer(tmp_path, gnn, hetero, epochs=25):
    train_list, normal_list = make_synthetic_cohort(tmp_path, hetero=hetero)
    ckpt = str(tmp_path / f"ckpt_{gnn}")
    cfg = loads_config(
        CFG_TMPL.format(train=train_list, normal=normal_list, ckpt=ckpt,
                        gnn=gnn, epochs=epochs)
    )
    trainer = GNNTrainer(cfg, seed=0)
    stats = trainer.train(log_every=0)
    return trainer, stats, cfg, ckpt


def test_train_gcn_overfits_and_checkpoints(tmp_path):
    trainer, stats, cfg, ckpt = run_trainer(tmp_path, "GCN", hetero=False, epochs=25)
    # the synthetic task is trivially separable: training accuracy -> 1
    assert stats["Testing Accuracy"] >= 0.9
    assert stats["Testing AUC"] >= 0.9
    # checkpoint contract (reference checkpoint.py:9-147)
    assert (tmp_path / f"ckpt_GCN/version.txt").read_text().strip() == "25"
    assert (tmp_path / f"ckpt_GCN/configs.json").exists()
    assert (tmp_path / f"ckpt_GCN/model_v25.msgpack").exists()
    assert not (tmp_path / f"ckpt_GCN/model_v24.msgpack").exists()  # pruned
    lines = (tmp_path / f"ckpt_GCN/training_stats.json").read_text().strip().split("\n")
    assert len(lines) == 25
    assert json.loads(lines[-1])["Epoch"] == 25

    # evaluator restores from disk and reproduces test metrics
    ev = HomoGraphEvaluator(cfg, verbose=False)
    acc, f1, prec, rec, auc = ev.eval()
    assert acc == pytest.approx(stats["Testing Accuracy"], abs=1e-4)


def test_train_heat2_hetero(tmp_path):
    trainer, stats, *_ = run_trainer(tmp_path, "HEAT2", hetero=True, epochs=25)
    assert stats["Testing Accuracy"] >= 0.9


def test_train_hgt_hetero(tmp_path):
    trainer, stats, *_ = run_trainer(tmp_path, "HGT", hetero=True, epochs=10)
    assert np.isfinite(stats["Train Loss: "])
    assert stats["Testing Accuracy"] >= 0.75


def test_train_gin_with_batchnorm(tmp_path):
    trainer, stats, *_ = run_trainer(tmp_path, "GIN", hetero=False, epochs=10)
    assert np.isfinite(stats["Train Loss: "])
    # batch_stats must exist and be updated
    assert trainer.state.batch_stats


def test_metrics_match_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import (auc, f1_score, precision_score, recall_score,
                                 roc_auc_score, roc_curve)

    rng = np.random.RandomState(0)
    # binary
    probs = rng.dirichlet(np.ones(2), size=200)
    targets = rng.randint(0, 2, 200)
    preds = probs.argmax(1)
    p, r, f, a = np_metrics(probs, targets, "binary")
    assert p == pytest.approx(precision_score(targets, preds))
    assert r == pytest.approx(recall_score(targets, preds))
    assert f == pytest.approx(f1_score(targets, preds))
    fpr, tpr, _ = roc_curve(targets, preds)
    assert a == pytest.approx(auc(fpr, tpr))  # the hard-pred quirk
    # macro / multiclass
    probs = rng.dirichlet(np.ones(4), size=300)
    targets = rng.randint(0, 4, 300)
    preds = probs.argmax(1)
    p, r, f, a = np_metrics(probs, targets, "macro")
    assert p == pytest.approx(precision_score(targets, preds, average="macro"))
    assert r == pytest.approx(recall_score(targets, preds, average="macro"))
    assert f == pytest.approx(f1_score(targets, preds, average="macro"))
    assert a == pytest.approx(roc_auc_score(targets, probs, multi_class="ovr"))


def test_trainer_resume_from_checkpoint(tmp_path):
    """Resume restores params + optimizer + PRNG and continues at the
    checkpointed epoch."""
    train_list, normal_list = make_synthetic_cohort(tmp_path, hetero=False)
    ckpt = str(tmp_path / "ckpt_resume")
    cfg = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                       ckpt=ckpt, gnn="GCN", epochs=4))
    t1 = GNNTrainer(cfg, seed=0)
    t1.train(log_every=0)
    assert t1.checkpoint_manager.version == 4

    # second trainer with a higher epoch budget resumes at epoch 4
    cfg2 = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                        ckpt=ckpt, gnn="GCN", epochs=6))
    t2 = GNNTrainer(cfg2, seed=0)
    t2.train(log_every=0)
    assert t2.start_epoch == 4
    assert t2.checkpoint_manager.version == 6
    lines = (tmp_path / "ckpt_resume/training_stats.json").read_text().strip().split("\n")
    assert len(lines) == 6  # 4 + 2 appended


def test_train_gcn_asap_overfits(tmp_path):
    """`main.py -config <asap config>` path: GCN + graph_pooling_type: asap
    trains end-to-end and fits the separable synthetic cohort."""
    train_list, normal_list = make_synthetic_cohort(tmp_path, hetero=False)
    ckpt = str(tmp_path / "ckpt_ASAP")
    cfg_text = CFG_TMPL.format(
        train=train_list, normal=normal_list, ckpt=ckpt, gnn="GCN", epochs=25
    ).replace("graph_pooling_type: mean",
              "graph_pooling_type: asap\n  pool_k: 8")
    cfg = loads_config(cfg_text)
    assert cfg["GNN"]["graph_pooling_type"] == "asap"
    trainer = GNNTrainer(cfg, seed=0)
    stats = trainer.train(log_every=0)
    assert stats["Testing Accuracy"] >= 0.9


def test_select_dataset_average_tables(monkeypatch):
    """The reference's trainer and evaluator DISAGREE on the metric average
    for TCGA cancer classification: train-split metrics use 'binary'
    (train_gnn.py:45-46) while the evaluator — which produces per-epoch
    val/test metrics too — uses 'macro' (eval_homo_graph.py:36-37). Both
    must be reproduced; staging/typing/non-TCGA agree across roles."""
    import wsi_hgnn_tpu.train.trainer as tr

    monkeypatch.setattr(tr, "GraphDataset", lambda *a: "graph")
    monkeypatch.setattr(tr, "TCGACancerStageDataset", lambda *a: "stage")
    monkeypatch.setattr(tr, "TCGACancerTypingDataset", lambda *a: "typing")

    cls = {"dataset": "COAD", "task": "cancer classification"}
    assert tr.select_dataset(cls, "p", "train")[1] == "binary"
    assert tr.select_dataset(cls, "p", "eval")[1] == "macro"
    non_tcga = {"dataset": "C16", "task": "cancer classification"}
    assert tr.select_dataset(non_tcga, "p", "eval")[1] == "binary"
    staging = {"dataset": "BRCA", "task": "cancer staging"}
    assert tr.select_dataset(staging, "p", "train")[1] == "macro"
    assert tr.select_dataset(staging, "p", "eval")[1] == "macro"
    typing_ = {"dataset": "BRCA", "task": "cancer typing"}
    assert tr.select_dataset(typing_, "p", "train")[1] == "binary"
    assert tr.select_dataset(typing_, "p", "eval")[1] == "binary"


def test_evaluator_requires_checkpoint(tmp_path):
    """A missing checkpoint must raise (the reference evaluator's
    unconditional load_state_dict, eval_homo_graph.py:20-22) — silently
    evaluating random init would print plausible ~chance metrics."""
    train_list, normal_list = make_synthetic_cohort(tmp_path, hetero=False)
    cfg = loads_config(
        CFG_TMPL.format(train=train_list, normal=normal_list,
                        ckpt=str(tmp_path / "no_ckpt"), gnn="GCN", epochs=1)
    )
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        HomoGraphEvaluator(cfg, verbose=False)
