"""Generate the configs/ surface: training YAMLs for every (dataset, task,
model, encoder) combination the reference ships (/root/reference/configs —
41 training + 8 construction files, SURVEY.md C7), with this framework's
.npz graph paths. Run from the repo root:

    python tools/gen_configs.py
"""
from __future__ import annotations

import os
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "configs"

TRAIN_TMPL = """#### general settings
name: PointHet
train_type: gnn
eval_type: homo-graph
gpu_ids: '0'

#### datasets
datasets:
  dataset: "{dataset}"
  wsi_path: "./data/{dataset}/"
  task: "{task}"
  train_path: "./data/{dataset}_{enc}_lv0/list_f1/{gkind}_train.txt"
  eval_path: "./data/{dataset}_{enc}_lv0/list_f1/{gkind}_test.txt"
  valid_path: "./data/{dataset}_{enc}_lv0/list_f1/{gkind}_val.txt"
  normal_path: "./data/biomedical_data/normal_list_{dataset}.txt"
  has_graph: True
  num_workers: 16

#### Checkpoint settings
checkpoint:
  path: "./checkpoints/{model}_{dataset}_{enc}_{taskslug}"
  save_checkpoint_freq: 10

#### Patches extractor settings
selector:
  n_channel: 3
  pixel_th: 200
  level: 2
  patch_size: 256
  verbose: 0

#### Optimizer settings
optimizer:
  opt_method: "ADAM"
  lr: {lr}
  weight_decay: {wd}

#### KNN settings
KNN:
  radius: {radius}

#### GNN settings
GNN:
  name: "{model}"
{gnn_extra}
  num_layers: 2
  in_dim: 1024
  hidden_dim: {hidden}
  out_dim: {out_dim}
  num_heads: 4
  num_out_heads: 1
  n_heads: 4
  num_mlp_layers: 2
  feat_drop: 0.2
  attn_drop: 0.2
  negative_slope: 0.2
  neighbor_pooling_type: mean
  graph_pooling_type: mean

#### training settings
train:
  num_epochs: 500
  batch_size: 2
  loss: "CE"

eval:
  explainer_name: GemExplainer
  explain_path: "./plots/{model}_{dataset}_expl/"
  annotation_path: "./data/camelyon16/testing/annotations/"
  level: 2
  patch_size: 256
"""

CONSTRUCT_TMPL = """graph_constructor:
  dataset: {dataset}
  task: "{task}"
  data_root: "./data/{dataset}"
  hovernet_data_root: "./data/hovernet_json"
  patch_path: "./data/patches/{dataset}/patches_lv0_ps256/"
  out_dir: "./data/{dataset}_{enc}_lv0"
  node_type_dir:
  encoder_name: '{encoder}'
  patch_size: 256
  feature_dim: 1024
  radius: {radius}
  level: 2
  n_channel: 3
  n_node_type: 6
  verbose: 0

hovernet_config:
  nr_types: 6
  mode: fast
  hovernet_model_path: './data/weights/hovernet_fast_pannuke_type_tf2pytorch.tar'
  type_info_path: 'type_info.json'
  batch_size: 32

kimianet_config:
  kimianet_model_path: './data/weights/KimiaNetPyTorchWeights.pth'
  batch_size: 32
"""

HOMO_MODELS = ["GCN", "GAT", "GIN"]
HET_MODELS = ["GCN_NTPool", "HetRGCN", "HGT", "HEAT2", "HEAT4"]

TASKS = {
    "BRCA": [("cancer classification", 2), ("cancer staging", 4), ("cancer typing", 2)],
    "COAD": [("cancer classification", 2), ("cancer staging", 4)],
    "ESCA": [("cancer typing", 2)],
}


def gnn_extra(model: str) -> str:
    lines = []
    if model in HET_MODELS:
        lines.append("  n_node_types: 6")
        lines.append('  edge_types: ["pos", "neg"]')
        lines.append("  num_meta_paths: 3")
    return "\n".join(lines) + ("\n" if lines else "")


def main():
    n = 0
    for dataset, tasks in TASKS.items():
        for (task, out_dim) in tasks:
            taskslug = task.split()[-1]
            for model in HOMO_MODELS + HET_MODELS:
                for enc in (["kimia"] if model in HET_MODELS else ["kimia", "hover"]):
                    gkind = "heterogeneous" if model in HET_MODELS else "homogeneous"
                    d = ROOT / dataset
                    d.mkdir(parents=True, exist_ok=True)
                    fname = f"{model}_{enc}_{taskslug}.yml"
                    (d / fname).write_text(
                        TRAIN_TMPL.format(
                            dataset=dataset, task=task, taskslug=taskslug,
                            model=model, enc=enc, gkind=gkind,
                            hidden=256 if model.startswith("HEAT") else 200,
                            out_dim=out_dim,
                            lr=0.0001, wd=0.005,
                            radius=9 if dataset == "BRCA" else 6,
                            gnn_extra=gnn_extra(model),
                        )
                    )
                    n += 1
    gc = ROOT / "GraphConstruction"
    gc.mkdir(parents=True, exist_ok=True)
    for dataset, tasks in TASKS.items():
        for encoder in ("kimia", "efficientnet-b4", "hover"):
            name = f"{dataset}_Hovernet{encoder.replace('-', '').capitalize()}_graph_constructor.yml"
            (gc / name).write_text(
                CONSTRUCT_TMPL.format(
                    dataset=dataset, task=tasks[0][0], encoder=encoder,
                    enc=encoder.split("-")[0],
                    radius=9 if dataset == "BRCA" else 6,
                )
            )
            n += 1
    print(f"wrote {n} configs under {ROOT}")


if __name__ == "__main__":
    main()
