"""Generate the configs/ surface.

Two tiers (SURVEY.md C7, /root/reference/configs — 41 training + 8
construction files):

  1. REFERENCE-NAMED configs: one per reference YAML that the reference's
     own factory (/root/reference/parser.py:48-174) can build — same file
     name, IDENTICAL `optimizer` / `GNN` / `train` sections and
     `save_checkpoint_freq` (operating points extracted from the reference
     YAMLs; VERDICT.md round-1 weak #4), with this framework's .npz dataset
     paths. Reference configs that the reference parser itself cannot build
     (missing required keys, or model names like HEAT3/CRAC/AdaGCN that
     parser.py rejects) are not reproduced.
  2. A task-matrix inventory `<model>_<enc>_<task>.yml` covering every
     (dataset, task, model, encoder) combination, operating points inherited
     from the nearest reference config (same model+task, else same model).

Run from the repo root:  python tools/gen_configs.py
"""
from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "configs"

# Operating points copied from the buildable reference YAMLs
# (configs/<dataset>/<name>.yml -> checkpoint freq + optimizer/GNN/train
# sections, verbatim).
REF_TRAIN = json.loads(r"""
{
 "BRCA/GCN_Eff_BRCA.yml": {
  "dataset": "BRCA",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0
  },
  "GNN": {
   "name": "GCN",
   "num_layers": 3,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 2,
   "feat_drop": 0.4,
   "graph_pooling_type": "att"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 1,
   "loss": "CE"
  }
 },
 "BRCA/GCN_Eff_BRCA_staging.yml": {
  "dataset": "BRCA",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0
  },
  "GNN": {
   "name": "GCN",
   "num_layers": 3,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 4,
   "feat_drop": 0.2,
   "graph_pooling_type": "att"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 1,
   "loss": "CE"
  }
 },
 "BRCA/HEAT2_kimia_staging_v2.yml": {
  "dataset": "BRCA",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.001,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT2",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 4,
   "n_heads": 4,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "BRCA/HEAT2_kimia_typing_v2.yml": {
  "dataset": "BRCA",
  "task": "cancer typing",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT2",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 128,
   "out_dim": 2,
   "n_heads": 2,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 16,
   "loss": "CE"
  }
 },
 "BRCA/HEAT2_kimia_v2.yml": {
  "dataset": "BRCA",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT2",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 2,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "BRCA/HEAT4_kimia_classification_v2.yml": {
  "dataset": "BRCA",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT4",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 2,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "BRCA/HEAT4_kimia_staging_v2.yml": {
  "dataset": "BRCA",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT4",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 4,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "BRCA/HEAT4_kimia_typing_v2.yml": {
  "dataset": "BRCA",
  "task": "cancer typing",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT4",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 2,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GAT_Kimia_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GAT",
   "negative_slope": 0.2,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "residual": true,
   "in_drop": 0.2,
   "attn_drop": 0.2,
   "out_dim": 2,
   "num_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GCN_Eff_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GCN",
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 2,
   "feat_drop": 0.2,
   "graph_pooling_type": "att"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GCN_Eff_v2_staging.yml": {
  "dataset": "COAD",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GCN",
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 4,
   "feat_drop": 0.2,
   "graph_pooling_type": "att"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GCN_Kimia_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GCN",
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 2,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GCN_Kimia_v2_staging.yml": {
  "dataset": "COAD",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GCN",
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 4,
   "feat_drop": 0.2,
   "graph_pooling_type": "att"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GCN_NTPool_Kimia_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GCN_NTPool",
   "n_node_types": 6,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 2,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/GIN_COAD.yml": {
  "dataset": "COAD",
  "task": "",
  "save_freq": 10,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0005,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GIN",
   "negative_slope": 0.2,
   "num_layers": 2,
   "num_mlp_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 2,
   "feat_drop": 0.2,
   "graph_pooling_type": "att",
   "neighbor_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 150,
   "batch_size": 64,
   "loss": "CE"
  }
 },
 "COAD/GIN_Hover_v2.yml": {
  "dataset": "COAD",
  "task": "",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "GIN",
   "negative_slope": 0.2,
   "num_layers": 2,
   "num_mlp_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 2,
   "feat_drop": 0.4,
   "graph_pooling_type": "sum",
   "neighbor_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/HEAT2_kimia_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT2",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 2,
   "n_heads": 8,
   "num_out_heads": 1,
   "feat_drop": 0,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 1,
   "loss": "CE"
  }
 },
 "COAD/HEAT2_kimia_v2_staging.yml": {
  "dataset": "COAD",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0001,
   "weight_decay": 0.0001
  },
  "GNN": {
   "name": "HEAT2",
   "n_node_types": 6,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 256,
   "out_dim": 4,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/HEAT4_kimia_classification_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT4",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 2,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 },
 "COAD/HGT_Hover_v2.yml": {
  "dataset": "COAD",
  "task": "",
  "save_freq": 10,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.001
  },
  "GNN": {
   "name": "HGT",
   "n_node_types": 6,
   "edge_types": [
    "pos",
    "neg"
   ],
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 200,
   "out_dim": 2,
   "num_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.4
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 1,
   "loss": "CE"
  },
  "KNN": {
   "radius": 6
  }
 },
 "COAD/HGT_Kimia_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 10,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.001
  },
  "GNN": {
   "name": "HGT",
   "n_node_types": 6,
   "edge_types": [
    "pos",
    "neg"
   ],
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 200,
   "out_dim": 2,
   "num_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.4,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 1,
   "loss": "CE"
  },
  "KNN": {
   "radius": 6
  }
 },
 "COAD/HGT_kimia_staging.yml": {
  "dataset": "COAD",
  "task": "cancer staging",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.001,
   "weight_decay": 0.001
  },
  "GNN": {
   "name": "HGT",
   "n_node_types": 6,
   "edge_types": [
    "pos",
    "neg"
   ],
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 200,
   "out_dim": 4,
   "num_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.4,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 1,
   "loss": "CE"
  }
 },
 "COAD/HetRGCN_Kimia_v2.yml": {
  "dataset": "COAD",
  "task": "cancer classification",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 0.0005,
   "weight_decay": 0.001
  },
  "GNN": {
   "name": "HetRGCN",
   "n_node_types": 6,
   "edge_types": [
    "pos",
    "neg"
   ],
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 200,
   "out_dim": 2,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 400,
   "batch_size": 1,
   "loss": "CE"
  }
 },
 "ESCA/HEAT4_kimia_typing.yml": {
  "dataset": "ESCA",
  "task": "cancer typing",
  "save_freq": 5,
  "optimizer": {
   "opt_method": "ADAM",
   "lr": 1e-05,
   "weight_decay": 0.005
  },
  "GNN": {
   "name": "HEAT4",
   "n_node_types": 6,
   "num_meta_paths": 3,
   "num_layers": 2,
   "in_dim": 1024,
   "hidden_dim": 512,
   "out_dim": 2,
   "n_heads": 4,
   "num_out_heads": 1,
   "feat_drop": 0.2,
   "graph_pooling_type": "mean"
  },
  "train": {
   "num_epochs": 500,
   "batch_size": 2,
   "loss": "CE"
  }
 }
}
""")

# Reference construction configs: (file name, dataset, task, encoder, radius,
# level) — /root/reference/configs/GraphConstruction/*.yml. Note encoder
# 'efficientnet-b7' appears in COAD_HoverEfficient_graph_constructor.yml
# (commented there as b7/kimia/hover); radius is 9 for BRCA+COAD, 7 for ESCA.
REF_CONSTRUCT = [
    ("BRCA_HovernetEfficient_graph_constructor.yml", "BRCA", "cancer staging", "efficientnet-b4", 9, 0),
    ("BRCA_HovernetKimia_graph_constructor.yml", "BRCA", "cancer typing", "kimia", 9, 2),
    ("COAD_HoverEfficient_graph_constructor.yml", "COAD", "", "efficientnet-b7", 9, 2),
    ("COAD_HoverEfficient_graph_constructor_v2.yml", "COAD", "cancer classification", "efficientnet-b4", 9, 2),
    ("COAD_HovernetKimia_graph_constructor.yml", "COAD", "cancer classification", "kimia", 9, 2),
    ("COAD_Hovernet_graph_constructor.yml", "COAD", "", "hover", 9, 2),
    ("COAD_Hovernet_graph_constructor_v2.yml", "COAD", "cancer typing", "hover", 9, 2),
    ("ESCA_kimia_graph_constructor_v3.yml", "ESCA", "cancer typing", "kimia", 7, 2),
]

TASKS = {
    "BRCA": [("cancer classification", 2), ("cancer staging", 4), ("cancer typing", 2)],
    "COAD": [("cancer classification", 2), ("cancer staging", 4)],
    "ESCA": [("cancer typing", 2)],
}
HOMO_MODELS = ["GCN", "GAT", "GIN"]
HET_MODELS = ["GCN_NTPool", "HetRGCN", "HGT", "HEAT2", "HEAT4"]


def _yml(section: dict, indent: int = 2) -> str:
    """Render a flat config section as YAML preserving key order."""
    pad = " " * indent
    lines = []
    for k, v in section.items():
        if isinstance(v, str):
            lines.append(f'{pad}{k}: "{v}"')
        elif isinstance(v, bool):
            lines.append(f"{pad}{k}: {str(v)}")
        elif isinstance(v, float):
            # positional notation: PyYAML 1.1 does not resolve "1e-05"
            # (dotless mantissa) as a float
            s = f"{v:.12f}".rstrip("0")
            if s.endswith("."):
                s += "0"
            lines.append(f"{pad}{k}: {s}")
        elif isinstance(v, list):
            inner = ", ".join(f'"{x}"' if isinstance(x, str) else str(x) for x in v)
            lines.append(f"{pad}{k}: [{inner}]")
        elif v is None:
            lines.append(f"{pad}{k}:")
        else:
            lines.append(f"{pad}{k}: {v}")
    return "\n".join(lines)


def train_yaml(dataset, task, enc, ckpt_slug, save_freq, optimizer, gnn, train,
               knn=None, explainer_slug=None):
    gkind = "heterogeneous" if gnn["name"] in HET_MODELS else "homogeneous"
    task_line = f'  task: "{task}"\n' if task else ""
    knn_block = f"\n#### KNN settings\nKNN:\n{_yml(knn)}\n" if knn else ""
    expl = explainer_slug or f"{gnn['name']}_{dataset}"
    return f"""#### general settings
name: PointHet
train_type: gnn
eval_type: homo-graph
gpu_ids: '0'

#### datasets
datasets:
  dataset: "{dataset}"
  wsi_path: "./data/{dataset}/"
{task_line}  train_path: "./data/{dataset}_{enc}_lv0/list_f1/{gkind}_train.txt"
  eval_path: "./data/{dataset}_{enc}_lv0/list_f1/{gkind}_test.txt"
  valid_path: "./data/{dataset}_{enc}_lv0/list_f1/{gkind}_val.txt"
  normal_path: "./data/biomedical_data/normal_list_{dataset}.txt"
  has_graph: True
  num_workers: 16

#### Checkpoint settings
checkpoint:
  path: "./checkpoints/{ckpt_slug}"
  save_checkpoint_freq: {save_freq}

#### Patches extractor settings
selector:
  n_channel: 3
  pixel_th: 200
  level: 2
  patch_size: 256
  verbose: 0

#### Optimizer settings
optimizer:
{_yml(optimizer)}
{knn_block}
#### GNN settings
GNN:
{_yml(gnn)}

#### training settings
train:
{_yml(train)}

eval:
  explainer_name: GemExplainer
  explain_path: "./plots/{expl}_expl/"
  annotation_path: "./data/camelyon16/testing/annotations/"
  level: 2
  patch_size: 256
"""


CONSTRUCT_TMPL = """graph_constructor:
  dataset: {dataset}
{task_line}  data_root: "./data/{dataset}"
  hovernet_data_root: "./data/hovernet_json"
  patch_path: "./data/patches/{dataset}/patches_lv0_ps256/"
  out_dir: "./data/{dataset}_{enc}_lv0"
  node_type_dir:
  encoder_name: '{encoder}'
  patch_size: 256
  feature_dim: 1024
  radius: {radius}
  level: {level}
  n_channel: 3
  n_node_type: 6
  knn_impl: pallas
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


def _enc_of(ref_name: str) -> str:
    low = ref_name.lower()
    if "kimia" in low:
        return "kimia"
    if "eff" in low:
        return "efficientnet"
    if "hover" in low:
        return "hover"
    return "kimia"


def nearest_ref(model: str, task: str):
    """Operating points for matrix configs: same model+task first, then any
    config of the model (classification preferred)."""
    cands = [(rel, v) for rel, v in REF_TRAIN.items() if v["GNN"]["name"] == model]
    for rel, v in cands:
        if v["task"] == task:
            return v
    for rel, v in cands:
        if v["task"] == "cancer classification":
            return v
    return cands[0][1] if cands else None


def main():
    n = 0
    # tier 1: reference-named configs, exact operating points
    for rel, v in REF_TRAIN.items():
        dataset_dir, fname = rel.split("/")
        d = ROOT / dataset_dir
        d.mkdir(parents=True, exist_ok=True)
        enc = _enc_of(fname)
        slug = fname[: -len(".yml")]
        (d / fname).write_text(
            train_yaml(
                v["dataset"], v["task"], enc, slug, v["save_freq"],
                v["optimizer"], v["GNN"], v["train"], knn=v.get("KNN"),
                explainer_slug=slug,
            )
        )
        n += 1
    # tier 2: the task matrix, operating points inherited per model
    for dataset, tasks in TASKS.items():
        for (task, out_dim) in tasks:
            taskslug = task.split()[-1]
            for model in HOMO_MODELS + HET_MODELS:
                for enc in (["kimia"] if model in HET_MODELS else ["kimia", "hover"]):
                    ref = nearest_ref(model, task)
                    gnn = dict(ref["GNN"])
                    gnn["out_dim"] = out_dim
                    train = dict(ref["train"])
                    d = ROOT / dataset
                    d.mkdir(parents=True, exist_ok=True)
                    fname = f"{model}_{enc}_{taskslug}.yml"
                    if (d / fname).exists():
                        continue  # tier-1 file wins
                    (d / fname).write_text(
                        train_yaml(
                            dataset, task, enc,
                            f"{model}_{dataset}_{enc}_{taskslug}",
                            ref["save_freq"], ref["optimizer"], gnn, train,
                            knn=ref.get("KNN"),
                        )
                    )
                    n += 1
    gc = ROOT / "GraphConstruction"
    gc.mkdir(parents=True, exist_ok=True)
    for (fname, dataset, task, encoder, radius, level) in REF_CONSTRUCT:
        task_line = f'  task: "{task}"\n' if task else ""
        (gc / fname).write_text(
            CONSTRUCT_TMPL.format(
                dataset=dataset, task_line=task_line, encoder=encoder,
                enc=encoder.split("-")[0], radius=radius, level=level,
            )
        )
        n += 1
    print(f"wrote {n} configs under {ROOT}")


if __name__ == "__main__":
    main()
