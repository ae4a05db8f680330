"""GNN trainer — the orchestration layer (reference
/root/reference/trainer/trainer.py:7-37 + trainer/train_gnn.py:18-156),
re-built around one jitted train step.

Differences from the reference, all TPU-motivated and behavior-preserving:
  * the whole step — graph augmentation, forward, loss, backward, optimizer
    update — is a single compiled XLA program; augmentation runs on device
    from a PRNG key instead of in dataloader workers;
  * per-epoch evaluation re-uses the in-memory state instead of re-reading
    the checkpoint from disk (the reference reconstructs a
    HomoGraphEvaluator from the file every epoch, train_gnn.py:111-115);
  * batches are fixed-shape (dummy-padded tail with zero loss weight), so
    500 epochs compile exactly one train-step program per size bucket.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import parse_gnn_model, parse_loss, parse_optimizer
from ..data.datasets import (
    GraphDataset,
    TCGACancerStageDataset,
    TCGACancerTypingDataset,
)
from ..data.loader import GraphLoader
from ..graph import TypedGraph, to_homogeneous, transforms
from .checkpoint import CheckpointManager
from .evaluator import (
    HomoGraphEvaluator,
    evaluate,
    eval_forward_for,
    make_eval_loader,
)
from .metrics import accuracy, metrics
from ..profiling import GLOBAL_TIMER


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def select_dataset(config_data: Dict, split_path: str, type_: str):
    """The (name, task) dataset switch of train_gnn.py:32-46 (train) and
    eval_homo_graph.py:29-46 (eval). Returns (dataset, average).

    The two reference tables DISAGREE on TCGA cancer classification: the
    trainer scores its train-split metrics with average='binary'
    (train_gnn.py:45-46), while the evaluator — which also produces the
    per-epoch val/test metrics, since train() builds a fresh
    HomoGraphEvaluator every epoch (train_gnn.py:111-115) — uses 'macro'
    (eval_homo_graph.py:36-37). Both quirks are reproduced, keyed on
    type_. Note the reference's macro branch then calls sklearn
    roc_auc_score(targets, probs_2d, multi_class='ovr'), which RAISES on
    2-class targets ("y should be a 1d array") — a latent reference
    defect; our metrics() OVR implementation degrades to the
    probability-ranked binary AUC instead (the mean of the two
    complementary per-column AUCs equals it exactly)."""
    name = config_data["dataset"]
    task = config_data.get("task", "")
    tcga = name in ("COAD", "BRCA", "ESCA")
    normal_path = config_data.get("normal_path", "") if tcga else ""
    if task == "cancer staging":
        return TCGACancerStageDataset(split_path, normal_path, type_), "macro"
    if task == "cancer typing":
        return TCGACancerTypingDataset(split_path, normal_path, type_), "binary"
    average = "macro" if (type_ == "eval" and tcga) else "binary"
    return GraphDataset(split_path, normal_path, name, type_), average


class GNNTrainer:
    def __init__(self, config: Dict, seed: int = 611):
        self.config = config
        self.config_data = config["datasets"]
        self.config_train = config["train"]
        self.config_optim = config["optimizer"]
        self.config_checkpoint = config["checkpoint"]
        self.config_gnn = config["GNN"]
        self.name = config.get("name", "")

        self.checkpoint_manager = CheckpointManager(self.config_checkpoint["path"])
        self.n_epoch = self.config_train["num_epochs"]
        self.batch_size = self.config_train["batch_size"]

        self.model, self.is_hetero = parse_gnn_model(self.config_gnn)
        self.tx = parse_optimizer(self.config_optim)
        self.loss_fcn = parse_loss(self.config_train)

        train_path = self.config_data["train_path"]
        self.valid_path = self.config_data["valid_path"]
        self.eval_path = self.config_data["eval_path"]
        self.train_data, self.average = select_dataset(
            self.config_data, train_path, "train"
        )

        from ..data.lattice_loader import probe_lattice_and_capacities

        # one scan yields the batch capacities AND the lattice probe
        # (each would otherwise load every graph from disk separately).
        # Irregular out-degrees pack with masked padding slots up to
        # train.lattice_pad_ratio (imported HNSW graphs with missing
        # neighbours stay on the fast path; hub-skewed edge sets fall back)
        cap_n, cap_e, lat_probe = probe_lattice_and_capacities(
            self.train_data, self.batch_size,
            max_pad_ratio=float(
                self.config_train.get("lattice_pad_ratio", 1.5)
            ),
        )

        # graph-context parallelism: when a batch's edge store exceeds the
        # threshold and >1 device is available, shard edges over the mesh
        # and train with the collective-aware step (parallel/big_graph.py) —
        # the SP analog of SURVEY.md §2.4 for slides too big for one chip.
        # Takes precedence over the lattice path: the lattice one-hot
        # aggregation materialises [B, N*k, N] and cannot serve graphs that
        # exceed one chip.
        n_dev = jax.local_device_count()
        threshold = self.config_train.get("big_graph_edge_threshold", 1_000_000)
        self._big_graph = n_dev > 1 and cap_e > threshold
        if self._big_graph:
            cap_e = ((cap_e + n_dev - 1) // n_dev) * n_dev

        # lattice fast path (PERF_NOTES): HEAT2/HEAT4 on a lattice-packable
        # dataset (out-degrees <= k, padding-masked) train on the [B, N, k]
        # lattice twin — identical param tree, destination reductions as
        # one-hot GEMMs instead of segment scatters. Auto-selected;
        # `train.lattice: off` disables.
        self._lattice = False
        self._lat_model = None
        self._lat_eval_fwd = None
        self._lat_eval_splits: Dict[str, Any] = {}
        self._split_info_cache: Dict[str, Any] = {}
        if not self._big_graph and self.is_hetero and str(
            self.config_train.get("lattice", "auto")
        ).lower() not in ("off", "false", "0"):
            from ..config import parse_lattice_twin

            self._lat_model = parse_lattice_twin(self.config_gnn)
        if self._lat_model is not None:
            from ..data.lattice_loader import (
                LatticeLoader,
                lattice_batch_for_budget,
            )

            probe = lat_probe
            # the one-hot destination matrix is the lattice path's working
            # set: [B, N*k, N] f32; stay on the segment path when it would
            # not comfortably fit (2 GB default budget) — the shared
            # budget helper keeps this arithmetic in ONE place
            budget = self.config_train.get("lattice_mem_budget", 2 << 30)
            if probe is not None and (
                lattice_batch_for_budget(
                    probe[0], probe[1], budget, max_batch=self.batch_size
                ) == self.batch_size
            ):
                self._lattice = True
                self._lat_k, lat_cap_n = probe
                self.loader = LatticeLoader(
                    self.train_data, self.batch_size, self._lat_k,
                    lat_cap_n, shuffle=True, seed=seed,
                )
                print(f"lattice mode: k={self._lat_k} (masked padding for "
                      f"shorter rows), node capacity {lat_cap_n}")
            else:
                self._lat_model = None

        if not self._lattice:
            self.loader = GraphLoader(
                self.train_data,
                self.batch_size,
                shuffle=True,
                seed=seed,
                node_capacity=cap_n,
                edge_capacity=cap_e,
            )

        self.rng = jax.random.PRNGKey(seed)
        self.state: Optional[TrainState] = None
        self.start_epoch = 0
        if self._lattice:
            donate = () if jax.default_backend() == "cpu" else (0,)
            self._train_step = jax.jit(self._train_step_lattice_impl,
                                       donate_argnums=donate)
        elif self._big_graph:
            from ..parallel import make_mesh
            from ..parallel.big_graph import make_big_graph_train_step, shard_edges

            mesh = make_mesh(n_dev)
            inner = make_big_graph_train_step(
                self.model, self.tx, self.loss_fcn, self.is_hetero, mesh
            )
            self._train_step = lambda state, g, labels, weights: inner(
                state, shard_edges(g, n_dev), labels, weights
            )
            print(f"big-graph mode: edge store sharded over {n_dev} devices "
                  f"(capacity {cap_e} > threshold {threshold})")
        else:
            # donate the TrainState: params/opt-state updates alias their
            # input buffers instead of allocating fresh HBM every step (the
            # old state is always replaced, never re-read). CPU XLA can't
            # donate these, so gate to device backends to keep tests quiet.
            donate = () if jax.default_backend() == "cpu" else (0,)
            self._train_step = jax.jit(self._train_step_impl,
                                       donate_argnums=donate)
        # eval datasets, loaders (with their one-off capacity scans) and the
        # compiled eval forward are built once and reused every epoch — the
        # reference reloads the checkpoint and rescans the split per epoch
        # (train_gnn.py:111-115); round 1 replaced the checkpoint reload but
        # still rescanned (VERDICT.md weak #3)
        self._eval_fwd = eval_forward_for(self.model, self.is_hetero)
        self._eval_splits: Dict[str, tuple] = {}

    # ------------------------------------------------------------------ #
    def _prepare_graph(self, g: TypedGraph) -> TypedGraph:
        return g if self.is_hetero else to_homogeneous(g)

    def init_state(self, example) -> TrainState:
        init_rng, self.rng = jax.random.split(self.rng)
        if self._lattice:
            # the lattice twin's param tree is IDENTICAL to the TypedGraph
            # model's (models/lattice.py), so checkpoints stay interchangeable
            variables = self._lat_model.init(init_rng, example)
        else:
            variables = self.model.init(init_rng, self._prepare_graph(example))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=self.rng,
            step=jnp.zeros((), jnp.int32),
        )
        # resume from the latest checkpoint version when one exists
        # (beyond the reference, whose resume is weights-only via the
        # evaluator — checkpoint.py:95-105; we restore optimizer + PRNG too)
        if self.checkpoint_manager.version > 0:
            target = {
                "params": params,
                "batch_stats": batch_stats,
                "opt_state": opt_state,
                "rng": self.rng,
            }
            try:
                restored = self.checkpoint_manager.load_model(
                    jax.tree.map(np.asarray, target)
                )
                restored = jax.tree.map(jnp.asarray, restored)
                state = state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    opt_state=restored["opt_state"],
                    rng=restored["rng"],
                )
                self.start_epoch = self.checkpoint_manager.version
                print(f"Resumed from checkpoint v{self.start_epoch}")
            except (FileNotFoundError, KeyError, ValueError) as e:
                print(f"Could not resume from checkpoint ({e}); starting fresh")
        return state

    def _train_step_impl(self, state: TrainState, graph: TypedGraph, labels, weights):
        rng, aug_key, drop_key = jax.random.split(state.rng, 3)
        graph = self._prepare_graph(graph)
        graph = transforms.train_transform(graph, aug_key)

        def loss_fn(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = self.model.apply(
                variables,
                graph,
                train=True,
                rngs={"dropout": drop_key},
                mutable=mutable,
            )
            logits, new_vars = out if mutable else (out, {})
            loss = self.loss_fcn(logits, labels, weights)
            return loss, (logits, new_vars.get("batch_stats", state.batch_stats))

        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, loss, jax.nn.softmax(logits)

    def _train_step_lattice_impl(self, state: TrainState, graph, labels, weights):
        from ..models.lattice import lattice_train_transform

        rng, aug_key, drop_key = jax.random.split(state.rng, 3)
        graph = lattice_train_transform(graph, aug_key)

        def loss_fn(params):
            logits = self._lat_model.apply(
                {"params": params}, graph, train=True,
                rngs={"dropout": drop_key},
            )
            loss = self.loss_fcn(logits, labels, weights)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            opt_state=new_opt,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, loss, jax.nn.softmax(logits)

    # ------------------------------------------------------------------ #
    def train(self, log_every: int = 1) -> Dict[str, float]:
        print("Start training GNN")
        last_stats: Dict[str, float] = {}
        if self.state is None and len(self.loader) > 0:
            gb0, _, _ = self.loader._make_batch(list(range(min(self.batch_size, len(self.train_data)))))
            self.state = self.init_state(gb0)
        for epoch in range(self.start_epoch, self.n_epoch):
            t0 = time.time()
            # accumulate losses/probs as device arrays; ONE host fetch per
            # epoch (the reference syncs per step, train_gnn.py:73-77 — on
            # remote links a per-step D2H costs ~40 ms, PERF_NOTES.md)
            loss_dev, prob_dev, labels_host, weights_host = [], [], [], []
            for gb, labels, weights in self.loader:
                if self.state is None:
                    self.state = self.init_state(gb)
                with GLOBAL_TIMER.stage("train/step"):
                    self.state, loss, prob = self._train_step(
                        self.state, gb, jnp.asarray(labels), jnp.asarray(weights)
                    )
                loss_dev.append(loss)
                prob_dev.append(prob)
                labels_host.append(labels)
                weights_host.append(weights)

            with GLOBAL_TIMER.stage("train/epoch_fetch"):
                res = float(jnp.stack(loss_dev).sum())
                prob_all = np.asarray(jnp.concatenate(prob_dev))
            labels_all = np.concatenate(labels_host)
            real = np.concatenate(weights_host) > 0
            prob_cat = prob_all[real]
            label_cat = labels_all[real]
            # per-batch mean of batch accuracies, like the reference
            accs = []
            off = 0
            for w in weights_host:
                r = w > 0
                p = prob_all[off : off + len(w)][r]
                accs.append(accuracy(p, labels_all[off : off + len(w)][r]))
                off += len(w)
            acc = float(np.mean(accs))
            precision, recall, f1, train_auc = metrics(
                prob_cat, label_cat, average=self.average
            )

            # validation + testing every epoch, like the reference
            with GLOBAL_TIMER.stage("train/eval_test"):
                test_m = self.evaluate_split(self.eval_path)
            with GLOBAL_TIMER.stage("train/eval_val"):
                val_m = self.evaluate_split(self.valid_path)

            epoch_stats = {
                "Epoch": epoch + 1,
                "Train Loss: ": res,
                "Training Accuracy": acc,
                "Training Precision": precision,
                "Training Recall": recall,
                "Training F1": f1,
                "Training AUC": train_auc,
                "Validation Accuracy": val_m["acc"],
                "Validation F1": val_m["f1"],
                "Validation Precision": val_m["precision"],
                "Validation Recall": val_m["recall"],
                "Validation AUC": val_m["auc"],
                "Testing Accuracy": test_m["acc"],
                "Testing F1": test_m["f1"],
                "Testing Precision": test_m["precision"],
                "Testing Recall": test_m["recall"],
                "Testing AUC": test_m["auc"],
            }
            self.checkpoint_manager.write_new_version(
                self.config, self._checkpoint_state(), epoch_stats
            )
            self.checkpoint_manager.remove_old_version()
            last_stats = epoch_stats
            if log_every and (epoch % log_every == 0):
                print(
                    f"Epoch {epoch} | loss {res:.4f} | acc {acc:.4f} | "
                    f"val auc {val_m['auc']:.4f} | test auc {test_m['auc']:.4f} | "
                    f"{time.time() - t0:.2f}s"
                )
        return last_stats

    def _checkpoint_state(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "rng": self.state.rng,
        }

    def _split_info(self, split_path: str):
        """(data, average, stacked, (cap_n, cap_e), lattice_probe) — ONE
        dataset scan per split (probe_lattice_and_capacities), shared by
        the lattice and TypedGraph eval paths so an irregular split
        doesn't pay the full-split disk read twice. stacked=True (hetero
        models on the TypedGraph fallback): slides evaluate independently
        — per-slide occupancy, the reference's one-at-a-time semantics
        (eval_homo_graph.py:75) — via a vmapped forward, 8 per dispatch;
        caps are then PER-SLIDE. Homo models flat-batch; the lattice
        path batches too (twin presence='graph')."""
        if split_path not in self._split_info_cache:
            from ..data.lattice_loader import probe_lattice_and_capacities

            data, average = select_dataset(self.config_data, split_path, "eval")
            stacked = self.is_hetero
            cap_n, cap_e, probe = probe_lattice_and_capacities(
                data, 1 if stacked else 8,
                max_pad_ratio=float(
                    self.config_train.get("lattice_pad_ratio", 1.5)
                ),
            )
            self._split_info_cache[split_path] = (
                data, average, stacked, (cap_n, cap_e), probe
            )
        return self._split_info_cache[split_path]

    def _evaluate_split_lattice(self, split_path: str):
        """Per-epoch eval on the lattice path (falls back to the TypedGraph
        evaluator — same params, same metrics — when a split is irregular)."""
        from ..data.lattice_loader import (
            LatticeLoader,
            lattice_batch_for_budget,
        )

        if split_path not in self._lat_eval_splits:
            data, average, _stacked, _caps, probe = self._split_info(split_path)
            entry = None
            if probe is not None:
                budget = self.config_train.get("lattice_mem_budget", 2 << 30)
                bs = lattice_batch_for_budget(probe[0], probe[1], budget)
                if bs is not None:
                    entry = (average, LatticeLoader(
                        data, bs, probe[0], probe[1], shuffle=False))
            self._lat_eval_splits[split_path] = entry
        entry = self._lat_eval_splits[split_path]
        if entry is None:
            return None
        average, loader = entry
        from .evaluator import evaluate_lattice, make_lattice_eval_fn

        if self._lat_eval_fwd is None:
            self._lat_eval_fwd = make_lattice_eval_fn(self._lat_model)
        return evaluate_lattice(
            self._lat_model, self.state.params, loader, average,
            fwd=self._lat_eval_fwd,
        )

    def evaluate_split(self, split_path: str) -> Dict[str, float]:
        if self._lattice:
            m = self._evaluate_split_lattice(split_path)
            if m is not None:
                return m
        if split_path not in self._eval_splits:
            data, average, stacked, caps, _probe = self._split_info(split_path)
            self._eval_splits[split_path] = (
                data, average,
                make_eval_loader(data, caps=caps, stacked=stacked),
            )
        data, average, loader = self._eval_splits[split_path]
        return evaluate(
            self.model,
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            data,
            average,
            is_hetero=self.is_hetero,
            loader=loader,
            fwd=self._eval_fwd,
        )
