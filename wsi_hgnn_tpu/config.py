"""Config system + factories: the reference's `utils.ordered_yaml` and
`parser.parse_{gnn_model,optimizer,loss}` surface (/root/reference/utils.py:17-31,
/root/reference/parser.py:16-185), preserving the YAML section schema so the
reference's configs/ drop in unchanged.

Model factories return (flax module, needs_hetero: bool); optimizers are
optax transforms reproducing torch semantics (torch Adam's weight_decay is
L2-coupled — added to the gradient BEFORE the Adam moments — unlike AdamW).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Tuple

import optax
import yaml

from .models import GAT, GCN, GIN, HEATNet2, HEATNet4, HGT, HetRGCN, NTPoolGCN

try:
    from yaml import CLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import Loader as _Loader


class OrderedLoader(_Loader):
    pass


def _dict_constructor(loader, node):
    return OrderedDict(loader.construct_pairs(node))


OrderedLoader.add_constructor(
    yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _dict_constructor
)


def load_config(path) -> OrderedDict:
    """Ordered YAML load (reference utils.py:17-31 + main.py:40-42)."""
    with open(path) as f:
        return yaml.load(f, OrderedLoader)


def loads_config(text: str) -> OrderedDict:
    return yaml.load(text, OrderedLoader)


# --------------------------------------------------------------------- #
# factories
# --------------------------------------------------------------------- #
def parse_gnn_model(config_gnn: dict) -> Tuple[Any, bool]:
    """Build a model from the `GNN:` config section (reference parser.py:48-174).

    Returns (module, is_heterogeneous) — hetero models consume the typed
    graph, homogeneous ones its untyped view.
    """
    name = config_gnn["name"]

    if name == "GAT":
        n_layers = config_gnn["num_layers"]
        heads = [config_gnn["num_heads"]] * n_layers + [config_gnn["num_out_heads"]]
        return (
            GAT(
                n_layers=n_layers,
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                heads=tuple(heads),
                feat_drop=config_gnn["feat_drop"],
                attn_drop=config_gnn["attn_drop"],
                negative_slope=config_gnn["negative_slope"],
                residual=False,
                graph_pooling_type=config_gnn["graph_pooling_type"],
            ),
            False,
        )
    if name == "GCN" and config_gnn.get("graph_pooling_type") == "asap":
        # GCN + ASAP select-and-pool (reference pooling/ASAP.py:120-202,
        # which its own repo leaves unwired; BASELINE.json configs[1])
        from .models.asap import ASAPGCN

        return (
            ASAPGCN(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_layers=config_gnn["num_layers"],
                k=int(config_gnn.get("pool_k", 32)),
                dropout=config_gnn["feat_drop"],
            ),
            False,
        )
    if name == "GCN":
        return (
            GCN(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_layers=config_gnn["num_layers"],
                dropout=config_gnn["feat_drop"],
                graph_pooling_type=config_gnn["graph_pooling_type"],
            ),
            False,
        )
    if name == "GCN_NTPool":
        return (
            NTPoolGCN(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_node_types=config_gnn["n_node_types"],
                n_layers=config_gnn["num_layers"],
                dropout=config_gnn["feat_drop"],
                graph_pooling_type=config_gnn["graph_pooling_type"],
            ),
            True,
        )
    if name == "GIN":
        return (
            GIN(
                input_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                num_layers=config_gnn["num_layers"],
                num_mlp_layers=config_gnn["num_mlp_layers"],
                final_dropout=config_gnn["feat_drop"],
                graph_pooling_type=config_gnn["graph_pooling_type"],
                neighbor_pooling_type=config_gnn["neighbor_pooling_type"],
            ),
            False,
        )
    if name == "HetRGCN":
        return (
            HetRGCN(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_layers=config_gnn["num_layers"],
                n_node_types=config_gnn["n_node_types"],
                n_edge_types=len(config_gnn.get("edge_types", ["neg", "pos"])),
                graph_pooling_type=config_gnn["graph_pooling_type"],
            ),
            True,
        )
    if name == "HGT":
        return (
            HGT(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_layers=config_gnn["num_layers"],
                n_heads=config_gnn["num_heads"],
                n_node_types=config_gnn["n_node_types"],
            ),
            True,
        )
    if name == "HEAT2":
        return (
            HEATNet2(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_layers=config_gnn["num_layers"],
                n_heads=config_gnn["n_heads"],
                n_node_types=config_gnn["n_node_types"],
                dropout=config_gnn["feat_drop"],
                graph_pooling_type=config_gnn["graph_pooling_type"],
                typed_impl=str(config_gnn.get("typed_impl", "onehot")),
            ),
            True,
        )
    if name == "HEAT4":
        return (
            HEATNet4(
                in_dim=config_gnn["in_dim"],
                hidden_dim=config_gnn["hidden_dim"],
                out_dim=config_gnn["out_dim"],
                n_layers=config_gnn["num_layers"],
                n_heads=config_gnn["n_heads"],
                n_node_types=config_gnn["n_node_types"],
                dropout=config_gnn["feat_drop"],
                graph_pooling_type=config_gnn["graph_pooling_type"],
                # extension key (see parse_lattice_twin); the TypedGraph
                # path keeps the one-hot default until ragged is a
                # measured win HERE too (the lattice ladder does not
                # transfer 1:1 — this path is segment-op bound)
                typed_impl=str(config_gnn.get("typed_impl", "onehot")),
            ),
            True,
        )
    raise NotImplementedError(f"This GNN model is not implemented: {name!r}")


def parse_lattice_twin(config_gnn: dict):
    """The lattice fast-path twin of a GNN config, or None when the model
    has no lattice form. Twins share the exact flax param tree with their
    TypedGraph models (models/lattice.py), so checkpoints written by either
    path load in the other."""
    name = config_gnn["name"]
    if name not in ("HEAT2", "HEAT4"):
        return None
    # the lattice twins implement the mean/sum/max per-ntype readouts; any
    # other pooling value must stay on the TypedGraph model rather than
    # silently changing semantics (missing key defaults to 'mean' exactly
    # as the typed HEAT models' constructors do)
    pooling = config_gnn.get("graph_pooling_type", "mean")
    if pooling not in ("mean", "sum", "max"):
        return None
    from .models.lattice import HEATNet2Lattice, HEATNet4Lattice

    cls = HEATNet2Lattice if name == "HEAT2" else HEATNet4Lattice
    return cls(
        in_dim=config_gnn["in_dim"],
        hidden_dim=config_gnn["hidden_dim"],
        out_dim=config_gnn["out_dim"],
        n_layers=config_gnn["num_layers"],
        n_heads=config_gnn["n_heads"],
        n_node_types=config_gnn["n_node_types"],
        dropout=config_gnn["feat_drop"],
        graph_pooling_type=pooling,
        # typed-projection formulation: 'ragged' (type-sorted grouped GEMM,
        # ops.typed_linear_ragged — measured 1.1-1.5x over 'onehot' on the
        # b2/4/8 TPU train ladder, PERF_NOTES round-3 cont.) | 'onehot'
        # (all-T einsum + select) — an extension key absent from the
        # reference's YAML surface, so shipped configs stay identical
        typed_impl=str(config_gnn.get("typed_impl", "ragged")),
    )


def _scale_by_rss_torch(eps: float = 1e-10) -> optax.GradientTransformation:
    """torch.optim.Adagrad's accumulator scaling: g / (sqrt(sum g^2) + eps),
    zero initial accumulator. Differs from optax.scale_by_rss, which computes
    g * rsqrt(sum g^2 + eps) — eps inside the root."""
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update_fn(updates, state, params=None):
        del params
        nu = jax.tree.map(lambda g, t: g * g + t, updates, state)
        updates = jax.tree.map(lambda g, t: g / (jnp.sqrt(t) + eps), updates, nu)
        return updates, nu

    return optax.GradientTransformation(init_fn, update_fn)


def parse_optimizer(config_optim: dict) -> optax.GradientTransformation:
    """Optimizer from the `optimizer:` section (reference parser.py:16-45).

    torch coupling semantics: weight_decay is L2 added to the gradient
    before the optimizer update (torch.optim.Adam/SGD/Adadelta), so
    `add_decayed_weights` precedes the scaling transform.
    """
    method = config_optim["opt_method"].lower()
    lr = config_optim["lr"]
    wd = config_optim.get("weight_decay", 0.0)

    if method == "adagrad":
        # the reference couples BOTH lr_decay and weight_decay to the config's
        # weight_decay (parser.py:21-25); torch Adagrad's effective rate is
        # lr / (1 + (step-1) * lr_decay), reproduced here as a schedule
        # (first update: count=0 -> lr). NOTE: optax.scale_by_rss puts eps
        # INSIDE the sqrt (rsqrt(nu + eps)); torch Adagrad divides by
        # (sqrt(nu) + eps) — a ~1e-4-relative trajectory drift at small
        # gradients (test_train_parity caught it), so the torch form is
        # implemented directly.
        inner = _scale_by_rss_torch(eps=1e-10)
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(inner)
        parts.append(
            optax.scale_by_schedule(lambda count: -lr / (1.0 + count * wd))
        )
        return optax.chain(*parts)
    if method == "adadelta":
        inner = optax.scale_by_adadelta()
    elif method == "adam":
        inner = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    else:  # SGD fallback, like the reference's else-branch
        inner = optax.identity()

    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(inner)
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def parse_loss(config_train: dict):
    """Loss from the `train:` section (reference parser.py:177-185).

    Returns fn(logits [B, C], labels [B] int, weights [B]) -> scalar mean.
    'CE' is torch CrossEntropyLoss (softmax-CE on logits). 'BCE': the
    reference's branch returns nn.BCELoss but its trainer then feeds RAW
    logits and integer labels (train_gnn.py:67-68), which BCELoss rejects
    (inputs outside [0,1], shape mismatch) — the reference option is
    latently broken and unused (every shipped config says "CE"). Here
    'BCE' is a WORKING interpretation: per-class BCE of softmax
    probabilities against the one-hot label — a deliberate repair, not
    reference parity.
    """
    name = config_train["loss"]
    import jax.numpy as jnp
    import jax

    if name == "CE":
        def ce(logits, labels, weights):
            ls = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(ls, labels[:, None], axis=1)[:, 0]
            return (nll * weights).sum() / jnp.maximum(weights.sum(), 1.0)
        return ce
    if name == "BCE":
        def bce(logits, labels, weights):
            p = jax.nn.softmax(logits)
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            eps = 1e-12
            ll = onehot * jnp.log(p + eps) + (1 - onehot) * jnp.log(1 - p + eps)
            per = -ll.mean(-1)
            return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)
        return bce
    raise NotImplementedError(f"This Loss is not implemented: {name!r}")
