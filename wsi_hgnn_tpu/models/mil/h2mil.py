"""H2MIL — hierarchical heterogeneous-graph MIL over multi-resolution trees.

Re-design of /root/reference/baselines/H2MIL/code/{RAConv,IHPool,
main_baselines_kfold}.py for fixed shapes:

  * `RAConvLayer` keeps the reference's two-level attention exactly
    (RAConv.py:24-185): per-edge GAT logits softmaxed within each
    (dst node, source-resolution-type) group, multiplied by a
    resolution-level attention over the per-(dst, src-type) mean aggregates,
    then summed into the destination.
  * `IHPool` is re-designed with FIXED cluster budgets: the reference picks
    data-dependent numbers of cluster centres by evenly-spaced fitness order
    statistics and loops per substructure (IHPool.py:97-230) — shapes change
    every call, which XLA cannot compile. Here each resolution level gets a
    static budget K_l; centres are the same evenly-spaced fitness quantiles —
    level-2 centres selected PER PARENT CLUSTER (k2 // k1 each, mirroring the
    reference's per-substructure clustering so every populated cluster owns
    centres), assignment is nearest (x, y, fitness) centre with a hierarchy
    penalty keeping level-2 nodes in their parent's cluster, and
    features/coords pool by segment mean. Padding clusters are masked out.
  * `H2MIL` is the GCN head (main_baselines_kfold.py:31-100): RAConv ->
    pool -> mean-pool readout, twice, summed, through a 2-layer classifier.

Inputs use the flat arrays of the reference's PyG Data: feats [N, D],
(src, dst) tree-adjacency edges, node_type [N] in {0, 1, 2} (resolution
level), tree [N] (parent index), xy [N, 2], plus masks.

Two tree builders: `build_tree_graph_levels` consumes REAL two-
magnification nested bags (the reference's actual pyramid,
github_pretreat.py — scan with `scan_nested_bag`); `build_tree_graph`
synthesises the parent level from single-magnification features when no
pyramid exists.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...graph import ops as gops

from ...graph.ops import _NEG_INF
_N_RES = 3  # resolution levels {thumbnail 0, low 1, high 2}


class TreeGraph(NamedTuple):
    feats: jax.Array      # [N, D]
    src: jax.Array        # [E]
    dst: jax.Array        # [E]
    node_type: jax.Array  # [N] resolution level
    tree: jax.Array       # [N] parent node index (thumbnail -> itself)
    xy: jax.Array         # [N, 2]
    node_mask: jax.Array  # [N]
    edge_mask: jax.Array  # [E]


def build_tree_graph(
    feats,
    coords,
    cell: int = 4,
    node_capacity: Optional[int] = None,
    edge_capacity: Optional[int] = None,
    bucket_base: int = 256,
) -> TreeGraph:
    """Build the H2MIL multi-resolution tree from ONE magnification level.

    The reference constructs its tree from a 2-level DeepZoom pyramid
    (5x + 10x) with per-level 8-neighbour adjacency plus parent-child
    links (`edge_index_tree_8nb`, /root/reference/baselines/H2MIL/code/
    WSI_processing + main_baselines_kfold.py data fields node_type/
    node_tree/x_y_index). When only single-level features exist (the
    train_mil bag contract), the low-resolution level is synthesised by
    grouping patches into `cell` x `cell` tile blocks whose features are
    the block means — the same tree topology with a virtual parent level.

    Returns a padded TreeGraph: node 0 is the thumbnail/root (global mean,
    type 0), then one type-1 node per occupied block, then the type-2
    patches. Edges: root<->level-1, parent<->child, and 8-neighbour
    adjacency within each level (both directions).
    """
    import numpy as np

    from ...graph.typed_graph import bucket_size
    from .simclr import spatial_adjacency

    feats = np.asarray(feats, np.float32)
    coords = np.asarray(coords, np.int64)
    n2, d = feats.shape

    block = [tuple(c // cell) for c in coords]
    blocks = sorted(set(block))
    bidx = {b: i for i, b in enumerate(blocks)}
    n1 = len(blocks)
    parent1 = np.asarray([bidx[b] for b in block], np.int32)  # patch -> block

    f1 = np.zeros((n1, d), np.float32)
    np.add.at(f1, parent1, feats)
    cnt = np.bincount(parent1, minlength=n1).astype(np.float32)
    f1 /= np.maximum(cnt, 1.0)[:, None]
    xy1 = np.zeros((n1, 2), np.float64)
    np.add.at(xy1, parent1, coords.astype(np.float64))
    xy1 /= np.maximum(cnt, 1.0)[:, None]

    root_feat = feats.mean(0, keepdims=True)
    root_xy = coords.astype(np.float64).mean(0, keepdims=True)

    # node layout: [root, level-1 blocks, level-2 patches]
    off1, off2 = 1, 1 + n1
    n = off2 + n2
    all_feats = np.concatenate([root_feat, f1, feats], 0)
    all_xy = np.concatenate([root_xy, xy1, coords.astype(np.float64)], 0)
    # normalise coordinates to [-1, 1] per axis, as the reference does
    # before pooling (x_y_index * 2 - 1, main_baselines_kfold.py:62):
    # IHPool's distance adds spatial distance to a tanh fitness in
    # [-1, 1], so raw tile-grid coordinates would drown the fitness term
    lo, hi = all_xy.min(0), all_xy.max(0)
    span = np.maximum(hi - lo, 1e-12)
    all_xy = (all_xy - lo) / span * 2.0 - 1.0
    node_type = np.concatenate(
        [np.zeros(1, np.int32), np.ones(n1, np.int32), np.full(n2, 2, np.int32)]
    )
    tree = np.concatenate(
        [np.zeros(1, np.int32), np.zeros(n1, np.int32), off1 + parent1]
    )

    src2, dst2 = spatial_adjacency([tuple(c) for c in coords])
    src1, dst1 = spatial_adjacency(blocks)
    srcs = [off2 + src2, off1 + src1]
    dsts = [off2 + dst2, off1 + dst1]
    # parent<->child + root<->level-1 (both directions)
    child = np.arange(n2, dtype=np.int32) + off2
    srcs += [child, tree[child], off1 + np.arange(n1, dtype=np.int32),
             np.zeros(n1, np.int32)]
    dsts += [tree[child], child, np.zeros(n1, np.int32),
             off1 + np.arange(n1, dtype=np.int32)]
    src = np.concatenate(srcs).astype(np.int32)
    dst = np.concatenate(dsts).astype(np.int32)
    e = len(src)

    cap_n = node_capacity or bucket_size(n, base=bucket_base)
    cap_e = edge_capacity or bucket_size(e, base=bucket_base)
    if cap_n < n or cap_e < e:
        raise ValueError(f"tree capacity too small: {n}>{cap_n} or {e}>{cap_e}")

    def pad(x, cap, fill=0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    return TreeGraph(
        feats=pad(all_feats, cap_n),
        src=pad(src, cap_e),
        dst=pad(dst, cap_e),
        node_type=pad(node_type, cap_n),
        tree=pad(tree, cap_n),
        xy=pad(all_xy.astype(np.float32), cap_n),
        node_mask=np.arange(cap_n) < n,
        edge_mask=np.arange(cap_e) < e,
    )


def scan_nested_bag(bag_dir, ext: str = "jpeg"):
    """Scan one 2-level nested bag directory (pipeline.tiler.nested_patches
    layout: low-mag tiles ``{x}_{y}.{ext}`` at the root, each with an
    optional child directory ``{x}_{y}/`` of high-mag tiles
    ``{hx}_{hy}.{ext}``) into the reference's real-pyramid fields
    (/root/reference/baselines/H2MIL/code/github_pretreat.py:60-331:
    per-level node lists with grid coords, the 10x -> 5x parent map, and the
    optional slide thumbnail the reference featurizes as ``-1.jpeg``).

    Returns ``(low_paths, low_xy [n1,2] int, high_paths, high_xy [n2,2] int,
    parent [n2] int index into low_paths, thumb_path | None)``. Childless
    low tiles are kept (the reference keeps them too — tiler.py:231-238).
    """
    import numpy as np
    from pathlib import Path

    bag = Path(bag_dir)
    thumb = None
    low = []
    for p in sorted(bag.glob(f"*.{ext}")):
        stem = p.name.rsplit(".", 1)[0]
        if stem in ("-1", "thumbnail"):
            thumb = p
            continue
        x, y = stem.split("_")[:2]
        low.append((p, int(x), int(y)))
    if not low:
        raise FileNotFoundError(f"no low-magnification tiles under {bag}")
    high, parent = [], []
    for i, (p, x, y) in enumerate(low):
        child_dir = bag / f"{x}_{y}"
        if not child_dir.is_dir():
            continue
        for hp in sorted(child_dir.glob(f"*.{ext}")):
            hx, hy = hp.name.rsplit(".", 1)[0].split("_")[:2]
            high.append((hp, int(hx), int(hy)))
            parent.append(i)
    low_paths = [p for p, _, _ in low]
    low_xy = np.asarray([(x, y) for _, x, y in low], np.int64).reshape(-1, 2)
    high_paths = [p for p, _, _ in high]
    high_xy = np.asarray([(x, y) for _, x, y in high], np.int64).reshape(-1, 2)
    return (low_paths, low_xy, high_paths, high_xy,
            np.asarray(parent, np.int32), thumb)


def build_tree_graph_levels(
    feats1,
    xy1,
    feats2,
    xy2,
    parent,
    thumb_feat=None,
    node_capacity: Optional[int] = None,
    edge_capacity: Optional[int] = None,
    bucket_base: int = 256,
) -> TreeGraph:
    """Build the H2MIL tree from REAL two-magnification features — the
    reference's actual input contract (github_pretreat.py): node 0 is the
    slide thumbnail, level 1 the low-magnification (5x) tiles, level 2 the
    high-magnification (10x) tiles nested under their level-1 parents.

    Matches the reference field for field:
      * edges (get_edge_index_2, github_pretreat.py:94-206): thumbnail <->
        every level-1 node (both directions), level-1 <-> each of its
        level-2 children (both directions), plus 8-neighbour grid adjacency
        within each level (symmetric by construction);
      * node_tree (:228-254): level-1 -> thumbnail, level-2 -> its level-1
        parent (the thumbnail points at itself — the reference's -1
        sentinel is never dereferenced, ours must stay a valid index);
      * x_y_index (:257-315 + main_baselines_kfold.py:60): per-level grid
        coords divided by that level's max, then ``* 2 - 1``; the thumbnail
        sits at (0, 0) -> (-1, -1).

    thumb_feat: the featurized slide thumbnail (the reference extracts a
    real ``-1.jpeg`` thumbnail feature, WSI_processing/generate_thumbnail
    .py). When None the level-1 feature mean stands in — a documented
    degradation for bags tiled without a thumbnail.
    """
    import numpy as np

    from ...graph.typed_graph import bucket_size
    from .simclr import spatial_adjacency

    feats1 = np.asarray(feats1, np.float32)
    feats2 = np.asarray(feats2, np.float32)
    xy1 = np.asarray(xy1, np.int64).reshape(-1, 2)
    xy2 = np.asarray(xy2, np.int64).reshape(-1, 2)
    parent = np.asarray(parent, np.int32)
    n1, d = feats1.shape
    n2 = feats2.shape[0]
    if n2 != len(parent):
        raise ValueError(f"{n2} level-2 nodes but {len(parent)} parents")
    if n2 and (parent.min() < 0 or parent.max() >= n1):
        raise ValueError("parent indices out of the level-1 range")

    root_feat = (feats1.mean(0, keepdims=True) if thumb_feat is None
                 else np.asarray(thumb_feat, np.float32).reshape(1, d))

    # per-level max normalisation then * 2 - 1 (github_pretreat.py:298-315,
    # main_baselines_kfold.py:60); thumbnail (0, 0) -> (-1, -1)
    def norm(xy):
        mx = np.maximum(xy.max(0), 1) if len(xy) else np.ones(2)
        return xy.astype(np.float64) / mx * 2.0 - 1.0

    all_xy = np.concatenate(
        [np.full((1, 2), -1.0), norm(xy1), norm(xy2)], 0
    )

    off1, off2 = 1, 1 + n1
    n = off2 + n2
    all_feats = np.concatenate([root_feat, feats1, feats2], 0)
    node_type = np.concatenate(
        [np.zeros(1, np.int32), np.ones(n1, np.int32), np.full(n2, 2, np.int32)]
    )
    tree = np.concatenate(
        [np.zeros(1, np.int32), np.zeros(n1, np.int32), off1 + parent]
    )

    src1, dst1 = spatial_adjacency([tuple(c) for c in xy1])
    src2, dst2 = spatial_adjacency([tuple(c) for c in xy2])
    l1 = off1 + np.arange(n1, dtype=np.int32)
    child = off2 + np.arange(n2, dtype=np.int32)
    srcs = [off1 + src1, off2 + src2,
            l1, np.zeros(n1, np.int32),          # level-1 <-> thumbnail
            child, tree[child]]                   # level-2 <-> parent
    dsts = [off1 + dst1, off2 + dst2,
            np.zeros(n1, np.int32), l1,
            tree[child], child]
    src = np.concatenate(srcs).astype(np.int32)
    dst = np.concatenate(dsts).astype(np.int32)
    e = len(src)

    cap_n = node_capacity or bucket_size(n, base=bucket_base)
    cap_e = edge_capacity or bucket_size(e, base=bucket_base)
    if cap_n < n or cap_e < e:
        raise ValueError(f"tree capacity too small: {n}>{cap_n} or {e}>{cap_e}")

    def pad(x, cap, fill=0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    return TreeGraph(
        feats=pad(all_feats, cap_n),
        src=pad(src, cap_e),
        dst=pad(dst, cap_e),
        node_type=pad(node_type, cap_n),
        tree=pad(tree, cap_n),
        xy=pad(all_xy.astype(np.float32), cap_n),
        node_mask=np.arange(cap_n) < n,
        edge_mask=np.arange(cap_e) < e,
    )


class RAConvLayer(nn.Module):
    """Resolution-aware attention convolution (RAConv.py:24-185)."""

    features: int
    heads: int = 1
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, g: TreeGraph, x: jax.Array, train: bool = False) -> jax.Array:
        h, c = self.heads, self.features
        n = x.shape[0]
        lin = nn.Dense(h * c, use_bias=False, name="lin_l")
        xl = lin(x).reshape(n, h, c)
        att_l = self.param("att_l", nn.initializers.glorot_uniform(), (1, h, c))
        att_r = self.param("att_r", nn.initializers.glorot_uniform(), (1, h, c))
        alpha_l = (xl * att_l).sum(-1)  # [N, H]
        alpha_r = (xl * att_r).sum(-1)

        # node-level attention grouped by (dst, src resolution type)
        # (RAConv.py:118 `new_index = start_node_type + edge_index[1]*3`)
        stype = g.node_type[g.src]
        group = g.dst * _N_RES + stype  # [E]
        logits = nn.leaky_relu(
            alpha_l[g.src] + alpha_r[g.dst], negative_slope=self.negative_slope
        )
        alpha = gops.segment_softmax(
            logits, group, num_segments=n * _N_RES, mask=g.edge_mask
        )  # [E, H]

        # resolution-level aggregates: mean of raw x per (dst, src type)
        ew = g.edge_mask.astype(x.dtype)
        t_sum = jax.ops.segment_sum(
            x[g.src] * ew[:, None], group, num_segments=n * _N_RES
        )
        t_cnt = jax.ops.segment_sum(ew, group, num_segments=n * _N_RES)
        t_x = t_sum / jnp.maximum(t_cnt, 1.0)[:, None]  # [N*3, D]

        t_lin = nn.Dense(h * c, use_bias=False, name="t_lin_l")
        t_att_l = self.param("t_att_l", nn.initializers.glorot_uniform(), (1, h, c))
        t_att_r = self.param("t_att_r", nn.initializers.glorot_uniform(), (1, h, c))
        t_src = t_lin(t_x).reshape(n * _N_RES, h, c)
        t_dst = t_lin(x).reshape(n, h, c)
        t_logits = nn.leaky_relu(
            (t_src * t_att_l).sum(-1)
            + jnp.repeat((t_dst * t_att_r).sum(-1), _N_RES, axis=0),
            negative_slope=self.negative_slope,
        )  # [N*3, H]
        group_nodes = jnp.repeat(jnp.arange(n), _N_RES)
        t_alpha = gops.segment_softmax(
            t_logits, group_nodes, num_segments=n, mask=t_cnt > 0
        )  # [N*3, H]

        coeff = alpha * t_alpha[group]  # [E, H]
        msgs = xl[g.src] * coeff[:, :, None]
        msgs = jnp.where(g.edge_mask[:, None, None], msgs, 0.0)
        out = jax.ops.segment_sum(msgs, g.dst, num_segments=n)  # [N, H, C]
        out = out.reshape(n, h * c)
        out = out + self.param("bias", nn.initializers.zeros, (h * c,))
        return out


class IHPool(nn.Module):
    """Fixed-budget iterative hierarchical pooling (see module docstring).
    Budgets: k1 level-1 clusters, k2 level-2 clusters; output graph has
    1 + k1 + k2 node slots."""

    k1: int = 8
    k2: int = 32

    @nn.compact
    def __call__(self, g: TreeGraph, x: jax.Array):
        d = x.shape[-1]
        n = x.shape[0]
        w1 = self.param("weight_1", nn.initializers.uniform(1.0), (1, d))
        w2 = self.param("weight_2", nn.initializers.uniform(1.0), (1, d))

        def fitness(w, level):
            f = jnp.tanh((x * w).sum(-1) / jnp.maximum(jnp.linalg.norm(w), 1e-12))
            valid = g.node_mask & (g.node_type == level)
            return f, valid

        def centers(f, valid, k):
            """Evenly-spaced fitness order statistics as cluster centres
            (IHPool.py:126-135), padded-safe: invalid nodes sort to +inf."""
            key_f = jnp.where(valid, f, jnp.inf)
            order = jnp.argsort(key_f)
            n_valid = valid.sum()
            nv = jnp.maximum(n_valid, 1)
            # k evenly spaced picks over the valid prefix (distinct when
            # nv >= k since the stride nv/k >= 1); when nv < k use the
            # prefix itself — the evenly-spaced formula would duplicate
            # early centres AND starve later valid nodes
            even = (jnp.arange(k) * nv) // k
            prefix = jnp.minimum(jnp.arange(k), nv - 1)
            pos = jnp.clip(jnp.where(nv >= k, even, prefix), 0, n - 1)
            idx = order[pos]
            ok = jnp.arange(k) < jnp.minimum(k, n_valid)
            return idx, ok

        f1, v1 = fitness(w1, 1)
        c1_idx, c1_ok = centers(f1, v1, self.k1)
        f2, v2 = fitness(w2, 2)

        def assign(f, valid, c_idx, c_ok, parent_cluster=None, center_parent=None):
            """Nearest (x, y, fitness) centre (IHPool.py:30-56 euclidean_dist:
            spatial distance + fitness difference), with an optional
            hierarchy penalty keeping children inside the parent cluster."""
            p = jnp.concatenate([g.xy, f[:, None]], -1)  # [N, 3]
            cp = p[c_idx]  # [K, 3]
            d_xy = jnp.sqrt(
                jnp.maximum(((p[:, None, :2] - cp[None, :, :2]) ** 2).sum(-1), 1e-12)
            )
            d_f = jnp.abs(p[:, None, 2] - cp[None, :, 2])
            dist = d_xy + d_f
            dist = jnp.where(c_ok[None, :], dist, jnp.inf)
            if parent_cluster is not None:
                same = parent_cluster[:, None] == center_parent[None, :]
                dist = jnp.where(same, dist, dist + 1e6)
            return jnp.argmin(dist, axis=1)

        a1 = assign(f1, v1, c1_idx, c1_ok)  # [N] in [0, k1)
        # level-2 centres are selected PER PARENT CLUSTER — the reference
        # clusters each substructure separately (IHPool.py:162-195), so
        # every populated level-1 cluster owns level-2 centres and no
        # child is ever assigned across the hierarchy (a global-quantile
        # selection could leave a cluster centre-less, at which point the
        # +1e6 soft penalty would silently ship its children to a foreign
        # cluster). Static budget: q = k2 // k1 centres per parent,
        # evenly-spaced fitness order statistics within the parent's run
        # of the (parent, fitness)-sorted node order.
        parent_c1 = jnp.where(v2, a1[g.tree], self.k1)  # invalid -> sentinel
        q = max(self.k2 // self.k1, 1)
        # f2 = tanh(.) lies in (-1, 1); a stride-4 parent offset keeps the
        # per-parent runs disjoint in one global sort
        key2 = jnp.where(v2, parent_c1.astype(x.dtype) * 4.0 + f2, jnp.inf)
        order2 = jnp.argsort(key2)  # [N], parent-major, fitness-minor
        cnt_p = jax.ops.segment_sum(
            v2.astype(jnp.int32), parent_c1, num_segments=self.k1 + 1
        )[: self.k1]  # [k1] level-2 children per parent cluster
        start_p = (jnp.cumsum(cnt_p) - cnt_p)[:, None]  # [k1, 1]
        s = jnp.arange(q)[None, :]  # [1, q]
        nv = jnp.maximum(cnt_p, 1)[:, None]
        even = (s * nv) // q
        prefix = jnp.minimum(s, nv - 1)
        pos = start_p + jnp.where(nv >= q, even, prefix)  # [k1, q]
        c2_idx = order2[jnp.clip(pos, 0, n - 1).reshape(-1)]  # [k1*q]
        c2_ok = (s < cnt_p[:, None]).reshape(-1)
        center_parent = jnp.repeat(jnp.arange(self.k1), q)  # [k1*q]
        a2 = assign(f2, v2, c2_idx, c2_ok, parent_c1, center_parent)

        # global cluster id: 0 = thumbnail, 1..k1 = level1, k1+1.. = level2
        cluster = jnp.where(
            g.node_type == 0, 0,
            jnp.where(g.node_type == 1, 1 + a1, 1 + self.k1 + a2),
        )
        cluster = jnp.where(g.node_mask, cluster, 0)
        k_out = 1 + self.k1 + self.k2

        m = g.node_mask.astype(x.dtype)
        sums = jax.ops.segment_sum(x * m[:, None], cluster, num_segments=k_out)
        cnts = jax.ops.segment_sum(m, cluster, num_segments=k_out)
        new_x = sums / jnp.maximum(cnts, 1.0)[:, None]
        xy_sum = jax.ops.segment_sum(g.xy * m[:, None], cluster, num_segments=k_out)
        new_xy = xy_sum / jnp.maximum(cnts, 1.0)[:, None]

        new_type = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.ones(self.k1, jnp.int32),
             jnp.full(self.k2, 2, jnp.int32)]
        )
        # [k2] level-2 slots: the first k1*q map to their owning parent
        # cluster; the k2 - k1*q remainder (k2 not divisible by k1) are
        # never assigned (cnts == 0 -> masked out below)
        lvl2_parent = jnp.concatenate(
            [1 + center_parent.astype(jnp.int32),
             jnp.zeros(self.k2 - center_parent.shape[0], jnp.int32)]
        )
        new_tree = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.zeros(self.k1, jnp.int32),  # level-1 -> thumbnail
             lvl2_parent]  # level-2 -> parent cluster
        )
        new_mask = cnts > 0

        # A' = S^T A S through edge relabeling; duplicates act as weights
        new_src = cluster[g.src]
        new_dst = cluster[g.dst]
        new_emask = g.edge_mask & new_mask[new_src] & new_mask[new_dst]

        return TreeGraph(
            feats=new_x, src=new_src, dst=new_dst, node_type=new_type,
            tree=new_tree, xy=new_xy, node_mask=new_mask, edge_mask=new_emask,
        ), new_x


class H2MIL(nn.Module):
    """The H2MIL classifier head (main_baselines_kfold.py:31-100)."""

    hidden_dim: int
    n_classes: int
    k1: int = 8
    k2: int = 32
    dropout: float = 0.2

    @nn.compact
    def __call__(self, g: TreeGraph, train: bool = False) -> jax.Array:
        x = nn.LayerNorm(name="norm0")(g.feats)
        x = RAConvLayer(self.hidden_dim, name="conv1")(g, x, train)
        x = nn.relu(x)
        x = nn.LayerNorm(name="norm1")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        g1, x = IHPool(self.k1, self.k2, name="pool_1")(g, x)
        m1 = g1.node_mask.astype(x.dtype)[:, None]
        x1 = (x * m1).sum(0) / jnp.maximum(m1.sum(), 1.0)

        x = RAConvLayer(self.hidden_dim, name="conv2")(g1, x, train)
        x = nn.relu(x)
        x = nn.LayerNorm(name="norm2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        g2, x = IHPool(max(self.k1 // 2, 1), max(self.k2 // 2, 1), name="pool_2")(g1, x)
        m2 = g2.node_mask.astype(x.dtype)[:, None]
        x2 = (x * m2).sum(0) / jnp.maximum(m2.sum(), 1.0)

        z = x1 + x2
        z = nn.relu(nn.Dense(self.hidden_dim // 2, name="lin1")(z))
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        logits = nn.Dense(self.n_classes, name="lin2")(z)
        return logits[None, :]
