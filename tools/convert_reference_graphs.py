"""Convert the reference's pickled DGL slide graphs to this framework's
.npz format (SURVEY.md §7 step 3: strict-reproduction escape hatch).

The reference stores one pickled DGL graph per slide
(/root/reference/get_graph.py:279-289): heterogeneous graphs from
`dgl.to_heterogeneous` with 6 PanNuke node types x {neg, pos} edge types and
'feat'/'sim' data, and homogeneous twins. Unpickling requires the `dgl`
package (not part of this framework's dependencies) — run this tool in an
environment that has it:

    python tools/convert_reference_graphs.py --in-dir data/BRCA_kimia_lv0 \
        --out-dir data/BRCA_kimia_lv0_npz

Converted graphs train with logit-level parity: the npz loader rebuilds the
same flat typed graph this framework's own constructor emits.
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

import numpy as np


def convert_hetero(g) -> dict:
    """DGL heterograph -> flat arrays (node order: type-major, matching
    dgl.to_homogeneous so `sim`/edge order survive the round trip)."""
    import torch

    ntypes = sorted(g.ntypes, key=int)
    offsets, feats, types = {}, [], []
    off = 0
    for nt in ntypes:
        n = g.num_nodes(nt)
        offsets[nt] = off
        if n:
            feats.append(g.nodes[nt].data["feat"].numpy())
            types.append(np.full(n, int(nt), np.int32))
        off += n
    feat = np.concatenate(feats) if feats else np.zeros((0, 1024), np.float32)
    node_type = np.concatenate(types) if types else np.zeros(0, np.int32)

    srcs, dsts, esigns, sims = [], [], [], []
    for (s, e, d) in g.canonical_etypes:
        u, v = g.edges(etype=(s, e, d))
        if len(u) == 0:
            continue
        srcs.append(u.numpy().astype(np.int64) + offsets[s])
        dsts.append(v.numpy().astype(np.int64) + offsets[d])
        esigns.append(np.full(len(u), 1 if e == "pos" else 0, np.int32))
        ed = g.edges[(s, e, d)].data
        sims.append(
            ed["sim"].numpy().astype(np.float32)
            if "sim" in ed else np.ones(len(u), np.float32)
        )
    return dict(
        feat=feat.astype(np.float32),
        src=np.concatenate(srcs) if srcs else np.zeros(0, np.int64),
        dst=np.concatenate(dsts) if dsts else np.zeros(0, np.int64),
        node_type=node_type,
        esign=np.concatenate(esigns) if esigns else np.zeros(0, np.int32),
        sim=np.concatenate(sims) if sims else np.zeros(0, np.float32),
        is_hetero=True,
    )


def convert_homo(g) -> dict:
    u, v = g.edges()
    ed = g.edata
    e = len(u.numpy())
    return dict(
        feat=g.ndata["feat"].numpy().astype(np.float32),
        src=u.numpy().astype(np.int64),
        dst=v.numpy().astype(np.int64),
        node_type=None,
        esign=(ed["_TYPE"].numpy().astype(np.int32) if "_TYPE" in ed
               else np.ones(e, np.int32)),
        sim=(ed["sim"].numpy().astype(np.float32) if "sim" in ed
             else np.ones(e, np.float32)),
        is_hetero=False,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True,
                    help="reference out_dir with heterogeneous/ homogeneous/ pkls")
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args()

    try:
        import dgl  # noqa: F401
    except ImportError:
        sys.exit("this converter needs the `dgl` package to unpickle "
                 "reference graphs; run it in the reference's environment")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wsi_hgnn_tpu.data.datasets import save_graph_npz

    n = 0
    for kind, conv in (("heterogeneous", convert_hetero),
                       ("homogeneous", convert_homo)):
        out = os.path.join(args.out_dir, kind)
        os.makedirs(out, exist_ok=True)
        for p in sorted(glob.glob(os.path.join(args.in_dir, kind, "*.pkl"))):
            with open(p, "rb") as f:
                g = pickle.load(f)
            d = conv(g)
            name = os.path.basename(p)[:-4]
            save_graph_npz(os.path.join(out, name + ".npz"), **d)
            n += 1
    print(f"converted {n} graphs into {args.out_dir}")


if __name__ == "__main__":
    main()
