"""Slide -> graph construction + split generation entry point — the
reference's get_graph.py (/root/reference/get_graph.py:227-350) with the
same -config argument and YAML schema (graph_constructor / hovernet_config /
kimianet_config sections). The reference's hard-coded CONSTRUCT /
GET_TRAINVAL module globals (:234-235) become --construct / --trainval
flags, and the interactive confirm prompt (:333-335) becomes --yes.

  python get_graph.py -config configs/GraphConstruction/X.yml --construct
  python get_graph.py -config ... --trainval --fold 1 --yes
"""
from __future__ import annotations

import argparse
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent / "configs"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-config", type=str, default="",
                        help="Path to option YAML file.")
    parser.add_argument("--construct", action="store_true",
                        help="construct graphs from patch dirs")
    parser.add_argument("--trainval", action="store_true",
                        help="write train/val/test split lists")
    parser.add_argument("--fold", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--normal-path", type=str, default="",
                        help="normal-slide barcode list (classification/staging)")
    parser.add_argument("--label-path", type=str, default="",
                        help="staging/typing label table")
    parser.add_argument("--yes", action="store_true",
                        help="skip the interactive confirmation prompt")
    args = parser.parse_args()

    opt_path = args.config or str(
        CONFIG_DIR / "GraphConstruction/BRCA_HovernetKimia_graph_constructor.yml"
    )

    from wsi_hgnn_tpu.config import load_config
    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    config = load_config(opt_path)
    print(f"Loaded configs from {opt_path}")

    graph_config = config["graph_constructor"]
    hovernet_config = config.get("hovernet_config", {})
    kimianet_config = config.get("kimianet_config", {})

    if args.construct:
        from wsi_hgnn_tpu.pipeline import construct_all

        n = construct_all(graph_config, hovernet_config, kimianet_config)
        print(f"Constructed {n} slide graphs")

    if args.trainval:
        from wsi_hgnn_tpu.pipeline import generate_splits

        if not args.yes:
            check = input("Proceed? y/n\n")
            if check == "n":
                return
        out = generate_splits(
            graph_config,
            fold=args.fold,
            seed=args.seed,
            normal_path=args.normal_path,
            label_path=args.label_path,
        )
        print(f"Lists saved in {out}")


if __name__ == "__main__":
    main()
