"""Train / evaluate / explain entry point — the reference's main.py
(/root/reference/main.py:1-67) with the same -config/-seed arguments and
dispatch. The reference selects its mode via a hard-coded module global
(main.py:37); here it is the -mode flag (default 'train'), a documented
usability fix.

  python main.py -config configs/BRCA/HEAT2_kimia_v2.yml -seed 611
  python main.py -config ... -mode eval
  python main.py -config ... -mode graph_explain
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent / "configs"  # reference globals.py:3 (repo-anchored so CLIs work from any cwd)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-config", type=str, default="",
                        help="Path to option YAML file.")
    parser.add_argument("-seed", type=int, default=611,
                        help="random seed of the run")
    parser.add_argument("-mode", type=str, default="train",
                        choices=["train", "eval", "graph_explain"])
    args = parser.parse_args()

    # the reference's default points at a file that does not exist even
    # there (SURVEY.md §2.1 defects); ours points at a shipped config
    opt_path = args.config or str(
        CONFIG_DIR / "BRCA/HEAT2_kimia_classification.yml"
    )
    random.seed(args.seed)

    from wsi_hgnn_tpu.config import load_config
    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    config = load_config(opt_path)
    print(f"Loaded configs from {opt_path}")

    if args.mode == "train":
        if config["train_type"] == "gnn":
            from wsi_hgnn_tpu.train import GNNTrainer

            trainer = GNNTrainer(config, seed=args.seed)
        else:
            raise NotImplementedError("This type of model is not implemented")
        trainer.train()
    elif args.mode == "eval":
        if config["eval_type"] == "homo-graph":
            from wsi_hgnn_tpu.train import HomoGraphEvaluator

            evaluator = HomoGraphEvaluator(config)
        else:
            raise NotImplementedError("This type of evaluator is not implemented")
        evaluator.eval()
    elif args.mode == "graph_explain":
        from wsi_hgnn_tpu.explain import ExplainGraph

        explainer = ExplainGraph(config)
        explainer.eval()


if __name__ == "__main__":
    main()
