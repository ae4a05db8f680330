"""Training / evaluation / checkpoint orchestration."""
from .checkpoint import CheckpointManager
from .evaluator import HomoGraphEvaluator, evaluate
from .metrics import accuracy, metrics
from .trainer import GNNTrainer, TrainState, select_dataset

__all__ = [
    "CheckpointManager",
    "HomoGraphEvaluator",
    "evaluate",
    "accuracy",
    "metrics",
    "GNNTrainer",
    "TrainState",
    "select_dataset",
]
