"""Evaluation metrics — NumPy implementations of the reference's sklearn
pack (/root/reference/utils.py:34-47), dependency-free.

Parity notes:
  * binary AUC is computed from HARD predictions (roc_curve on argmax
    labels), reproducing the reference's quirk at utils.py:42-44 — this
    equals balanced accuracy, not a probability-ranked AUC. A
    probability-based `binary_auc_from_probs` is provided for honest
    benchmarking; `metrics()` keeps the reference behaviour.
  * multiclass AUC is one-vs-rest on probabilities, macro-averaged
    (roc_auc_score(..., multi_class='ovr'), utils.py:46).
"""
from __future__ import annotations

import numpy as np


def accuracy(outputs: np.ndarray, targets: np.ndarray) -> float:
    """Reference `acc` (utils.py:34-35): argmax match rate."""
    return float(np.mean(outputs.argmax(axis=1) == targets))


def _prf_binary(targets, preds):
    tp = float(np.sum((preds == 1) & (targets == 1)))
    fp = float(np.sum((preds == 1) & (targets == 0)))
    fn = float(np.sum((preds == 0) & (targets == 1)))
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
    return precision, recall, f1


def _prf_macro(targets, preds, classes):
    ps, rs, fs = [], [], []
    for c in classes:
        p, r, f = _prf_binary((targets == c).astype(int), (preds == c).astype(int))
        ps.append(p); rs.append(r); fs.append(f)
    return float(np.mean(ps)), float(np.mean(rs)), float(np.mean(fs))


def binary_auc_from_scores(targets: np.ndarray, scores: np.ndarray) -> float:
    """ROC-AUC via the rank statistic (equals sklearn roc_curve+auc).
    Works for hard 0/1 predictions too (then = balanced accuracy)."""
    targets = np.asarray(targets).astype(int)
    scores = np.asarray(scores).astype(float)
    pos = scores[targets == 1]
    neg = scores[targets == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty_like(order, dtype=float)
    sorted_scores = np.concatenate([neg, pos])[order]
    # average ranks for ties
    ranks[order] = np.arange(1, len(order) + 1)
    uniq, inv, counts = np.unique(sorted_scores, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg_rank = (cum - (counts - 1) / 2.0).astype(float)
    tied = avg_rank[inv]
    tied_full = np.empty(len(order), dtype=float)
    tied_full[order] = tied
    r_pos = tied_full[len(neg):].sum()
    n_pos, n_neg = len(pos), len(neg)
    return float((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def binary_auc_from_probs(targets: np.ndarray, probs: np.ndarray) -> float:
    """Probability-ranked binary AUC (NOT the reference's hard-pred quirk)."""
    return binary_auc_from_scores(targets, probs[:, 1])


def multiclass_auc_ovr(targets: np.ndarray, probs: np.ndarray) -> float:
    """Macro one-vs-rest AUC over probability columns."""
    aucs = []
    for c in range(probs.shape[1]):
        t = (targets == c).astype(int)
        if t.min() == t.max():
            continue  # class absent — skip (sklearn raises; we degrade gracefully)
        aucs.append(binary_auc_from_scores(t, probs[:, c]))
    return float(np.mean(aucs)) if aucs else float("nan")


def metrics(outputs: np.ndarray, targets: np.ndarray, average: str):
    """Reference `metrics` (utils.py:37-47): (precision, recall, f1, auc).

    `outputs` are probabilities [N, C]; `average` is 'binary' or 'macro'.
    """
    outputs = np.asarray(outputs)
    targets = np.asarray(targets)
    preds = outputs.argmax(1)
    if average == "binary":
        precision, recall, f1 = _prf_binary(targets, preds)
        aucroc = binary_auc_from_scores(targets, preds.astype(float))
    else:
        classes = np.unique(np.concatenate([targets, preds]))
        precision, recall, f1 = _prf_macro(targets, preds, classes)
        aucroc = multiclass_auc_ovr(targets, outputs)
    return precision, recall, f1, aucroc
