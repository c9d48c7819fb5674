"""Evaluation metrics, numerically matching the reference definitions.

accuracy_sbm replicates the class-balanced accuracy of
/root/reference/LPE/train/metrics.py:34-51 (and
experiments/run_transformer_gengcn_SBM_cv.py:126-143): per-class recall from
the confusion matrix, averaged over classes that appear in the targets.
roc_auc / average_precision are numpy reimplementations of the OGB
Evaluator's metrics (used by run_transformer_gengcn_molhiv.py:215-222) —
rank-based AUC with midrank ties and the precision-recall step integral.
"""

from __future__ import annotations

import numpy as np


def mae(pred, target) -> float:
    """L1 metric (LPE/train/metrics.py:11-14)."""
    return float(np.abs(np.asarray(pred) - np.asarray(target)).mean())


def accuracy_graph(logits, labels) -> float:
    """Plain argmax accuracy (accuracy_TU, LPE/train/metrics.py:16-19)."""
    pred = np.argmax(np.asarray(logits), axis=-1)
    return float((pred == np.asarray(labels)).mean())


def accuracy_sbm(logits, labels, mask=None) -> float:
    """Class-balanced node accuracy.

    Args:
      logits: [..., C]; labels: [...] ints (padded entries < 0 ignored);
      mask: optional bool validity mask matching labels.
    """
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    pred = np.argmax(logits, axis=-1).ravel()
    lab = labels.ravel()
    valid = lab >= 0
    if mask is not None:
        valid &= np.asarray(mask).ravel()
    pred, lab = pred[valid], lab[valid]
    # reference: sum of per-class recalls / number of classes appearing in
    # the confusion matrix, i.e. present in targets OR predictions
    # (confusion_matrix(S, C).shape[0], LPE/train/metrics.py:34-51) —
    # a class predicted but never true contributes 0 to the numerator
    # while still widening the denominator
    present = np.union1d(np.unique(lab), np.unique(pred))
    recalls = 0.0
    for c in present:
        in_c = lab == c
        if in_c.sum() > 0:
            recalls += (pred[in_c] == c).mean()
    return float(recalls / max(len(present), 1))


def binary_f1(pred, target) -> float:
    pred = np.asarray(pred).astype(bool).ravel()
    target = np.asarray(target).astype(bool).ravel()
    tp = (pred & target).sum()
    fp = (pred & ~target).sum()
    fn = (~pred & target).sum()
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def roc_auc(scores, labels) -> float:
    """Binary ROC-AUC via the rank statistic (midranks for ties)."""
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel()
    keep = ~np.isnan(scores) & (labels >= 0)
    scores, labels = scores[keep], labels[keep]
    pos = labels == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    sorted_scores = scores[order]
    i = 0
    r = np.arange(1, len(scores) + 1, dtype=np.float64)
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = r[i:j + 1].mean()
        i = j + 1
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def average_precision(scores, labels) -> float:
    """AP = sum_k (R_k - R_{k-1}) P_k over descending-score thresholds.

    Ties are collapsed per unique threshold (sklearn/OGB semantics) so the
    result is independent of input order."""
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel()
    keep = ~np.isnan(scores) & (labels >= 0)
    scores, labels = scores[keep], labels[keep]
    n_pos = int((labels == 1).sum())
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    s = scores[order]
    lab = (labels[order] == 1).astype(np.float64)
    tp = np.cumsum(lab)
    counts = np.arange(1, len(lab) + 1, dtype=np.float64)
    # indices of the LAST element of each tied-score group = thresholds
    boundary = np.flatnonzero(np.r_[s[1:] != s[:-1], True])
    tp_t = tp[boundary]
    prec_t = tp_t / counts[boundary]
    rec_t = tp_t / n_pos
    d_rec = np.diff(np.r_[0.0, rec_t])
    return float((prec_t * d_rec).sum())


def multitask_mean(metric_fn, scores, labels):
    """OGB multi-task style: metric per column, mean over columns with both
    classes present (labels < 0 or NaN = unlabeled)."""
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    vals = []
    for t in range(scores.shape[-1]):
        lab = labels[..., t]
        valid = ~np.isnan(lab.astype(np.float64))
        lab_v = lab[valid]
        if (lab_v == 1).sum() == 0 or (lab_v == 0).sum() == 0:
            continue
        vals.append(metric_fn(scores[..., t][valid], lab_v))
    return float(np.mean(vals)) if vals else float("nan")
