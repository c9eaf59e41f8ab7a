"""Slow, literal numpy oracles for the validation statistics.

Implements the reference semantics (SURVEY.md §2 #18: per-class-pair weighted
confusion counts, statistics.py:111-138 of the reference) with straightforward
python loops, used to verify the vectorized on-device implementation.
"""

import numpy as np


def oracle_pairwise(xa, xb=None, metric=0):
    if xb is None:
        sims = xa @ xa.T
        sims = sims[np.triu_indices(sims.shape[0], k=1)]
    else:
        sims = xa @ xb.T
    sims = np.clip(sims, -1, 1)
    if metric == 0:
        return 2 * (1 - sims)
    return np.arccos(sims)


def oracle_confusion(embeddings, labels, thresholds, metric=0):
    """Literal per-class-pair loop: returns (tp, fn, fp, tn) arrays."""
    thresholds = np.atleast_1d(thresholds)
    classes = np.unique(labels)
    embs = [embeddings[labels == c] for c in classes]
    C = len(embs)
    n_pos_class_pairs = C
    n_neg_class_pairs = C * (C - 1) / 2

    tp = np.zeros(thresholds.size)
    tn = np.zeros(thresholds.size)
    fp = np.zeros(thresholds.size)
    fn = np.zeros(thresholds.size)

    for i in range(C):
        for k in range(i + 1):
            if i == k:
                sims = oracle_pairwise(embs[i], metric=metric)
                weight = sims.size * n_pos_class_pairs
            else:
                sims = oracle_pairwise(embs[i], embs[k], metric=metric)
                weight = sims.size * n_neg_class_pairs
            if sims.size < 1:
                continue
            for n, t in enumerate(thresholds):
                count = np.count_nonzero(sims < t)
                if i == k:
                    tp[n] += count / weight
                    fn[n] += (sims.size - count) / weight
                else:
                    fp[n] += count / weight
                    tn[n] += (sims.size - count) / weight

    return tp, fn, fp, tn
