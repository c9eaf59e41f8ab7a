"""Validation statistics: pairwise-distance accuracy / ROC / EER, TPU-native.

Capability parity with the reference statistics stack
(/root/reference/facenet/statistics.py): `pairwise_similarities` (squared
Euclidean ``2(1-cos)`` for metric 0, ``arccos`` for metric 1, with the
normalized-embeddings assertion, ref :22-57), per-class-pair *weighted*
confusion counts over a threshold grid (ref ConfidenceMatrix :111-138),
accuracy/precision/TPR/TNR properties (ref :140-175), AUC + EER via
brentq/interp (ref :215-224), and the 10-fold KFold protocol that picks
thresholds on train folds and scores on the test fold (ref :277-313).

TPU-first redesign of the hot loop: the reference iterates python-level class
pairs and rebuilds numpy gram matrices per pair (its full validation pass
takes 694-1540 s, see BASELINE.md). Here the math is reformulated so a single
pass over the (tiled) N x N distance matrix suffices:

  tp(t) = (1/C)      * sum over positive image pairs  w_nm * [d_nm < t]
  fp(t) = (1/P_neg)  * sum over negative image pairs  w_nm * [d_nm < t]

with per-pair weights w_nm = 1/#pairs-in-that-class-block — identical numbers
to the reference's per-block ``count/weight`` accumulation, but expressible as
two weighted histograms over threshold bins, computed with one E @ E^T matmul
(MXU) + searchsorted binning + segment-sums (VPU) per row tile, entirely
on device under jit.
"""

from __future__ import annotations

import datetime
import time
from functools import partial
from pathlib import Path

import numpy as np

from facenet_tpu import h5utils
from facenet_tpu.logging import logger

_ROW_CHUNK = 512


def _cos_to_distance(cos, metric):
    """Map clipped cosine similarities to the configured distance."""
    cos = np.clip(cos, -1.0, 1.0)
    if metric == 0:
        return 2.0 * (1.0 - cos)      # squared Euclidean of unit vectors
    if metric == 1:
        return np.arccos(cos)         # angular distance
    raise ValueError(f'Undefined similarity metric {metric}')


def _check_normalized(values, atol):
    """Values that should be cosines of unit vectors must stay in [-1, 1]."""
    if values.size and (values.min() < -(1 + atol) or
                        values.max() > 1 + atol):
        raise ValueError(
            '\nembeddings must be normalized to 1, range {} {}'.format(
                values.min(), values.max()))


def pairwise_similarities(xa, xb=None, metric=0, atol=1.e-5):
    """Distances between normalized embeddings (semantics of ref
    statistics.py:22-57).

    :param xa: [Na, D] L2-normalized embeddings
    :param xb: optional [Nb, D]; omitted -> condensed upper triangle of xa
    :param metric: 0 = squared Euclidean 2(1-cos); 1 = arccos angle
    """
    xa = np.asarray(xa)
    if xb is None:
        gram = xa @ xa.T
        cos = gram[np.triu_indices(len(xa), k=1)]
    else:
        cos = xa @ np.asarray(xb).T
    _check_normalized(cos, atol)
    return _cos_to_distance(cos, metric) if cos.size else cos


def mean(x):
    return np.mean(np.asarray(x))


def std(x):
    return np.std(np.asarray(x))


def split_embeddings(embeddings, labels):
    """Per-class list of embedding arrays, ordered by sorted unique label."""
    labels = np.asarray(labels)
    return [embeddings[labels == c] for c in np.unique(labels)]


class SimilarityCalculator:
    """Embeddings + labels bundle for confusion computations.

    The device path (`ConfidenceMatrix` -> `confusion_counts`) reads `raw`,
    `labels` and `metric` directly. `evaluate(i, k)` is the per-class-pair
    probe (same contract as the reference's CPU loop, ref statistics.py:
    82-108): distances of block (i, k) plus the weight that makes each
    class pair — not each image pair — count equally.
    """

    def __init__(self, embeddings, labels, metric=0):
        self.metric = metric
        self.labels = np.asarray(labels)
        self.raw = np.ascontiguousarray(embeddings, dtype=np.float32)
        self.embeddings = split_embeddings(self.raw, self.labels)

    @property
    def nrof_classes(self):
        return len(self.embeddings)

    def nrof_images(self, i):
        return len(self.embeddings[i])

    def evaluate(self, i, k):
        """Distances and normalization weight for class block (i, k)."""
        c = self.nrof_classes
        if i == k:
            dists = pairwise_similarities(self.embeddings[i],
                                          metric=self.metric)
            nrof_class_pairs = c              # positive blocks: one per class
        else:
            dists = pairwise_similarities(self.embeddings[i],
                                          self.embeddings[k],
                                          metric=self.metric)
            nrof_class_pairs = c * (c - 1) / 2  # unordered negative blocks
        return dists, dists.size * nrof_class_pairs


# ---------------------------------------------------------------------------
# On-device weighted pair histograms
# ---------------------------------------------------------------------------

def _make_pair_histograms():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=('num_classes', 'metric', 'num_bins'))
    def pair_histograms(embeddings, labels, thresholds,
                        num_classes, metric, num_bins):
        """Weighted histograms of pair distances over threshold bins.

        Returns (hist_pos, hist_neg), each [num_bins + 1], where bin p holds
        the total per-pair weight of pairs whose distance d satisfies
        p == #{thresholds <= d}; cumsum(hist)[n] is then the weighted count of
        pairs with d < thresholds[n].
        """
        n = embeddings.shape[0]
        emb = embeddings.astype(jnp.float32)
        labels = labels.astype(jnp.int32)

        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), labels,
                                     num_segments=num_classes)
        inv_n = jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1), 0.0)
        pos_pairs = counts * (counts - 1) / 2
        inv_pos = jnp.where(pos_pairs > 0, 1.0 / jnp.maximum(pos_pairs, 1), 0.0)

        chunk = min(_ROW_CHUNK, n)
        nchunks = -(-n // chunk)
        pad = nchunks * chunk - n

        emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
        labels_p = jnp.pad(labels, (0, pad))

        col_idx = jnp.arange(n)

        def body(c):
            rows = jax.lax.dynamic_slice(
                emb_p, (c * chunk, 0), (chunk, emb.shape[1]))
            row_labels = jax.lax.dynamic_slice(labels_p, (c * chunk,), (chunk,))
            row_idx = c * chunk + jnp.arange(chunk)

            # full-f32 matmul precision: the reference computes distances in
            # f32 numpy; XLA's DEFAULT dot precision on TPU truncates to
            # bf16 passes (~4e-3 error) which would corrupt threshold counts
            sims = jnp.clip(
                jnp.dot(rows, emb.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                -1.0, 1.0)
            if metric == 0:
                d = 2.0 * (1.0 - sims)
            else:
                d = jnp.arccos(sims)

            # strict upper triangle in global image indices: each unordered
            # image pair is counted exactly once
            valid = row_idx[:, None] < col_idx[None, :]
            pos = row_labels[:, None] == labels[None, :]

            w_pos = inv_pos[row_labels][:, None]
            w_neg = inv_n[row_labels][:, None] * inv_n[labels][None, :]

            p = jnp.searchsorted(thresholds, d, side='right').astype(jnp.int32)
            ids = p.reshape(-1)

            wp = jnp.where(valid & pos, w_pos, 0.0).reshape(-1)
            wn = jnp.where(valid & ~pos, w_neg, 0.0).reshape(-1)

            hist_pos = jax.ops.segment_sum(wp, ids,
                                           num_segments=num_bins + 1)
            hist_neg = jax.ops.segment_sum(wn, ids,
                                           num_segments=num_bins + 1)
            return jnp.stack([hist_pos, hist_neg])

        # per-chunk histograms come back STACKED and are summed on the host
        # in float64: accumulating millions of tiny per-pair weights into a
        # single f32 loses late increments (measured 2.3% drift on negative-
        # pair counts at N=12k), while per-chunk partial sums stay small
        # enough for f32 and the cross-chunk sum is exact in f64.
        return jax.lax.map(body, jnp.arange(nchunks))

    return pair_histograms


_pair_histograms = _make_pair_histograms()


def _use_pallas(nrof_thresholds, nrof_embeddings=0):
    """Route to the fused Pallas kernel on TPU (env FACENET_TPU_PALLAS=0/1
    forces either path; the kernel holds at most 127 thresholds).

    Auto mode skips tiny problems (a per-shape kernel compile buys nothing
    there). At scale the kernel is both much faster AND more accurate than
    the XLA fallback — measured at the reference eval size (26,489 x 512,
    98 thresholds, v5e): 1.3 s/call vs 51 s (40x) vs reference CPU
    694-1540 s (SURVEY.md §6), with counts matching an exact f64 oracle."""
    import os
    if nrof_thresholds > 127:
        return False
    flag = os.environ.get('FACENET_TPU_PALLAS', 'auto').lower()
    if flag in ('0', 'false', 'off'):
        return False
    if flag in ('1', 'true', 'on'):
        return True
    import jax
    return jax.default_backend() == 'tpu' and nrof_embeddings >= 1024


_EVAL_MESH = None


def set_eval_mesh(mesh):
    """Distribute subsequent confusion_counts calls over a device mesh
    (rows of the pair matrix shard over the 'data' axis; SURVEY.md §2.8
    "Sharded eval"). Pass None to return to single-device evaluation."""
    global _EVAL_MESH
    _EVAL_MESH = mesh


def confusion_counts(embeddings, labels, thresholds, metric=0, atol=1e-5,
                     mesh=None):
    """Weighted (tp, fn, fp, tn) per threshold — reference ConfidenceMatrix math.

    Computed on device in one tiled pass; numerically equivalent to the
    reference's per-class-pair loop (statistics.py:124-138). With a mesh
    (argument or set_eval_mesh), rows shard over the 'data' axis and
    devices psum their partial histograms.
    """
    embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
    labels = np.asarray(labels)

    # remap labels to a dense range. Multi-process (each process holds only
    # its row stripe): the dense mapping must agree across processes, so
    # the label VALUES are allgathered (tiny int arrays over DCN) and the
    # unique set is computed globally before densifying the local stripe.
    import jax as _jax
    if _jax.process_count() > 1:
        from facenet_tpu.parallel.mesh import allgather_host_varlen
        uniq = np.unique(allgather_host_varlen(labels))
        dense = np.searchsorted(uniq, labels)
    else:
        uniq, dense = np.unique(labels, return_inverse=True)
    num_classes = len(uniq)

    # normalization sanity check, as in pairwise_similarities (ref :38-42)
    norms = np.linalg.norm(embeddings, axis=1)
    if norms.size and (norms.min() < 1 - atol or norms.max() > 1 + atol):
        raise ValueError(
            '\nembeddings must be normalized to 1, range {} {}'.format(
                norms.min(), norms.max()))

    thresholds = np.atleast_1d(np.asarray(thresholds, dtype=np.float32))
    order = np.argsort(thresholds, kind='stable')
    sorted_t = thresholds[order]

    mesh = mesh if mesh is not None else _EVAL_MESH
    from facenet_tpu.parallel.mesh import DATA_AXIS
    use_mesh = mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1

    if use_mesh:
        from facenet_tpu.parallel.sharded_eval import sharded_pair_histograms
        hist_pos, hist_neg = sharded_pair_histograms(
            embeddings, dense.astype(np.int32), sorted_t,
            num_classes=int(num_classes), metric=int(metric), mesh=mesh)
        below_pos = np.cumsum(hist_pos)[:-1]
        below_neg = np.cumsum(hist_neg)[:-1]
        total_pos = hist_pos.sum()
        total_neg = hist_neg.sum()
    elif _use_pallas(sorted_t.size, len(embeddings)):
        # fused Pallas kernel: distances never touch HBM
        from facenet_tpu.ops.pallas_stats import pair_below_counts
        below_pos, below_neg, total_pos, total_neg = pair_below_counts(
            embeddings, dense, sorted_t, metric=int(metric),
            num_classes=int(num_classes))
    else:
        stacked = np.asarray(_pair_histograms(
            jnp_array(embeddings), jnp_array(dense.astype(np.int32)),
            jnp_array(sorted_t), num_classes=int(num_classes),
            metric=int(metric), num_bins=int(sorted_t.size)))

        hist_pos = stacked[:, 0, :].sum(axis=0, dtype=np.float64)
        hist_neg = stacked[:, 1, :].sum(axis=0, dtype=np.float64)

        # cumulative weighted counts below each threshold (in sorted order)
        below_pos = np.cumsum(hist_pos)[:-1]
        below_neg = np.cumsum(hist_neg)[:-1]

        total_pos = hist_pos.sum()
        total_neg = hist_neg.sum()

    nrof_neg_class_pairs = num_classes * (num_classes - 1) / 2

    tp_s = below_pos / num_classes
    fn_s = (total_pos - below_pos) / num_classes
    if nrof_neg_class_pairs > 0:
        fp_s = below_neg / nrof_neg_class_pairs
        tn_s = (total_neg - below_neg) / nrof_neg_class_pairs
    else:
        fp_s = np.zeros_like(below_neg)
        tn_s = np.zeros_like(below_neg)

    # undo the sort
    tp = np.empty_like(tp_s); tp[order] = tp_s
    fn = np.empty_like(fn_s); fn[order] = fn_s
    fp = np.empty_like(fp_s); fp[order] = fp_s
    tn = np.empty_like(tn_s); tn[order] = tn_s

    return tp, fn, fp, tn


def jnp_array(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


class ConfidenceMatrix:
    """Confusion matrix (tp, tn, fp, fn) over thresholds (ref statistics.py:111-175).

    Same constructor contract as the reference — takes a SimilarityCalculator
    and a threshold array — but evaluates on device in one pass.
    """

    def __init__(self, calculator, threshold):
        self.threshold = np.array(threshold, ndmin=1)
        self.tp, self.fn, self.fp, self.tn = confusion_counts(
            calculator.raw, calculator.labels, self.threshold,
            metric=calculator.metric)

    def _ratio(self, num, denom):
        """num / denom per threshold; 1.0 where the denominator is empty
        (an undefined rate counts as perfect, matching the reference)."""
        out = np.ones(self.threshold.size)
        defined = denom > 0
        out[defined] = num[defined] / denom[defined]
        return out

    @property
    def accuracy(self):
        return (self.tp + self.tn) / (self.tp + self.fp + self.tn + self.fn)

    @property
    def precision(self):
        return self._ratio(self.tp, self.tp + self.fp)

    @property
    def tp_rates(self):
        return self._ratio(self.tp, self.tp + self.fn)

    @property
    def tn_rates(self):
        return self._ratio(self.tn, self.tn + self.fp)

    @property
    def fp_rates(self):
        return 1 - self.tn_rates

    @property
    def fn_rates(self):
        return 1 - self.tp_rates


def roc_summary(fp_rates, tp_rates):
    """AUC and EER of a ROC curve given as per-threshold rate arrays.

    Failures are logged and reported as -1 (a validation report must never
    crash a training run) — unlike the reference, which swallowed these
    silently (ref statistics.py:215-224).
    """
    import sklearn.metrics
    from scipy import interpolate
    from scipy.optimize import brentq

    try:
        auc = float(sklearn.metrics.auc(fp_rates, tp_rates))
    except Exception as exc:
        logger.warning(f'AUC computation failed: {exc}')
        auc = -1.0

    try:
        roc = interpolate.interp1d(fp_rates, tp_rates)
        eer = float(brentq(lambda x: 1.0 - x - roc(x), 0.0, 1.0))
    except Exception as exc:
        logger.warning(f'EER computation failed: {exc}')
        eer = -1.0

    return auc, eer


class Report:
    """Cross-fold summary for one threshold-selection criterion.

    Collects train-fold matrices (full threshold sweep, used for the ROC
    summary) and test-fold matrices (single chosen threshold, used for the
    mean +- std rows). Text layout matches the reference run artifact
    (models/*/logs/report.txt) so existing report parsers keep working.
    """

    # (report label, ConfidenceMatrix attribute) for the mean+-std rows
    FIELDS = (
        ('Accuracy: ', 'accuracy'),
        ('Precision:', 'precision'),
        ('Sensitivity (TPR, 1-a type 1 error):', 'tp_rates'),
        ('Specificity (TNR, 1-b type 2 error):', 'tn_rates'),
        ('Threshold:', 'threshold'),
    )

    def __init__(self, criterion=None):
        self.criterion = criterion
        self.conf_matrix_train = []
        self.conf_matrix_test = []

    def append_fold(self, name, conf_matrix):
        folds = (self.conf_matrix_train if name == 'train'
                 else self.conf_matrix_test)
        folds.append(conf_matrix)

    @property
    def dict(self):
        summary = {}

        tpr = np.mean([m.tp_rates for m in self.conf_matrix_train], axis=0)
        fpr = 1 - np.mean([m.tn_rates for m in self.conf_matrix_train],
                          axis=0)
        summary['auc'], summary['eer'] = roc_summary(fpr, tpr)

        for _, attr in self.FIELDS:
            values = [getattr(m, attr) for m in self.conf_matrix_test]
            summary[attr] = float(np.mean(values))
            summary[attr + '_std'] = float(np.std(values))

        return summary

    def __repr__(self):
        s = self.dict
        lines = [str(self.criterion),
                 'Area under curve (AUC): {:1.5f}'.format(s['auc']),
                 'Equal error rate (EER): {:1.5f}'.format(s['eer']),
                 '']
        lines += ['{} {:2.5f}+-{:2.5f}'.format(label, s[attr],
                                               s[attr + '_std'])
                  for label, attr in self.FIELDS]
        return '\n'.join(lines) + '\n\n'


class FaceToFaceValidation:
    """K-fold face-to-face validation (ref statistics.py:237-331).

    Protocol parity: KFold(nrof_folds, shuffle=True, random_state=0); on each
    fold's train split pick (a) the max-accuracy threshold and (b) the
    threshold whose FAR equals `far_target` (slinear interp); score both on
    the test split; report across folds.
    """

    # threshold grid upper bound per metric: sq-Euclidean of unit vectors
    # maxes at 4, angles at pi (ref statistics.py:255-262)
    THRESHOLD_RANGE = {0: 4.0, 1: np.pi}
    NROF_THRESHOLDS = 100

    def __init__(self, embeddings, labels, config):
        started = time.monotonic()
        self.embeddings = np.asarray(embeddings)
        self.labels = np.asarray(labels)
        assert len(self.embeddings) == len(self.labels)
        self.config = config

        self.metric = int(config.metric or 0)
        if self.metric not in self.THRESHOLD_RANGE:
            raise ValueError(f'Undefined similarity metric {config.metric}')
        self.thresholds = np.linspace(0, self.THRESHOLD_RANGE[self.metric],
                                      self.NROF_THRESHOLDS)

        far_target = float(config.far_target or 1e-3)
        self.reports = (Report(criterion='MaximumAccuracy'),
                        Report(criterion=f'FalseAlarmRate(FAR = {far_target})'))
        self._run_folds(int(config.nrof_folds or 10), far_target)

        self.elapsed_time = time.monotonic() - started
        logger.info(str(self))

    def _matrix(self, subset, thresholds):
        calc = SimilarityCalculator(self.embeddings[subset],
                                    self.labels[subset], metric=self.metric)
        return ConfidenceMatrix(calc, thresholds)

    def _far_threshold(self, matrix, far_target):
        """Threshold whose train-fold FAR hits far_target, 0 if unreachable.

        The reference interpolates with interp1d(..., kind='slinear')
        (ref :301); modern scipy rejects the duplicate x values that FAR
        plateaus produce, so np.interp over the non-decreasing fp_rate
        curve does the same linear interpolation at the crossing.
        """
        if np.max(matrix.fp_rates) < far_target:
            return 0.0
        return float(np.interp(far_target, matrix.fp_rates, self.thresholds))

    def _run_folds(self, nrof_folds, far_target):
        """The reference protocol (ref statistics.py:277-313): per fold,
        sweep all thresholds on the train split, pick one per criterion,
        then score exactly that threshold on the held-out split."""
        from sklearn.model_selection import KFold

        folds = KFold(n_splits=nrof_folds, shuffle=True, random_state=0)
        for train_set, test_set in folds.split(np.arange(len(self.labels))):
            sweep = self._matrix(train_set, self.thresholds)

            chosen = (self.thresholds[np.argmax(sweep.accuracy)],
                      self._far_threshold(sweep, far_target))
            for report, threshold in zip(self.reports, chosen):
                report.append_fold('train', sweep)
                report.append_fold('test', self._matrix(test_set, threshold))

    @property
    def dict(self):
        return {r.criterion: r.dict for r in self.reports}

    def __repr__(self):
        body = ''.join(str(r) for r in self.reports)
        return (f'{type(self).__name__}\nmetric: {self.metric}\n\n'
                f'{body}elapsed_time: {self.elapsed_time}\n')

    def write_report(self, file):
        from facenet_tpu import ioutils
        stamp = f'{type(self).__name__} {datetime.datetime.now()}'
        body = ''.join(str(r) for r in self.reports)
        ioutils.write_text_log(
            file, f'{stamp}\nmetric: {self.metric}\n\n{body}')

    def write_h5file(self, h5file, tag=None):
        h5utils.write_dict(h5file, self.dict, group=tag)
