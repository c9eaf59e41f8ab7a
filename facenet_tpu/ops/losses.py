"""Training losses, TPU-native.

Capability parity with the reference losses (SURVEY.md §2 #15):
  * sparse softmax cross-entropy (ref facenet.py:39-42)
  * center loss with an EMA-updated, non-trainable centers table
    (ref facenet.py:204-217 — the tf.scatter_sub update becomes a functional
    segment-mean scatter that returns new centers, fitting JAX's pure
    train step; under pjit the centers table is replicated and the update is
    an all-reduced dense scatter)
  * weighted binary cross-entropy over upper-triangle pair logits
    (ref apps/train_classifier.py:60-84)
  * triplet loss with ONLINE SEMI-HARD MINING — required capability from
    BASELINE.json configs[4]; not present in the reference tree (SURVEY.md §0).
    The mining is a fully on-device masked argmin over the batch distance
    matrix: no host round-trips, fixed shapes, vectorized for the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def softmax_cross_entropy_with_logits(logits, labels):
    """Mean sparse softmax CE (ref facenet.py:39-42)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32),
                               axis=1)[:, 0]
    return jnp.mean(nll)


def center_loss(features, labels, centers, alfa):
    """Center loss (ref facenet.py:204-217), functional form.

    The reference updates a TF variable in place with scatter_sub:
        diff = (1 - alfa) * (centers[label] - features)
        centers[label] -= diff;  loss = mean((features - old_centers[label])^2)

    Here the update is returned: (loss, new_centers). When several images of
    one class are in the batch, scatter-sub applies each row's update
    sequentially; the equivalent dense form subtracts the per-class SUM of
    diffs, which matches tf.scatter_sub semantics for accumulated updates.

    :param features: [B, D] float embeddings (pre-normalization bottleneck)
    :param labels: [B] int class ids
    :param centers: [C, D] float32 centers table (non-trainable state)
    :param alfa: center update rate (ref config center_alfa = 0.95)
    :return: (loss scalar, updated centers [C, D])
    """
    features = features.astype(jnp.float32)
    labels = labels.astype(jnp.int32)

    centers_batch = centers[labels]
    diff = (1 - alfa) * (centers_batch - features)

    new_centers = centers.at[labels].add(-diff)

    loss = jnp.mean(jnp.square(features - centers_batch))
    return loss, new_centers


def binary_cross_entropy_pair_loss(logits, nrof_classes_per_batch,
                                   nrof_examples_per_class):
    """Weighted BCE over upper-triangle pair logits (ref train_classifier.py:60-84).

    The batch is P classes x K examples in class-major order; pairs (i, k)
    with i//K == k//K are positive. pos_weight rebalances the 1:(PK-K)/(K-1)
    class skew exactly as tf.nn.weighted_cross_entropy_with_logits.
    """
    batch_size = nrof_classes_per_batch * nrof_examples_per_class
    iu, ku = np.triu_indices(batch_size, k=1)
    labels = (iu // nrof_examples_per_class ==
              ku // nrof_examples_per_class).astype(np.float32)
    if labels.sum() == 0:
        # K=1 yields zero positive pairs -> pos_weight inf -> silent
        # all-NaN loss; fail loudly with the actionable knob instead
        raise ValueError(
            'no positive pairs in the batch: nrof_examples_per_class='
            f'{nrof_examples_per_class} must be >= 2')
    pos_weight = len(labels) / labels.sum() - 1

    logits = logits[iu, ku].astype(jnp.float32)
    labels = jnp.asarray(labels)

    # weighted_cross_entropy_with_logits:
    #   (1 - z) * x + (1 + (q - 1) * z) * log(1 + exp(-x))  [stable form]
    log_weight = 1 + (pos_weight - 1) * labels
    loss = ((1 - labels) * logits +
            log_weight * (jnp.logaddexp(0.0, -jnp.abs(logits)) +
                          jnp.maximum(-logits, 0.0)))
    return jnp.mean(loss)


def _pairwise_squared_distances(embeddings):
    """All-pairs squared Euclidean distances of a batch, f32, on device."""
    e = embeddings.astype(jnp.float32)
    sq = jnp.sum(jnp.square(e), axis=1)
    d = sq[:, None] - 2.0 * jnp.dot(e, e.T, preferred_element_type=jnp.float32) \
        + sq[None, :]
    return jnp.maximum(d, 0.0)


def triplet_semihard_loss(embeddings, labels, margin=0.2):
    """FaceNet triplet loss with online semi-hard negative mining.

    For each anchor-positive pair (a, p), the semi-hard negative is the
    negative n minimizing d(a, n) subject to d(a, n) > d(a, p); if none
    exists, the hardest (largest-distance... i.e. the largest d(a, n)) is
    used, per the canonical semi-hard formulation. Entirely on device:
    masked min/max over the [B, B, B]-free formulation using [B, B] matrices.

    :param embeddings: [B, D] L2-normalized embeddings
    :param labels: [B] int class ids
    :param margin: alpha (FaceNet paper: 0.2)
    """
    labels = labels.astype(jnp.int32)
    d = _pairwise_squared_distances(embeddings)
    b = d.shape[0]

    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(b, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    big = jnp.asarray(1e9, d.dtype)

    # for each (anchor a, positive p): find semi-hard negative distance
    # dn[a] candidates: d[a, n] for negatives n. Condition: d[a,n] > d[a,p].
    # Compute per (a, p): min over n of d[a,n] masked by (neg & d[a,n] > d[a,p])
    d_an = d[:, None, :]                      # [a, 1, n]
    d_ap = d[:, :, None]                      # [a, p, 1]
    semi_mask = neg_mask[:, None, :] & (d_an > d_ap)    # [a, p, n]

    semi_min = jnp.min(jnp.where(semi_mask, d_an, big), axis=2)   # [a, p]
    has_semi = jnp.any(semi_mask, axis=2)

    # fallback: hardest negative = max d[a, n] over negatives
    hard_max = jnp.max(jnp.where(neg_mask, d, -big), axis=1)      # [a]
    neg_dist = jnp.where(has_semi, semi_min, hard_max[:, None])   # [a, p]

    losses = jnp.maximum(d + margin - neg_dist, 0.0)              # [a, p]
    losses = jnp.where(pos_mask, losses, 0.0)

    num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    return jnp.sum(losses) / num_pos
