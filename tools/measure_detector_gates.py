"""Measure the six (family x detector) quality-gate levels for the
CURRENT bundled detector weights, with exactly the held-out geometry of
tests/test_detector_quality.py (same seeds, scene counts, IoU).

Run after retraining bundles (tools/train_synthetic_detectors.py) to
re-pin the gate floors honestly instead of guessing:

    python tools/measure_detector_gates.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from facenet_tpu.detectors import evaluation
from facenet_tpu.utils.synthetic import render_scene

SHAPE = (256, 256)


def held_out(n, seed, family):
    rng = np.random.RandomState(seed)
    return [render_scene(rng, shape=SHAPE, n_faces=rng.randint(1, 4),
                         min_face=32, max_face=160, family=family)
            for _ in range(n)]


def main():
    from facenet_tpu.detectors.face_detector import FaceDetector

    combos = [('base', 555), ('shifted', 777), ('stress', 555)]
    for name in ('mtcnn', 'frcnnv3'):
        fd = FaceDetector(detector=name, image_shape=SHAPE)
        for family, seed in combos:
            scenes = held_out(32, seed=seed, family=family)
            m = evaluation.evaluate_detector(
                fd, [s[0] for s in scenes], [s[1] for s in scenes],
                iou_threshold=0.5, batch_size=16)
            print(f'{name}/{family}: ' +
                  ' '.join(f'{k}={float(v):.4f}' for k, v in m.items()),
                  flush=True)


if __name__ == '__main__':
    main()
