"""Bundled detector weights: npz (de)serialization + default-weight lookup.

The reference gets working detection out of the box only because it
delegates to the *pretrained* PyPI `mtcnn` package (reference
detectors/face_detector.py:63-66); its own frcnnv3 frozen graph ships
without weights (.MISSING_LARGE_BLOBS). This framework instead commits
small in-repo weight bundles trained on the synthetic face dataset
(facenet_tpu/utils/synthetic.py, tools/train_synthetic_detectors.py), so
`FaceDetector()` detects faces out of the box and the quality gate in
tests/test_detector_quality.py keeps the bundles honest. Real-data
weights are produced the same way via apps/train_detector.py.

Format: flat npz — nested param-dict keys joined with '/', values raw
arrays. No pickle, so the files are safe to load from a checkout.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
from pathlib import Path

PRETRAINED_DIR = Path(__file__).parent / 'weights'

# detector name -> bundled file (trained on the synthetic dataset)
BUNDLED = {
    'mtcnn': 'mtcnn_synthetic.npz',
    'pypimtcnn': 'mtcnn_synthetic.npz',
    'frcnnv3': 'frcnn_synthetic.npz',
}


def save_params(path, params):
    """Write a nested param dict to a flat npz ('/'-joined keys)."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            key = f'{prefix}/{k}' if prefix else str(k)
            if isinstance(v, Mapping):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, '')
    path = Path(str(path)).expanduser()
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_params(path):
    """Read a flat npz back into a nested param dict."""
    out = {}
    with np.load(Path(str(path)).expanduser(), allow_pickle=False) as z:
        for key in z.files:
            node = out
            parts = key.split('/')
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def bundled_path(detector):
    """Path of the committed weight bundle for `detector` (or None)."""
    name = BUNDLED.get(str(detector))
    if name is None:
        return None
    path = PRETRAINED_DIR / name
    return path if path.exists() else None


def _cast(tree, dtype):
    if isinstance(tree, Mapping):
        return {k: _cast(v, dtype) for k, v in tree.items()}
    return np.asarray(tree, dtype)


def load_bundled(detector, dtype=np.float32):
    """Load the committed bundle for `detector`, or None if not shipped.

    Bundles are stored float16 for repo size; cast back to f32 for apply
    (models keep f32 param_dtype — activations are bf16 regardless).
    """
    path = bundled_path(detector)
    return _cast(load_params(path), dtype) if path is not None else None
