"""Tests for facenet_tpu.utils.debug (reference utils.py:14-71 parity)."""
import numpy as np
import pytest
from PIL import Image

from facenet_tpu.utils.debug import (ConcatenateImages, file2text,
                                     generate_filename, label_array)


def test_file2text():
    assert file2text('/data/lfw/Alice_X/Alice_X_0001.png') == 'Alice_X/Alice_X_0001'


def test_generate_filename_same_and_different_class(tmp_path):
    same = generate_filename(tmp_path, 0.5, '/d/A/x.png', '/d/A/y.png')
    assert same.endswith('A|x & y & 0.500.png')
    diff = generate_filename(tmp_path, 1.25, '/d/A/x.png', '/d/B/y.png')
    assert diff.endswith('A|x & B|y & 1.250.png')


def test_label_array_matches_pdist_convention():
    labels = [0, 0, 1, 2, 1]
    out = label_array(labels)
    # pdist order over pairs (i<k)
    i, k = np.triu_indices(5, k=1)
    expected = (np.asarray(labels)[i] == np.asarray(labels)[k]).astype(np.uint8)
    np.testing.assert_array_equal(out, expected)
    assert out.dtype == np.uint8

    with pytest.raises(ValueError):
        label_array('not-an-array')

    # ndarray input, column-vector style like the reference's transpose path
    np.testing.assert_array_equal(label_array(np.array(labels)), expected)


def test_concatenate_images_renders_and_saves(tmp_path):
    d = tmp_path / 'clsA'
    d.mkdir()
    f1, f2 = d / 'a.png', d / 'b.png'
    Image.fromarray(np.full((20, 20, 3), 50, np.uint8)).save(f1)
    Image.fromarray(np.full((20, 20, 3), 200, np.uint8)).save(f2)

    pair = ConcatenateImages(str(f1), str(f2), 0.75)
    assert pair.img.size == (40, 20)
    out = pair.save(tmp_path)
    assert (tmp_path / 'clsA|a & b & 0.750.png').exists()
    assert out.endswith('0.750.png')
