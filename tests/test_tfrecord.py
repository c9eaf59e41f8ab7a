import numpy as np
import pytest

from facenet_tpu.utils import tfrecord


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert tfrecord.crc32c(b'\x00' * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b'\xff' * 32) == 0x62A8AB43


def test_tfrecord_roundtrip(tmp_path):
    path = tmp_path / 'data.tfrecord'
    records = [b'hello', b'world', b'x' * 1000]
    with tfrecord.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)

    got = list(tfrecord.read_tfrecord(path))
    assert got == records


def test_tfrecord_detects_corruption(tmp_path):
    path = tmp_path / 'data.tfrecord'
    with tfrecord.TFRecordWriter(path) as w:
        w.write(b'payload-data')

    raw = bytearray(path.read_bytes())
    raw[14] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))

    with pytest.raises(IOError):
        list(tfrecord.read_tfrecord(path))


def test_example_encode_decode():
    ex = tfrecord.make_example({
        'embedding': tfrecord.float_feature([1.5, -2.25, 3.0]),
        'label': tfrecord.int64_feature(42),
        'file': tfrecord.bytes_feature('a/b.png'),
    })
    parsed = tfrecord.parse_example(ex)
    np.testing.assert_allclose(parsed['embedding'], [1.5, -2.25, 3.0])
    assert parsed['label'] == [42]
    assert parsed['file'] == [b'a/b.png']


def test_example_readable_by_tensorflow():
    tf = pytest.importorskip('tensorflow')
    ex_bytes = tfrecord.make_example({
        'embedding': tfrecord.float_feature([0.25, 0.5]),
        'label': tfrecord.int64_feature(7),
        'file': tfrecord.bytes_feature('x.png'),
    })
    ex = tf.train.Example.FromString(ex_bytes)
    assert list(ex.features.feature['embedding'].float_list.value) == [0.25, 0.5]
    assert list(ex.features.feature['label'].int64_list.value) == [7]
    assert ex.features.feature['file'].bytes_list.value[0] == b'x.png'


def test_embeddings_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    embs = rng.randn(10, 8).astype(np.float32)
    labels = rng.randint(0, 3, 10)
    files = [f'cls/{i}.png' for i in range(10)]

    path = tmp_path / 'emb.tfrecord'
    tfrecord.write_embeddings_tfrecord(path, embs, labels, files)

    loaded = tfrecord.TFRecord(path)
    np.testing.assert_allclose(loaded.embeddings, embs, rtol=1e-6)
    np.testing.assert_array_equal(loaded.labels, labels)
    assert loaded.files == files
