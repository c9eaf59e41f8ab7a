import numpy as np
import pytest
from PIL import Image

from facenet_tpu import dataset
from facenet_tpu.config import Config


@pytest.fixture(scope='module')
def image_tree(tmp_path_factory):
    """Directory-per-class tree with tiny PNG images."""
    root = tmp_path_factory.mktemp('faces')
    rng = np.random.RandomState(0)
    layout = {'alice': 4, 'bob': 3, 'carol': 5}
    for name, count in layout.items():
        d = root / name
        d.mkdir()
        for i in range(count):
            arr = rng.randint(0, 255, (24, 20, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f'{name}_{i:04d}.png')
    return root


def test_database_index(image_tree):
    db = dataset.Database(dataset.DefaultConfig(image_tree))
    assert db.nrof_classes == 3
    assert db.nrof_images == 12
    assert db.min_nrof_images == 3
    assert db.max_nrof_images == 5
    assert len(db.files) == 12
    assert list(np.bincount(db.labels)) == [4, 3, 5]
    # classes sorted by name
    assert [c.name for c in db.classes] == ['alice', 'bob', 'carol']


def test_dbase_alias_and_config_object(image_tree):
    cfg = Config({'path': str(image_tree)})
    db = dataset.DBase(cfg)
    assert db.nrof_classes == 3


def test_database_subsampling(image_tree):
    np.random.seed(0)
    db = dataset.Database(dataset.DefaultConfig(
        image_tree, nrof_classes=2, max_nrof_images=2))
    assert db.nrof_classes == 2
    assert db.max_nrof_images <= 2


def test_database_min_images_filter(image_tree):
    db = dataset.Database(dataset.DefaultConfig(image_tree, min_nrof_images=4))
    assert [c.name for c in db.classes] == ['alice', 'carol']


def test_empty_database_repr(tmp_path):
    # re-indexing an output dir with zero extracted faces must not crash
    # (empty class list -> min/max over empty sequence)
    (tmp_path / 'empty_class').mkdir()
    db = dataset.Database(dataset.DefaultConfig(tmp_path))
    assert db.nrof_classes == 0
    assert db.min_nrof_images == 0
    assert db.max_nrof_images == 0
    assert 'Number of classes 0' in repr(db)


def test_crop_or_pad():
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    out = dataset.crop_or_pad(img, 9, 3)
    assert out.shape == (9, 3, 3)
    out2 = dataset.crop_or_pad(img, 5, 7)
    np.testing.assert_array_equal(out2, img)


def test_image_loader(image_tree):
    loader = dataset.ImageLoader(size=16)
    db = dataset.Database(dataset.DefaultConfig(image_tree))
    img = loader(db.files[0])
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8


def test_batch_loader_one_epoch(image_tree):
    db = dataset.Database(dataset.DefaultConfig(image_tree))
    loader = dataset.ImageLoader(size=16)
    batches = list(db.batches(loader, batch_size=5))
    assert len(batches) == 3  # 12 images -> 5,5,2
    images, labels = batches[0]
    assert images.shape == (5, 16, 16, 3)
    assert labels.shape == (5,)
    total = sum(b[0].shape[0] for b in batches)
    assert total == 12


def test_batch_loader_shuffle_repeat(image_tree):
    db = dataset.Database(dataset.DefaultConfig(image_tree))
    loader = dataset.ImageLoader(size=16)
    it = iter(db.batches(loader, batch_size=4, shuffle=True, repeat=True,
                         seed=0))
    seen = [next(it) for _ in range(6)]  # two epochs worth
    assert all(b[0].shape == (4, 16, 16, 3) for b in seen)


def test_equal_batches_pipeline(image_tree):
    db = dataset.Database(dataset.DefaultConfig(image_tree))
    loader = dataset.ImageLoader(size=16)
    cfg = Config({'nrof_classes_per_batch': 2, 'nrof_examples_per_class': 3})
    gen = dataset.pipeline_with_equal_batches(loader, db.classes, cfg, seed=0)
    images, labels = next(gen)
    assert images.shape == (6, 16, 16, 3)
    assert labels.shape == (6,)
    # exactly 2 classes, 3 examples each
    _, counts = np.unique(labels, return_counts=True)
    assert list(counts) == [3, 3]


def test_equal_batches_embeddings_pipeline():
    embs = [np.random.randn(10, 8).astype(np.float32) for _ in range(4)]
    cfg = Config({'nrof_classes_per_batch': 3, 'nrof_examples_per_class': 2})
    gen = dataset.equal_batches_input_pipeline(embs, cfg, seed=0)
    batch = next(gen)
    assert batch.shape == (6, 8)
    assert batch.dtype == np.float32


def test_h5_validity_filter(image_tree, tmp_path):
    from facenet_tpu import h5utils
    db = dataset.Database(dataset.DefaultConfig(image_tree))
    h5file = tmp_path / 'valid.h5'
    # invalidate one image of alice
    bad = db.classes[0].files[0]
    h5utils.write(h5file, h5utils.filename2key(bad, 'is_valid'), False)

    db2 = dataset.Database(dataset.DefaultConfig(image_tree, h5file=h5file))
    assert db2.nrof_images == 11


def test_image_loader_pil_fallback_bmp(tmp_path):
    """Formats the native decoder doesn't handle (BMP) must load via the
    PIL fallback rather than raising (advisor finding)."""
    from facenet_tpu.config import Config
    from facenet_tpu.dataset import ImageLoader

    arr = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    p = tmp_path / 'img.bmp'
    Image.fromarray(arr).save(p)
    loader = ImageLoader(Config({'size': 16}))
    out = loader(str(p))
    assert out.shape == (16, 16, 3)
    np.testing.assert_array_equal(out, arr)


def test_batch_loader_native_fail_loud_on_unreadable(tmp_path):
    """The native batch path must raise for a genuinely unreadable file
    (matching the PIL path) instead of yielding silent zero images."""
    from facenet_tpu.config import Config
    from facenet_tpu.dataset import BatchLoader, ImageLoader

    good = tmp_path / 'a' / 'good.png'
    good.parent.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(good)
    bad = tmp_path / 'a' / 'bad.png'
    bad.write_bytes(b'not an image at all')

    loader = ImageLoader(Config({'size': 16}))
    bl = BatchLoader([str(good), str(bad)], [0, 0], loader, batch_size=2)
    with pytest.raises(Exception):
        list(iter(bl))


def test_batch_loader_native_recovers_bmp(tmp_path):
    """A BMP in the file list fails native decode but must be recovered
    through the per-row PIL fallback with its correct pixels."""
    from facenet_tpu.config import Config
    from facenet_tpu.dataset import BatchLoader, ImageLoader

    a = np.full((16, 16, 3), 7, np.uint8)
    b = np.full((16, 16, 3), 9, np.uint8)
    pa = tmp_path / 'x.png'
    pb = tmp_path / 'y.bmp'
    Image.fromarray(a).save(pa)
    Image.fromarray(b).save(pb)

    loader = ImageLoader(Config({'size': 16}))
    bl = BatchLoader([str(pa), str(pb)], [0, 1], loader, batch_size=2)
    batches = list(iter(bl))
    assert len(batches) == 1
    images, labels = batches[0]
    np.testing.assert_array_equal(images[0], a)
    np.testing.assert_array_equal(images[1], b)


def test_batch_loader_pil_path_fail_loud(tmp_path, monkeypatch):
    """With the native loader unavailable, a decode error in the PIL
    producer thread must RAISE in the consumer — not end iteration early
    and silently (which would truncate epochs and strand the cursor)."""
    from facenet_tpu import native
    from facenet_tpu.config import Config
    from facenet_tpu.dataset import BatchLoader, ImageLoader

    good = tmp_path / 'good.png'
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(good)
    bad = tmp_path / 'bad.png'
    bad.write_bytes(b'not an image at all')

    monkeypatch.setattr(native, 'available', lambda: False)
    loader = ImageLoader(Config({'size': 16}))
    bl = BatchLoader([str(good), str(bad)], [0, 0], loader, batch_size=2)
    with pytest.raises(Exception):
        list(iter(bl))


def test_pk_pipeline_native_recovers_bmp(tmp_path):
    """The P×K pipeline must honor the native loader's ok flags: a BMP
    (native decode fails, ok=0) must be retried through PIL with its real
    pixels, never trained as a silent zero image."""
    from facenet_tpu.config import Config
    from facenet_tpu.dataset import ImageLoader, PKPipeline

    d = tmp_path / 'cls'
    d.mkdir()
    vals = {}
    for i, (name, v) in enumerate([('a.png', 7), ('b.png', 5), ('c.bmp', 9)]):
        arr = np.full((16, 16, 3), v, np.uint8)
        Image.fromarray(arr).save(d / name)
        vals[v] = True

    db = dataset.Database(dataset.DefaultConfig(tmp_path))
    loader = ImageLoader(Config({'size': 16}))
    cfg = Config({'nrof_classes_per_batch': 1, 'nrof_examples_per_class': 3})
    pipe = PKPipeline(loader, db.classes, cfg, seed=0)
    images, labels = next(pipe)
    assert images.shape == (3, 16, 16, 3)
    got = sorted(int(images[i, 0, 0, 0]) for i in range(3))
    assert got == [5, 7, 9], got  # 9 = the BMP recovered via PIL, not 0


def test_equal_batches_default_p_caps_to_usable():
    """Default P (= all classes) must shrink to the classes that can
    actually contribute k embeddings instead of raising on first draw."""
    rng = np.random.RandomState(0)
    embs = [rng.randn(10, 4).astype(np.float32) for _ in range(3)]
    embs.append(rng.randn(1, 4).astype(np.float32))   # too small for k=2
    cfg = Config({'nrof_examples_per_class': 2})
    gen = dataset.equal_batches_input_pipeline(embs, cfg, seed=0)
    batch = next(gen)
    assert batch.shape == (3 * 2, 4)

    with pytest.raises(ValueError):
        dataset.equal_batches_input_pipeline(
            [np.zeros((1, 4), np.float32)],
            Config({'nrof_examples_per_class': 2}), seed=0)
