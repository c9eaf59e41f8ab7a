"""Dataset indexing and input pipelines.

Capability parity with the reference data layer
(/root/reference/facenet/dataset.py): the directory-per-class
`ImageClass`/`Database` index with h5 validity filtering and class/image
subsampling (ref :104-231), a shuffled/repeated/batched file pipeline
(ref tf_dataset_api :15-43), and the P-classes x K-images equal-batch sampler
for metric learning (ref pipeline_with_equal_batches :46-101, hardcoded
P=20, K=5 at :61-62).

The reference is mid-refactor and its apps use the names `DBase` and
`DefaultConfig` which do not exist (SURVEY.md §2.9); here the coherent union
is implemented: `Database` with aliases ``DBase = Database`` and a working
`DefaultConfig`.

TPU-first design: instead of tf.data, batches are produced host-side as
fixed-shape uint8 numpy arrays (decode + crop-or-pad with PIL workers) and
normalized *on device inside the model* — the host->HBM transfer is uint8 and
every downstream op is jit-compiled. A double-buffered prefetcher overlaps
host decode with device compute.
"""

from __future__ import annotations

import queue as queue_mod
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
from PIL import Image

from facenet_tpu import h5utils
from facenet_tpu.logging import logger


class DefaultConfig:
    """Minimal dataset config for ad-hoc use (reference apps expect this name)."""

    def __init__(self, path, h5file=None, nrof_classes=None,
                 min_nrof_images=None, max_nrof_images=None):
        self.path = path
        self.h5file = h5file
        self.nrof_classes = nrof_classes
        self.min_nrof_images = min_nrof_images
        self.max_nrof_images = max_nrof_images


class ImageClass:
    """Paths to the images of one class (ref dataset.py:104-142)."""

    def __init__(self, config):
        if not config.path:
            raise ValueError('Path to dataset is not specified.')

        self.path = Path(str(config.path)).expanduser()
        self.name = self.path.stem

        if not self.path.exists():
            raise ValueError(f'Directory {self.path} does not exist')

        files = list(self.path.glob('*'))

        if config.h5file:
            # one open for the whole class — per-image h5utils.read would
            # re-open/parse the file O(N) times on a large dataset
            import h5py
            h5file = Path(str(config.h5file)).expanduser()
            with h5py.File(str(h5file), 'r') as hf:
                def is_valid(f, hf=hf):
                    key = h5utils.filename2key(f, 'is_valid')
                    return bool(hf[key][...]) if key in hf else True
                files = [f for f in files if is_valid(f)]

        if config.max_nrof_images:
            if len(files) > config.max_nrof_images:
                files = np.random.choice(files, size=config.max_nrof_images,
                                         replace=False)

        self.files = sorted(str(f) for f in files)

    def __repr__(self):
        return f'{self.__class__.__name__} ({self.name}/{self.nrof_images})'

    @property
    def nrof_images(self):
        return len(self.files)

    @property
    def nrof_pairs(self):
        return self.nrof_images * (self.nrof_images - 1) // 2


class Database:
    """Directory-per-class dataset index (ref dataset.py:145-231)."""

    def __init__(self, config):
        if isinstance(config, (str, Path)):
            config = DefaultConfig(config)

        if not config.path:
            raise ValueError('Path to dataset is not specified.')

        self.path = Path(str(config.path)).expanduser()
        if not self.path.exists():
            raise ValueError(f'Directory {self.path} does not exist')

        self.h5file = config.h5file
        if self.h5file:
            self.h5file = Path(str(self.h5file)).expanduser()

        dirs = [p for p in self.path.glob('*') if p.is_dir()]
        if config.nrof_classes:
            if len(dirs) > config.nrof_classes:
                dirs = list(np.random.choice(dirs, size=config.nrof_classes,
                                             replace=False))
        dirs.sort()

        min_images = config.min_nrof_images or 0

        self.classes = []
        for path in dirs:
            images = ImageClass(DefaultConfig(
                path, h5file=self.h5file,
                max_nrof_images=config.max_nrof_images))
            if images.nrof_images > 0 and images.nrof_images >= min_images:
                self.classes.append(images)

        logger.info(str(self))

    def __repr__(self):
        return (f'{self.__class__.__name__}\n' +
                f'{self.path}\n' +
                f'h5 file {self.h5file}\n' +
                f'Number of classes {self.nrof_classes} \n' +
                f'Number of images {self.nrof_images}\n' +
                f'Minimal number of images in class {self.min_nrof_images}\n' +
                f'Maximal number of images in class {self.max_nrof_images}\n')

    @property
    def files(self):
        files = []
        for cls in self.classes:
            files += cls.files
        return files

    @property
    def labels(self):
        labels = []
        for idx, cls in enumerate(self.classes):
            labels += [idx] * cls.nrof_images
        return np.array(labels)

    @property
    def min_nrof_images(self):
        return min((cls.nrof_images for cls in self.classes), default=0)

    @property
    def max_nrof_images(self):
        return max((cls.nrof_images for cls in self.classes), default=0)

    @property
    def nrof_classes(self):
        return len(self.classes)

    @property
    def nrof_images(self):
        return sum(cls.nrof_images for cls in self.classes)

    @property
    def nrof_images_per_class(self):
        return [cls.nrof_images for cls in self.classes]

    # ------------------------------------------------------------------
    # pipelines
    # ------------------------------------------------------------------

    def batches(self, loader, batch_size, shuffle=False, repeat=False,
                drop_remainder=False, num_workers=8, prefetch=2, seed=None,
                start_state=None):
        """Batched pipeline over (files, labels) — tf_dataset_api equivalent."""
        return BatchLoader(self.files, self.labels, loader, batch_size,
                           shuffle=shuffle, repeat=repeat,
                           drop_remainder=drop_remainder,
                           num_workers=num_workers, prefetch=prefetch,
                           seed=seed, start_state=start_state)

    # reference-compatible name
    def tf_dataset_api(self, loader, batch_size, buffer_size=None, repeat=False):
        return self.batches(loader, batch_size, shuffle=buffer_size is not None,
                            repeat=repeat)


# reference apps use this name (SURVEY.md §2.9)
DBase = Database


class ImageLoader:
    """Decode an image file into a fixed-shape uint8 array.

    Equivalent of the reference in-graph loader (facenet.py:45-54):
    decode, then crop-or-pad to (size, size); here with PIL on host.
    """

    # geometry mode understood by the native decoder (imageio.cc):
    # 0 = central crop-or-pad. BatchLoader uses this to route whole batches
    # through the C++ pipeline instead of per-image PIL calls.
    native_mode = 0

    def __init__(self, config=None, size=None):
        if size is None:
            size = int(config.size)
        self.height = self.width = int(size)

    def __call__(self, path):
        from facenet_tpu import native
        if native.available():
            img = native.decode_image(path, (self.height, self.width),
                                      mode=self.native_mode)
            if img is not None:
                return img
            # Native decoder handles JPEG/PNG only; fall back to PIL for
            # the formats it doesn't (GIF/BMP/TIFF/WebP, CMYK JPEG) and
            # raise only when PIL can't read the file either.
        with Image.open(path) as img:
            arr = np.asarray(img.convert('RGB'), dtype=np.uint8)
        return crop_or_pad(arr, self.height, self.width)


def crop_or_pad(image, height, width):
    """Center crop-or-pad, semantics of tf.image.resize_with_crop_or_pad."""
    h, w = image.shape[:2]

    top = max((h - height) // 2, 0)
    left = max((w - width) // 2, 0)
    image = image[top:top + height, left:left + width]

    pad_h = height - image.shape[0]
    pad_w = width - image.shape[1]
    if pad_h > 0 or pad_w > 0:
        image = np.pad(image,
                       ((pad_h // 2, pad_h - pad_h // 2),
                        (pad_w // 2, pad_w - pad_w // 2),
                        (0, 0)))
    return image


class BatchLoader:
    """Multithreaded, double-buffered host pipeline yielding uint8 batches.

    Yields (images [B,H,W,3] uint8, labels [B] int32). The decode pool runs
    `num_workers` PIL decoders; `prefetch` batches are staged ahead so device
    compute overlaps host IO (the TPU-side analogue of tf.data prefetch).

    Resumable (SURVEY.md §5 failure-recovery plan): the shuffle order of
    epoch e is derived deterministically from (seed, e), and the loader
    tracks a (epoch, pos) cursor advanced as each batch is handed to the
    consumer. `state()` captures the cursor for the training checkpoint;
    constructing with `start_state=` continues the exact sample sequence —
    a mid-epoch resume neither skips nor repeats any image.
    """

    def __init__(self, files, labels, loader, batch_size, shuffle=False,
                 repeat=False, drop_remainder=False, num_workers=8,
                 prefetch=2, seed=None, start_state=None):
        self.files = list(files)
        self.labels = np.asarray(labels, dtype=np.int32)
        self.loader = loader
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.repeat = repeat
        self.drop_remainder = drop_remainder
        self.num_workers = num_workers
        self.prefetch = prefetch
        if seed is None:
            seed = int(np.random.randint(0, 2 ** 31 - 1))
        self.seed = int(seed)
        self._epoch = 0
        self._pos = 0                      # batches delivered this epoch
        if start_state:
            self.seed = int(start_state.get('seed', self.seed))
            self._epoch = int(start_state.get('epoch', 0))
            self._pos = int(start_state.get('pos', 0))

    def __len__(self):
        n = len(self.files)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    @property
    def nrof_batches(self):
        return len(self)

    def state(self):
        """Cursor for checkpointing; feed back via `start_state=`."""
        return {'seed': self.seed, 'epoch': self._epoch, 'pos': self._pos}

    def _epoch_order(self, epoch):
        order = np.arange(len(self.files))
        if self.shuffle:
            np.random.RandomState(
                (self.seed * 1_000_003 + epoch) % (2 ** 31 - 1)).shuffle(order)
        return order

    def _index_stream(self):
        n = len(self.files)
        epoch, skip = self._epoch, self._pos
        while True:
            order = self._epoch_order(epoch)
            produced = 0
            for start in range(0, n, self.batch_size):
                idx = order[start:start + self.batch_size]
                if self.drop_remainder and len(idx) < self.batch_size:
                    continue
                produced += 1
                if produced <= skip:       # resume: skip delivered batches
                    continue
                yield idx
            epoch += 1
            skip = 0
            if not self.repeat:
                return

    def _advance(self):
        self._pos += 1
        if self._pos >= len(self):
            self._epoch += 1
            self._pos = 0

    def __iter__(self):
        # Fast path: fixed-geometry loaders go through the native C++
        # threadpool decoder (facenet_tpu/native) — one submit per batch,
        # double-buffered, no Python in the decode loop.
        mode = getattr(self.loader, 'native_mode', None)
        inner = None
        if mode is not None:
            from facenet_tpu import native
            if native.available():
                inner = self._iter_native(mode)
        if inner is None:
            inner = self._iter_pil()
        # cursor advances when a batch is handed out, so `state()` taken
        # after a train step never re-delivers that batch on resume
        # (prefetched-but-undelivered batches don't count)
        for item in inner:
            self._advance()
            yield item

    def _iter_native(self, mode):
        from facenet_tpu import native
        ldr = native.NativeBatchLoader(
            self.files, (self.loader.height, self.loader.width), mode=mode,
            num_threads=self.num_workers, prefetch=max(self.prefetch, 1))
        try:
            pending_meta = []

            def stream():
                for idx in self._index_stream():
                    pending_meta.append((idx, self.labels[idx]))
                    yield idx

            for images, ok in ldr.iterate(stream()):
                idx, labels = pending_meta.pop(0)
                if not ok.all():
                    # Native decode handles JPEG/PNG; retry failed rows
                    # through the loader's PIL fallback so both pipelines
                    # behave identically: alternate formats still load,
                    # and a genuinely unreadable file raises (fail-loud,
                    # never train on silent zero images).
                    for row in np.flatnonzero(ok == 0):
                        images[row] = self.loader(self.files[idx[row]])
                yield images, labels
        finally:
            ldr.close()

    def _iter_pil(self):
        stop = threading.Event()
        q = queue_mod.Queue(maxsize=max(self.prefetch, 1))

        def put_unless_stopped(item):
            # bounded put that gives up when the consumer abandoned the
            # iterator (a blocking q.put would leak this thread forever)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def produce():
            # end-of-stream sentinel: None for a clean end, the exception
            # itself for a producer failure — swallowing it here would end
            # iteration early and SILENTLY (a corrupt image would truncate
            # an epoch with no error, stranding the resume cursor)
            end = None
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for idx in self._index_stream():
                        if stop.is_set():
                            return
                        images = list(pool.map(
                            lambda i: self.loader(self.files[i]), idx))
                        batch = np.stack(images)
                        if not put_unless_stopped((batch, self.labels[idx])):
                            return
            except BaseException as exc:
                end = exc
            put_unless_stopped(end)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()

        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            try:
                while q.get_nowait() is not None:
                    pass
            except queue_mod.Empty:
                pass


class PKPipeline:
    """P-classes x K-images equal-batch pipeline (ref dataset.py:46-101).

    Yields (images, labels) batches of size P*K forever. P/K default to the
    reference's hardcoded 20/5 (ref :61-62) unless set in config. Decode
    runs through the native prefetching loader when available (a serial
    per-file loop would block the train step for ~P*K decode times), with
    a thread-pool fallback.

    Resumable: batch b is sampled with an RNG seeded by (seed, b), so the
    stream is a pure function of the batch counter — `state()` is just that
    counter, and `start_state=` continues the identical sequence.
    """

    def __init__(self, loader, classes, config, seed=None, num_workers=8,
                 prefetch=2, start_state=None):
        self.p = int(config.nrof_classes_per_batch or 20)
        self.k = int(config.nrof_examples_per_class or 5)
        config.nrof_classes_per_batch = self.p
        config.nrof_examples_per_class = self.k

        self.loader = loader
        self.num_workers = num_workers
        self.prefetch = prefetch
        if seed is None:
            seed = int(np.random.randint(0, 2 ** 31 - 1))
        self.seed = int(seed)
        self._batch = 0
        if start_state:
            self.seed = int(start_state.get('seed', self.seed))
            self._batch = int(start_state.get('batch', 0))

        self.all_files = []
        self.class_slices = []
        self.usable = []
        for idx, _class in enumerate(classes):
            _class.index = idx
            self.class_slices.append((len(self.all_files),
                                      _class.nrof_images))
            self.all_files.extend(_class.files)
            if _class.nrof_images >= self.k:
                self.usable.append(idx)

    def state(self):
        """Cursor for checkpointing; feed back via `start_state=`."""
        return {'seed': self.seed, 'batch': self._batch}

    def _sample(self, b):
        rnd = random.Random(f'{self.seed}:{b}')
        idx, labels = [], []
        for ci in rnd.sample(self.usable, self.p):
            start, n = self.class_slices[ci]
            rows = rnd.sample(range(n), self.k)
            idx.extend(start + r for r in rows)
            labels.extend([ci] * self.k)
        return idx, np.asarray(labels, dtype=np.int32)

    def _index_batches(self):
        b = self._batch
        while True:
            yield self._sample(b)
            b += 1

    def _raw_iter(self):
        mode = getattr(self.loader, 'native_mode', None)
        if mode is not None:
            from facenet_tpu import native
            if native.available():
                yield from self._iter_native(mode)
                return
        yield from self._iter_pool()

    def _iter_native(self, mode):
        from facenet_tpu import native
        ldr = native.NativeBatchLoader(
            self.all_files, (self.loader.height, self.loader.width),
            mode=mode, num_threads=self.num_workers,
            prefetch=max(self.prefetch, 1))
        pending_meta = []

        def stream():
            for idx, labels in self._index_batches():
                pending_meta.append((idx, labels))
                yield idx

        try:
            for images, ok in ldr.iterate(stream()):
                idx, labels = pending_meta.pop(0)
                if not ok.all():
                    # same fail-loud contract as BatchLoader._iter_native:
                    # retry failed rows through the PIL fallback; a truly
                    # unreadable file raises rather than training the
                    # metric objective on silent zero images
                    for row in np.flatnonzero(ok == 0):
                        images[row] = self.loader(self.all_files[idx[row]])
                yield images, labels
        finally:
            ldr.close()

    def _iter_pool(self):
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for idx, labels in self._index_batches():
                images = list(pool.map(lambda i: self.loader(self.all_files[i]),
                                       idx))
                yield np.stack(images), labels

    # iterator protocol (the reference API hands out a generator, so
    # callers use next() directly; ref train_classifier.py:99)
    def __iter__(self):
        return self

    def __next__(self):
        if getattr(self, '_iter', None) is None:
            self._iter = self._counting_iter()
        return next(self._iter)

    def _counting_iter(self):
        for item in self._raw_iter():
            self._batch += 1
            yield item


def pipeline_with_equal_batches(loader, classes, config, seed=None,
                                num_workers=8, prefetch=2, start_state=None):
    """Reference-named constructor for PKPipeline (ref dataset.py:46-101)."""
    return PKPipeline(loader, classes, config, seed=seed,
                      num_workers=num_workers, prefetch=prefetch,
                      start_state=start_state)


def equal_batches_input_pipeline(embeddings, config, seed=None):
    """Equal batches over precomputed per-class embeddings (ref facenet.py:89-123).

    :param embeddings: list of [n_c, D] arrays (one per class)
    :return: infinite generator of [P*K, D] float32 batches
    """
    if not config.nrof_classes_per_batch:
        config.nrof_classes_per_batch = len(embeddings)

    if not config.nrof_examples_per_class:
        config.nrof_examples_per_class = round(
            0.1 * sum(len(e) for e in embeddings) / len(embeddings))
        config.nrof_examples_per_class = max(config.nrof_examples_per_class, 1)

    k = int(config.nrof_examples_per_class)
    # classes with fewer than k embeddings can't contribute a full group;
    # the default P (= all classes) must shrink with them or rnd.sample
    # would raise on the first batch
    usable = [e for e in embeddings if len(e) >= k]
    if not usable:
        raise ValueError(
            f'no class has >= {k} embeddings (largest: '
            f'{max((len(e) for e in embeddings), default=0)})')
    p = min(int(config.nrof_classes_per_batch), len(usable))
    config.nrof_classes_per_batch = p

    rnd = random.Random(seed)

    def generator():
        while True:
            batch = []
            for embs in rnd.sample(usable, p):
                rows = rnd.sample(range(len(embs)), k)
                batch.append(np.asarray(embs)[rows])
            yield np.concatenate(batch).astype(np.float32)

    return generator()
