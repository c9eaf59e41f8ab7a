"""Native (C++) host data pipeline: build, ctypes bindings, and loaders.

The TPU compute path is JAX/XLA/Pallas; the host-side runtime around it —
image decode, geometry, and batch prefetch — is C++ (imageio.cc, loader.cc),
bound via ctypes. This replaces the reference's tf.data input machinery
(reference facenet/dataset.py:15-43, facenet/facenet.py:45-54) with a
threadpool decoder whose batches go straight to `jax.device_put`.

Public surface:
  * available() -> bool — whether the native library built/loaded.
  * decode_image(path, size, mode) -> np.uint8 [H, W, 3] or None.
  * probe_image(path) -> (h, w) or None.
  * NativeBatchLoader — double-buffered prefetching batch iterator.

Everything degrades gracefully: if the toolchain or libjpeg/libpng are
missing, callers fall back to the PIL path in facenet_tpu.dataset.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libfacenet_native.so')

_lib = None
_lib_lock = threading.Lock()
_build_error = None

# Geometry modes (must match imageio.cc fn_decode_image).
MODE_CROP_OR_PAD = 0
MODE_RESIZE = 1
MODE_LETTERBOX = 2


def _build():
    """Compile the shared library if it is missing or stale.

    Concurrency-safe: an exclusive flock serializes builders across
    processes (pytest-xdist, multi-process training, shared checkouts) and
    the .so is compiled to a temp name then os.rename()d into place, so a
    concurrent CDLL can never map a partially written file.
    """
    srcs = [os.path.join(_DIR, f) for f in ('imageio.cc', 'loader.cc')]

    def fresh():
        if not os.path.exists(_LIB_PATH):
            return False
        lib_mtime = os.path.getmtime(_LIB_PATH)
        return all(os.path.getmtime(s) <= lib_mtime for s in srcs)

    if fresh():
        return

    import fcntl
    import tempfile

    with open(_LIB_PATH + '.lock', 'w') as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if fresh():  # another process built it while we waited
                return
            fd, tmp = tempfile.mkstemp(dir=_DIR, suffix='.so.tmp')
            os.close(fd)
            try:
                cmd = (['g++', '-O3', '-march=native', '-fPIC', '-std=c++17',
                        '-shared', '-o', tmp] + srcs +
                       ['-ljpeg', '-lpng', '-lz', '-lpthread'])
                subprocess.run(cmd, check=True, capture_output=True, cwd=_DIR)
                os.rename(tmp, _LIB_PATH)  # atomic within the same dir
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _load():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError) as exc:
            _build_error = exc
            return None

        lib.fn_decode_image.restype = ctypes.c_int
        lib.fn_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.fn_probe_image.restype = ctypes.c_int
        lib.fn_probe_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.fn_decode_image_alloc.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.fn_decode_image_alloc.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.fn_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.fn_loader_create.restype = ctypes.c_void_p
        lib.fn_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.fn_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.fn_loader_submit.restype = ctypes.c_int
        lib.fn_loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.fn_loader_wait.restype = ctypes.c_int
        lib.fn_loader_wait.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32)]
        lib.fn_letterbox_array.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def decode_image(path, size, mode=MODE_CROP_OR_PAD):
    """Decode one image to uint8 [size, size, 3] (or [h, w, 3] for a tuple).

    Returns None for unreadable/corrupt files (the caller counts them, the
    same contract as the reference's unreadable-file counter, reference
    apps/extract_faces.py:48-54).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native library unavailable: {_build_error}')
    h, w = (size, size) if np.isscalar(size) else (int(size[0]), int(size[1]))
    out = np.empty((h, w, 3), dtype=np.uint8)
    ok = lib.fn_decode_image(
        os.fsencode(path), h, w, int(mode),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if ok else None


def decode_image_native_size(path):
    """Decode one image at its original size -> uint8 [H, W, 3], or None.

    One decode pass (probe_image + decode_image would decode twice); used
    by hosts that need the full-resolution pixels, e.g. detector input.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native library unavailable: {_build_error}')
    h = ctypes.c_int()
    w = ctypes.c_int()
    ptr = lib.fn_decode_image_alloc(os.fsencode(path), ctypes.byref(h),
                                    ctypes.byref(w))
    if not ptr:
        return None
    try:
        n = h.value * w.value * 3
        out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        return out.reshape(h.value, w.value, 3)
    finally:
        lib.fn_free(ptr)


def letterbox_array(image, target_shape):
    """C++ letterbox of a decoded uint8 [H, W, 3] array -> [th, tw, 3].

    Same geometry as MODE_LETTERBOX decode (aspect-preserving bilinear
    resize + centered zero pad); the scale/pad metadata comes from
    `letterbox_geometry`.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native library unavailable: {_build_error}')
    image = np.ascontiguousarray(image, dtype=np.uint8)
    if image.ndim != 3 or image.shape[2] != 3:
        # the C++ reads exactly H*W*3 bytes — anything else would read
        # out of bounds or reinterpret channels
        raise ValueError(f'letterbox_array needs [H, W, 3] uint8, got '
                         f'{image.shape}')
    th, tw = int(target_shape[0]), int(target_shape[1])
    out = np.empty((th, tw, 3), dtype=np.uint8)
    lib.fn_letterbox_array(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1], th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def letterbox_geometry(h, w, target_shape):
    """(scale, (pad_left, pad_top)) of the letterbox placement for an
    (h, w) image — MUST match imageio.cc letterbox():
    original_coords = (letterboxed_coords - pad) / scale."""
    th, tw = int(target_shape[0]), int(target_shape[1])
    # Mirror imageio.cc letterbox() ARITHMETIC WIDTH as well as its
    # rounding: the C++ computes scale and d*s+0.5f in binary32 and
    # truncates ((int)(x + 0.5f)); doing this in Python doubles can flip
    # the rounded size by 1px near .5 boundaries on large images, which
    # would shift every mapped box by 1px against the C++ canvas.
    f32 = np.float32
    scale = min(f32(th) / f32(h), f32(tw) / f32(w))
    nh = max(1, min(int(f32(h) * scale + f32(0.5)), th))
    nw = max(1, min(int(f32(w) * scale + f32(0.5)), tw))
    return float(scale), ((tw - nw) // 2, (th - nh) // 2)


def probe_image(path):
    """Native size (h, w) of an image, or None if unreadable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native library unavailable: {_build_error}')
    h = ctypes.c_int()
    w = ctypes.c_int()
    ok = lib.fn_probe_image(os.fsencode(path), ctypes.byref(h),
                            ctypes.byref(w))
    return (h.value, w.value) if ok else None


class NativeBatchLoader:
    """Double-buffered prefetching batch loader over a fixed file list.

    Python decides the index order (shuffle / epochs / P×K sampling);
    the C++ pool decodes `prefetch` batches ahead. Iterating yields
    (images uint8 [B, H, W, 3], ok int32 [B]) with the next batch already
    decoding while the device consumes the current one.
    """

    def __init__(self, files, size, mode=MODE_CROP_OR_PAD, num_threads=None,
                 prefetch=2):
        lib = _load()
        if lib is None:
            raise RuntimeError(f'native library unavailable: {_build_error}')
        self._lib = lib
        self.files = [str(f) for f in files]
        h, w = (size, size) if np.isscalar(size) else (int(size[0]),
                                                       int(size[1]))
        self.height, self.width = h, w
        if num_threads is None:
            num_threads = min(32, os.cpu_count() or 4)

        arr = (ctypes.c_char_p * len(self.files))(
            *[os.fsencode(f) for f in self.files])
        self.queue_depth = max(int(prefetch), 1)
        self._handle = lib.fn_loader_create(
            arr, len(self.files), h, w, int(mode), int(num_threads),
            self.queue_depth)
        self._in_flight = 0
        self._closed = False

    def submit(self, indices):
        """Enqueue one batch of dataset indices for background decode."""
        idx = np.ascontiguousarray(indices, dtype=np.int32)
        accepted = self._lib.fn_loader_submit(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(idx))
        if not accepted:
            raise RuntimeError('submit() on a stopped loader')
        self._in_flight += 1
        return len(idx)

    def wait(self, batch_size):
        """Block for the oldest submitted batch; returns (images, ok)."""
        out = np.empty((batch_size, self.height, self.width, 3),
                       dtype=np.uint8)
        ok = np.empty((batch_size,), dtype=np.int32)
        n = self._lib.fn_loader_wait(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            raise RuntimeError('loader.wait() with no batch in flight')
        self._in_flight -= 1
        return out[:n], ok[:n]

    def iterate(self, index_batches):
        """Pipelined iteration: keeps the prefetch queue full.

        `index_batches` is an iterable of index lists (one per batch).
        """
        pending = []
        it = iter(index_batches)
        # Prime the pipeline up to the loader's queue depth — submitting a
        # (queue_depth + 1)-th batch would block in C++ until a wait().
        for batch in it:
            pending.append(self.submit(batch))
            if len(pending) >= self.queue_depth:
                break
        for batch in it:
            yield self.wait(pending.pop(0))
            pending.append(self.submit(batch))
        while pending:
            yield self.wait(pending.pop(0))

    def close(self):
        if not self._closed and self._handle:
            self._lib.fn_loader_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
