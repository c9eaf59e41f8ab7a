"""Tests for the native (C++) host data pipeline.

Covers the contract the Python side relies on: JPEG/PNG decode to RGB uint8,
crop-or-pad parity with the numpy reference implementation, corrupt-file
handling (status 0, zero-filled slot — the reference counts unreadable files
instead of crashing, ref apps/extract_faces.py:48-54), and the prefetching
batch loader's ordering.
"""

import numpy as np
import pytest
from PIL import Image

from facenet_tpu import native
from facenet_tpu.dataset import crop_or_pad

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native library failed to build')


@pytest.fixture(scope='module')
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('imgs')
    rng = np.random.RandomState(0)
    paths = []
    for i in range(12):
        arr = rng.randint(0, 256, (100 + 7 * i, 120, 3), dtype=np.uint8)
        ext = 'png' if i % 2 else 'jpg'
        p = root / f'im{i}.{ext}'
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    bad = root / 'bad.jpg'
    bad.write_bytes(b'this is not an image')
    return paths, str(bad)


def test_decode_png_lossless_matches_pil(image_dir):
    paths, _ = image_dir
    png = [p for p in paths if p.endswith('png')][0]
    ref = np.asarray(Image.open(png))
    got = native.decode_image(png, ref.shape[:2], mode=native.MODE_CROP_OR_PAD)
    np.testing.assert_array_equal(got, ref)


def test_decode_jpeg_close_to_pil(image_dir):
    paths, _ = image_dir
    jpg = [p for p in paths if p.endswith('jpg')][0]
    ref = np.asarray(Image.open(jpg)).astype(np.int32)
    got = native.decode_image(jpg, ref.shape[:2]).astype(np.int32)
    # Different IDCT implementations may differ by a few counts.
    assert np.abs(got - ref).mean() < 2.0


def test_crop_or_pad_parity(image_dir):
    paths, _ = image_dir
    png = [p for p in paths if p.endswith('png')][0]
    full = np.asarray(Image.open(png))
    for size in [(64, 64), (160, 160), (96, 200), (200, 96)]:
        got = native.decode_image(png, size)
        ref = crop_or_pad(full, *size)
        np.testing.assert_array_equal(got, ref)


def test_corrupt_file_returns_none(image_dir):
    _, bad = image_dir
    assert native.decode_image(bad, 64) is None
    assert native.probe_image(bad) is None


def test_probe(image_dir):
    paths, _ = image_dir
    png = [p for p in paths if p.endswith('png')][0]
    ref = np.asarray(Image.open(png))
    assert native.probe_image(png) == ref.shape[:2]


def test_batch_loader_ordering_and_status(image_dir):
    paths, bad = image_dir
    all_paths = paths + [bad]
    ldr = native.NativeBatchLoader(all_paths, 64, prefetch=2, num_threads=4)
    batches = [[0, 1, 2], [3, 4, 5, len(all_paths) - 1], [6]]
    got = list(ldr.iterate(batches))
    ldr.close()

    assert [g[0].shape[0] for g in got] == [3, 4, 1]
    assert got[1][1].tolist() == [1, 1, 1, 0]   # corrupt file flagged
    assert (got[1][0][3] == 0).all()            # zero-filled slot
    # spot-check content ordering against direct decode
    direct = native.decode_image(all_paths[3], 64)
    np.testing.assert_array_equal(got[1][0][0], direct)


def test_batch_loader_matches_image_loader(image_dir):
    paths, _ = image_dir
    from facenet_tpu.dataset import BatchLoader, ImageLoader
    loader = ImageLoader(size=80)
    bl = BatchLoader(paths, np.arange(len(paths)), loader, batch_size=5)
    batches = list(bl)
    assert sum(b[0].shape[0] for b in batches) == len(paths)
    np.testing.assert_array_equal(batches[0][0][0], loader(paths[0]))
    assert batches[0][1].tolist() == [0, 1, 2, 3, 4]


def test_batch_loader_prefetch_one_no_deadlock(image_dir):
    # regression: priming 2 batches with queue_depth 1 deadlocked in submit
    paths, _ = image_dir
    ldr = native.NativeBatchLoader(paths, 32, prefetch=1, num_threads=2)
    batches = [[0, 1], [2, 3], [4, 5], [6]]
    got = list(ldr.iterate(batches))
    ldr.close()
    assert [g[0].shape[0] for g in got] == [2, 2, 2, 1]


def test_batch_loader_deep_prefetch(image_dir):
    paths, _ = image_dir
    ldr = native.NativeBatchLoader(paths, 32, prefetch=4, num_threads=2)
    batches = [[i % len(paths)] for i in range(10)]
    got = list(ldr.iterate(batches))
    ldr.close()
    assert len(got) == 10


def test_decode_native_size(image_dir):
    paths, bad = image_dir
    png = [p for p in paths if p.endswith('png')][0]
    ref = np.asarray(Image.open(png))
    got = native.decode_image_native_size(png)
    np.testing.assert_array_equal(got, ref)
    assert native.decode_image_native_size(bad) is None


def test_empty_batch_submit_completes():
    """An n==0 batch must complete immediately instead of deadlocking wait()
    (advisor finding: done_images+1 == n unreachable for n == 0)."""
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    ldr = native.NativeBatchLoader(['/nonexistent.jpg'], 8)
    try:
        ldr.submit([])
        images, ok = ldr.wait(0)
        assert images.shape == (0, 8, 8, 3)
        assert ok.shape == (0,)
    finally:
        ldr.close()


def test_letterbox_array_geometry():
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (50, 100, 3)).astype(np.uint8)
    out = native.letterbox_array(img, (96, 96))
    assert out.shape == (96, 96, 3)
    # 100 -> 96 wide: scale 0.96, height 48 centered at rows 24..71
    rows = np.nonzero(out.any(axis=(1, 2)))[0]
    assert rows[0] == 24 and rows[-1] == 71
    scale, (left, top) = native.letterbox_geometry(50, 100, (96, 96))
    assert scale == pytest.approx(0.96)
    assert (left, top) == (0, 24)


def test_letterbox_decode_matches_array(tmp_path):
    """MODE_LETTERBOX decode == letterbox_array(decoded pixels): one
    geometry implementation behind both entry points (PNG = lossless)."""
    from PIL import Image
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (37, 61, 3)).astype(np.uint8)
    p = tmp_path / 'x.png'
    Image.fromarray(img).save(p)
    via_decode = native.decode_image(str(p), (64, 48),
                                     mode=native.MODE_LETTERBOX)
    via_array = native.letterbox_array(img, (64, 48))
    np.testing.assert_array_equal(via_decode, via_array)


def test_letterbox_scaled_jpeg_decode_geometry_exact(tmp_path):
    """A large JPEG headed for a small letterbox takes the DCT-domain
    scaled decode (imageio.cc decode_jpeg target hints). The pad placement
    must stay bit-identical to the full-decode path — box mapping uses
    letterbox_geometry(native dims) — and the pixels must stay close (the
    resample chain differs: dct-half + bilinear vs bilinear-from-full)."""
    from PIL import Image
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.RandomState(3)
    # smooth gradient + mild noise: decodes scaled (1016x1532 >> 480x640)
    yy, xx = np.mgrid[0:1016, 0:1532]
    img = np.stack([(yy // 4) % 256, (xx // 6) % 256,
                    ((yy + xx) // 8) % 256], -1).astype(np.uint8)
    img = np.clip(img.astype(np.int16) +
                  rng.randint(-8, 8, img.shape), 0, 255).astype(np.uint8)
    p = tmp_path / 'big.jpg'
    Image.fromarray(img).save(p, quality=90)

    fast = native.decode_image(str(p), (480, 640),
                               mode=native.MODE_LETTERBOX)
    full = native.decode_image_native_size(str(p))
    assert full.shape == (1016, 1532, 3)
    slow = native.letterbox_array(full, (480, 640))

    # identical zero-pad rows/cols = identical letterbox placement
    np.testing.assert_array_equal(fast.any(-1).any(-1), slow.any(-1).any(-1))
    np.testing.assert_array_equal(fast.any(-1).any(0), slow.any(-1).any(0))
    assert np.abs(fast.astype(np.float32) - slow.astype(np.float32)).mean() < 6.0


def test_probe_is_header_only_and_correct(tmp_path):
    from PIL import Image
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (33, 77, 3)).astype(np.uint8)
    for name, kw in (('a.jpg', {'quality': 90}), ('b.png', {})):
        p = tmp_path / name
        Image.fromarray(img).save(p, **kw)
        assert native.probe_image(str(p)) == (33, 77)


def test_huge_header_rejected(tmp_path):
    """A PNG header declaring 60000x60000 (~10.8 GB) must fail the decode
    contract (None) instead of throwing bad_alloc in a worker thread."""
    import struct
    import zlib
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')

    def chunk(tag, payload):
        return (struct.pack('>I', len(payload)) + tag + payload +
                struct.pack('>I', zlib.crc32(tag + payload)))

    ihdr = struct.pack('>IIBBBBB', 60000, 60000, 8, 2, 0, 0, 0)
    data = (b'\x89PNG\r\n\x1a\n' + chunk(b'IHDR', ihdr) +
            chunk(b'IDAT', zlib.compress(b'\x00')) + chunk(b'IEND', b''))
    p = tmp_path / 'huge.png'
    p.write_bytes(data)
    assert native.decode_image(str(p), 16) is None
    assert native.probe_image(str(p)) is None


def test_decode_unusual_color_modes(tmp_path):
    """Real-world photo corpora contain grayscale/CMYK JPEGs and
    palette/RGBA PNGs; all must decode to the same RGB as PIL instead of
    counting as unreadable (ref extract_faces counts unreadables,
    apps/extract_faces.py:48-54 — a silently skipped format loses data)."""
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')

    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (60, 80, 3), np.uint8)
    files = {
        'gray.jpg': lambda p: Image.fromarray(base).convert('L').save(
            p, quality=95),
        'cmyk.jpg': lambda p: Image.fromarray(base).convert('CMYK').save(
            p, quality=95),
        'pal.png': lambda p: Image.fromarray(base).convert(
            'P', palette=Image.ADAPTIVE).save(p),
        'rgba.png': lambda p: Image.fromarray(
            np.dstack([base, np.full((60, 80), 255, np.uint8)]),
            'RGBA').save(p),
    }
    for name, save in files.items():
        p = tmp_path / name
        save(str(p))
        out = native.decode_image(str(p), (60, 80))
        assert out is not None, f'{name} decoded as unreadable'
        pil = np.asarray(Image.open(p).convert('RGB'))
        np.testing.assert_array_equal(out, pil, err_msg=name)


def test_decode_16bit_png_scales_not_clips(tmp_path):
    """16-bit PNGs must decode by scaling to 8-bit (v >> 8), not by the
    clip-at-255 PIL applies in convert('RGB') — a v*257 gradient must come
    back as v."""
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')

    v = np.arange(0, 256, dtype=np.uint16).reshape(16, 16)
    img = Image.fromarray((v * 257).astype(np.int32), 'I')
    p = tmp_path / 'g16.png'
    img.save(str(p), bits=16)
    out = native.decode_image(str(p), (16, 16))
    assert out is not None
    np.testing.assert_array_equal(out[:, :, 0], v.astype(np.uint8))


def test_decoder_survives_mutated_inputs(tmp_path):
    """Bounded fuzz: byte-flipped/truncated/spliced JPEG+PNG must decode
    to an array or None — never crash the process (the decoder runs
    in-process on worker threads; a segfault kills the whole run)."""
    import io
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')

    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (48, 64, 3), np.uint8)
    seeds = []
    for fmt, kw in (('JPEG', {'quality': 90}), ('PNG', {}),
                    ('JPEG', {'quality': 80, 'progressive': True})):
        buf = io.BytesIO()
        Image.fromarray(base).save(buf, format=fmt, **kw)
        seeds.append((fmt.lower(), bytearray(buf.getvalue())))

    p = tmp_path / 'fuzz.bin'
    for trial in range(500):
        _, seed = seeds[trial % len(seeds)]
        data = bytearray(seed)
        for _ in range(rng.randint(1, 12)):
            op = rng.randint(3)
            if op == 0:
                data[rng.randint(len(data))] = rng.randint(256)
            elif op == 1 and len(data) > 32:
                del data[rng.randint(16, len(data)):]
            else:
                pos = rng.randint(len(data))
                data[pos:pos] = bytes(
                    rng.randint(0, 256, rng.randint(1, 64), np.uint8))
        p.write_bytes(bytes(data))
        out = native.decode_image(str(p), (32, 32))
        assert out is None or out.shape == (32, 32, 3)
        native.probe_image(str(p))
