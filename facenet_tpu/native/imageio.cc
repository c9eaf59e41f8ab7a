// Native image decode + geometry for the facenet_tpu host data pipeline.
//
// The reference feeds its accelerator from tf.data with in-graph decode
// (reference facenet/facenet.py:45-54 ImageLoader: decode_png/jpeg +
// resize_with_crop_or_pad). On TPU the decode must happen on the host CPU
// and the north-star throughput (>=20k img/s on a v5e-8, BASELINE.json)
// needs a multi-threaded native decoder — Python/PIL tops out far below
// the ~2.5k img/s/chip feed rate (SURVEY.md §7 "Hard parts").
//
// This file: JPEG (libjpeg) and PNG (libpng) decode to RGB uint8, plus
// the two geometry ops the framework needs on the host:
//   * crop_or_pad — central crop / zero pad to a fixed size (the
//     reference ImageLoader semantics),
//   * bilinear resize — for detector-input letterboxing.
// No external deps beyond libjpeg/libpng/zlib (system libraries).
//
// MEASURED NEGATIVE (round 3, don't redo): libjpeg decode knobs
// (do_fancy_upsampling=FALSE merged upsampling, dct_method=JDCT_IFAST,
// both) do not pay on representative content with this libjpeg-turbo
// 2.1.5. Interleaved-median A/B on repo-rendered 1080p q90 scenes:
// IFAST within +-3% of ISLOW (noise) at ~1 LSB mean drift — IFAST's
// 1.17x only appears on a max-entropy synthetic test pattern; photo-like
// content is Huffman-decode-bound, which no IDCT knob touches. Merged
// upsampling: within 2% everywhere and drifts pixels ~9.7 LSB mean.
// The only decode-side lever that pays is the DCT-domain scaled decode
// below (skips IDCT + upsampling work entirely).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cstdlib>
#include <algorithm>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace facenet_native {

struct Image {
  std::vector<uint8_t> data;  // HWC, RGB
  int height = 0;
  int width = 0;
};

// Non-owning pixel view: lets already-decoded caller buffers (ctypes
// arrays) flow into resize/letterbox without a multi-MB defensive copy.
struct ImageView {
  const uint8_t* data;
  int height;
  int width;
  ImageView(const Image& img)  // NOLINT(runtime/explicit) — by design
      : data(img.data.data()), height(img.height), width(img.width) {}
  ImageView(const uint8_t* d, int h, int w) : data(d), height(h), width(w) {}
};

// A corrupt/malicious header can declare up to 65535x65535 (~12.8 GB RGB).
// Cap pixel count so such files fail the decode contract (return 0 =
// unreadable) instead of throwing std::bad_alloc out of a worker thread.
constexpr uint64_t kMaxPixels = 100ull * 1000 * 1000;  // 100 MPix = 300 MB

static bool alloc_image(Image* out, uint64_t h, uint64_t w) {
  if (h == 0 || w == 0 || h * w > kMaxPixels) return false;
  try {
    out->data.resize(static_cast<size_t>(h) * w * 3);
  } catch (const std::bad_alloc&) {
    return false;
  }
  out->height = static_cast<int>(h);
  out->width = static_cast<int>(w);
  return true;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg with longjmp error trap so corrupt files return
// failure instead of aborting the process — the reference counts unreadable
// files rather than crashing, reference apps/extract_faces.py:48-54).
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Corrupt inputs are an expected, counted outcome (unreadable-file
// tolerance) — don't let libjpeg spam stderr per bad file.
static void jpeg_silent_message(j_common_ptr) {}

// target_h/target_w > 0 requests DCT-domain scaled decode: libjpeg decodes
// at M/8 scale (M in {1,2,4,8} — supported by both classic libjpeg and
// libjpeg-turbo) nearly for free, so a 1080p source headed for a 480x640
// letterbox skips ~4-16x of IDCT + color-convert work. The smallest M whose
// output still covers the needed resolution is chosen, so the following
// bilinear only ever downsamples (no quality loss vs a full decode).
// preserve_aspect computes the needed resolution the way letterbox() does
// (scale = min(th/h, tw/w)); otherwise (th, tw) is needed directly.
// orig_h/orig_w (optional) report the file's native dimensions, which
// callers need for letterbox geometry when the decode was scaled.
static bool decode_jpeg(const uint8_t* buf, size_t len, Image* out,
                        int target_h = 0, int target_w = 0,
                        bool preserve_aspect = false,
                        int* orig_h = nullptr, int* orig_w = nullptr) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  jerr.pub.output_message = jpeg_silent_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  // CMYK/YCCK (Adobe print-workflow JPEGs): libjpeg cannot emit RGB from
  // these, so decode to CMYK and convert below — otherwise such files
  // would count as unreadable.
  const bool cmyk = (cinfo.jpeg_color_space == JCS_CMYK ||
                     cinfo.jpeg_color_space == JCS_YCCK);
  cinfo.out_color_space = cmyk ? JCS_CMYK : JCS_RGB;
  if (orig_h) *orig_h = static_cast<int>(cinfo.image_height);
  if (orig_w) *orig_w = static_cast<int>(cinfo.image_width);
  if (target_h > 0 && target_w > 0 &&
      cinfo.image_height > 0 && cinfo.image_width > 0) {
    int need_h = target_h, need_w = target_w;
    if (preserve_aspect) {
      // mirror letterbox(): scale = min(th/h, tw/w), dims = (int)(d*s+.5)
      const float s =
          std::min(static_cast<float>(target_h) / cinfo.image_height,
                   static_cast<float>(target_w) / cinfo.image_width);
      need_h = static_cast<int>(cinfo.image_height * s + 0.5f);
      need_w = static_cast<int>(cinfo.image_width * s + 0.5f);
    }
    for (int m : {1, 2, 4, 8}) {
      cinfo.scale_num = static_cast<unsigned>(m);
      cinfo.scale_denom = 8;
      jpeg_calc_output_dimensions(&cinfo);
      if (static_cast<int>(cinfo.output_height) >= need_h &&
          static_cast<int>(cinfo.output_width) >= need_w)
        break;
    }
  }
  jpeg_start_decompress(&cinfo);

  if (!alloc_image(out, cinfo.output_height, cinfo.output_width)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  const int row_stride = out->width * 3;

  // Adobe files store CMYK inverted (255 = no ink); plain CMYK does not.
  const bool adobe_inverted = cinfo.saw_Adobe_marker;
  std::vector<uint8_t> row4;
  if (cmyk) row4.resize(static_cast<size_t>(out->width) * 4);

  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() +
                   static_cast<size_t>(cinfo.output_scanline) * row_stride;
    if (!cmyk) {
      JSAMPROW rows[1] = {row};
      jpeg_read_scanlines(&cinfo, rows, 1);
      continue;
    }
    JSAMPROW rows[1] = {row4.data()};
    jpeg_read_scanlines(&cinfo, rows, 1);
    for (int x = 0; x < out->width; ++x) {
      int c = row4[x * 4], m = row4[x * 4 + 1];
      int y = row4[x * 4 + 2], k = row4[x * 4 + 3];
      if (!adobe_inverted) {
        c = 255 - c; m = 255 - m; y = 255 - y; k = 255 - k;
      }
      // multiplicative CMYK -> RGB with 255 = no ink after normalization
      row[x * 3] = static_cast<uint8_t>(c * k / 255);
      row[x * 3 + 1] = static_cast<uint8_t>(m * k / 255);
      row[x * 3 + 2] = static_cast<uint8_t>(y * k / 255);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG decode (libpng; all bit depths / palettes normalized to 8-bit RGB).
// ---------------------------------------------------------------------------

struct PngReadState {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "read past end");
    return;
  }
  std::memcpy(out, s->buf + s->pos, n);
  s->pos += n;
}

static bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;

  // custom handlers: errors still longjmp back (png_longjmp), but nothing
  // is printed — corrupt files are an expected, counted outcome
  png_structp png = png_create_read_struct(
      PNG_LIBPNG_VER_STRING, nullptr,
      [](png_structp p, png_const_charp) { png_longjmp(p, 1); },
      [](png_structp, png_const_charp) {});
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }

  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // Normalize every input to 8-bit RGB.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // Drop alpha: composite over black is wrong for photos; just strip.
  if (color_type & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if (!alloc_image(out, h, w)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  const size_t row_stride = static_cast<size_t>(out->width) * 3;

  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + y * row_stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------------------------------------------------------------------
// Format sniffing + file read.
// ---------------------------------------------------------------------------

// target/aspect hints enable scaled JPEG decode (see decode_jpeg); PNG has
// no cheap scaled decode, so those files always decode at native size.
// orig_h/orig_w (when non-null) receive the file's native dimensions.
static bool decode_any(const uint8_t* buf, size_t len, Image* out,
                       int target_h = 0, int target_w = 0,
                       bool preserve_aspect = false,
                       int* orig_h = nullptr, int* orig_w = nullptr) {
  if (len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8 && buf[2] == 0xFF) {
    if (!decode_jpeg(buf, len, out, target_h, target_w, preserve_aspect,
                     orig_h, orig_w))
      return false;
  } else if (len >= 8 && !png_sig_cmp(buf, 0, 8)) {
    if (!decode_png(buf, len, out)) return false;
  } else {
    // Fall through: try JPEG then PNG (some files lack clean magic).
    if (!decode_jpeg(buf, len, out, target_h, target_w, preserve_aspect,
                     orig_h, orig_w) &&
        !decode_png(buf, len, out))
      return false;
  }
  if (orig_h && *orig_h == 0) *orig_h = out->height;
  if (orig_w && *orig_w == 0) *orig_w = out->width;
  return true;
}

static bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  if (size <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  const bool ok = std::fread(out->data(), 1, out->size(), f) == out->size();
  std::fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Geometry: central crop-or-pad and bilinear resize, both to fixed shapes.
// ---------------------------------------------------------------------------

// Match tf.image.resize_with_crop_or_pad: center-crop dims that are too
// large, zero-pad (centered) dims that are too small (reference
// facenet/facenet.py:52-53).
static void crop_or_pad(const Image& src, int th, int tw, uint8_t* dst) {
  std::memset(dst, 0, static_cast<size_t>(th) * tw * 3);

  const int copy_h = std::min(src.height, th);
  const int copy_w = std::min(src.width, tw);
  // tf pads with floor on the leading side and crops with floor offset.
  const int src_y = std::max(0, (src.height - th) / 2);
  const int src_x = std::max(0, (src.width - tw) / 2);
  const int dst_y = std::max(0, (th - src.height) / 2);
  const int dst_x = std::max(0, (tw - src.width) / 2);

  for (int y = 0; y < copy_h; ++y) {
    const uint8_t* s =
        src.data.data() +
        (static_cast<size_t>(src_y + y) * src.width + src_x) * 3;
    uint8_t* d = dst + (static_cast<size_t>(dst_y + y) * tw + dst_x) * 3;
    std::memcpy(d, s, static_cast<size_t>(copy_w) * 3);
  }
}

// Bilinear resize with half-pixel centers (align_corners=false), the same
// convention as jax.image.resize(method='bilinear') and PIL BILINEAR.
//
// Fixed-point two-pass form (12-bit weights): the vertical blend runs once
// per output row over the contiguous source rows (auto-vectorizes to wide
// integer lanes), the horizontal pass is ONE lerp per output sample from
// the blended row instead of three. Measured 2.9x over the scalar
// float-per-pixel version on a 1080p -> 480x640 letterbox (5.97 -> 2.06
// ms); rounding differs from exact float bilinear by <= 1 LSB per stage.
static void resize_bilinear(ImageView src, int th, int tw, uint8_t* dst) {
  if (src.height == th && src.width == tw) {
    std::memcpy(dst, src.data,
                static_cast<size_t>(src.height) * src.width * 3);
    return;
  }
  constexpr int kBits = 12;
  constexpr int kOne = 1 << kBits;
  const float sy = static_cast<float>(src.height) / th;
  const float sx = static_cast<float>(src.width) / tw;
  const int row_elems = src.width * 3;

  std::vector<int> x0s(tw), x1s(tw), xws(tw);
  for (int x = 0; x < tw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(src.width - 1)));
    const int x0 = static_cast<int>(fx);
    x0s[x] = x0 * 3;
    x1s[x] = std::min(x0 + 1, src.width - 1) * 3;
    xws[x] = static_cast<int>((fx - x0) * kOne + 0.5f);
  }

  std::vector<uint8_t> vrow(row_elems);
  for (int y = 0; y < th; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(src.height - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, src.height - 1);
    const int wy = static_cast<int>((fy - y0) * kOne + 0.5f);

    const uint8_t* r0 = src.data + static_cast<size_t>(y0) * row_elems;
    const uint8_t* r1 = src.data + static_cast<size_t>(y1) * row_elems;
    uint8_t* drow = dst + static_cast<size_t>(y) * tw * 3;

    // vertical blend into one uint8 row (vectorizable: contiguous, no
    // data-dependent indexing)
    const uint8_t* vr;
    if (wy == 0) {
      vr = r0;  // exact-hit row: skip the blend entirely
    } else {
      uint8_t* v = vrow.data();
      for (int i = 0; i < row_elems; ++i) {
        const int a = r0[i];
        v[i] = static_cast<uint8_t>(
            (a * kOne + wy * (r1[i] - a) + kOne / 2) >> kBits);
      }
      vr = v;
    }

    // horizontal: one lerp per output sample from the blended row
    for (int x = 0; x < tw; ++x) {
      const int x0 = x0s[x], x1 = x1s[x], wx = xws[x];
      for (int c = 0; c < 3; ++c) {
        const int a = vr[x0 + c];
        drow[x * 3 + c] = static_cast<uint8_t>(
            (a * kOne + wx * (vr[x1 + c] - a) + kOne / 2) >> kBits);
      }
    }
  }
}

// Aspect-preserving resize + centered zero pad into a fixed [th, tw]
// canvas — the detector-input geometry. The scale/pad formulas MUST match
// detectors/mtcnn/cascade.py letterbox_geometry: scale = min(th/h, tw/w),
// scaled dims rounded, pads = (target - scaled) // 2.
// geom_h/geom_w (when > 0) are the dimensions the scale/pad placement is
// computed from — the file's NATIVE size when `src` is a scaled decode.
// Box mapping in Python uses letterbox_geometry(native_h, native_w), so the
// placement must follow the native dims even when the pixels come from a
// reduced decode; the bilinear then maps src onto that exact (nh, nw) grid.
static void letterbox(ImageView src, int th, int tw, uint8_t* dst,
                      int geom_h = 0, int geom_w = 0) {
  if (geom_h <= 0) geom_h = src.height;
  if (geom_w <= 0) geom_w = src.width;
  const float scale = std::min(static_cast<float>(th) / geom_h,
                               static_cast<float>(tw) / geom_w);
  int nh = static_cast<int>(geom_h * scale + 0.5f);
  int nw = static_cast<int>(geom_w * scale + 0.5f);
  nh = std::max(1, std::min(nh, th));
  nw = std::max(1, std::min(nw, tw));

  std::memset(dst, 0, static_cast<size_t>(th) * tw * 3);
  const int top = (th - nh) / 2;
  const int left = (tw - nw) / 2;

  if (nh == th && nw == tw) {
    resize_bilinear(src, th, tw, dst);
    return;
  }
  std::vector<uint8_t> scaled(static_cast<size_t>(nh) * nw * 3);
  resize_bilinear(src, nh, nw, scaled.data());
  for (int y = 0; y < nh; ++y) {
    std::memcpy(dst + (static_cast<size_t>(top + y) * tw + left) * 3,
                scaled.data() + static_cast<size_t>(y) * nw * 3,
                static_cast<size_t>(nw) * 3);
  }
}

}  // namespace facenet_native

// ---------------------------------------------------------------------------
// C ABI used by both the threaded loader (loader.cc) and ctypes directly.
// ---------------------------------------------------------------------------

extern "C" {

// Decode one file to a fixed-size uint8 RGB buffer [height, width, 3].
// mode 0 = central crop-or-pad, 1 = bilinear resize, 2 = letterbox
// (aspect-preserving resize + centered zero pad).
// Returns 1 on success, 0 on unreadable/corrupt file.
int fn_decode_image(const char* path, int height, int width, int mode,
                    uint8_t* out) {
  std::vector<uint8_t> raw;
  if (!facenet_native::read_file(path, &raw)) return 0;
  facenet_native::Image img;
  int orig_h = 0, orig_w = 0;
  // Resize/letterbox targets allow a DCT-domain scaled JPEG decode;
  // crop_or_pad needs native resolution (mode 0 passes no hint).
  const bool scaled_ok = (mode == 1 || mode == 2);
  if (!facenet_native::decode_any(raw.data(), raw.size(), &img,
                                  scaled_ok ? height : 0,
                                  scaled_ok ? width : 0,
                                  /*preserve_aspect=*/mode == 2,
                                  &orig_h, &orig_w))
    return 0;
  if (img.height <= 0 || img.width <= 0) return 0;
  if (mode == 2)
    facenet_native::letterbox(img, height, width, out, orig_h, orig_w);
  else if (mode == 1)
    facenet_native::resize_bilinear(img, height, width, out);
  else
    facenet_native::crop_or_pad(img, height, width, out);
  return 1;
}

// Letterbox an ALREADY-DECODED HWC RGB uint8 array (h, w) into [th, tw, 3].
// Same geometry as mode 2 of fn_decode_image.
void fn_letterbox_array(const uint8_t* src, int h, int w, int th, int tw,
                        uint8_t* out) {
  facenet_native::letterbox(facenet_native::ImageView(src, h, w), th, tw,
                            out);
}

// Probe a file: report its native size from the header WITHOUT a full
// pixel decode (a JPEG header read is ~1000x cheaper than the decode;
// callers probe whole datasets for letterbox geometry).
// Returns 1 on success and fills (h, w); 0 if unreadable.
int fn_probe_image(const char* path, int* h, int* w) {
  std::vector<uint8_t> raw;
  if (!facenet_native::read_file(path, &raw)) return 0;

  // JPEG: header-only parse.
  if (raw.size() >= 3 && raw[0] == 0xFF && raw[1] == 0xD8 && raw[2] == 0xFF) {
    jpeg_decompress_struct cinfo;
    facenet_native::JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = facenet_native::jpeg_error_exit;
    jerr.pub.output_message = facenet_native::jpeg_silent_message;
    if (setjmp(jerr.setjmp_buffer)) {
      jpeg_destroy_decompress(&cinfo);
      return 0;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, raw.data(), static_cast<unsigned long>(raw.size()));
    bool ok = jpeg_read_header(&cinfo, TRUE) == JPEG_HEADER_OK;
    // same sanity cap as the decode path (see kMaxPixels)
    if (ok && (cinfo.image_height == 0 || cinfo.image_width == 0 ||
               uint64_t(cinfo.image_height) * cinfo.image_width >
                   facenet_native::kMaxPixels))
      ok = false;
    if (ok) {
      *h = static_cast<int>(cinfo.image_height);
      *w = static_cast<int>(cinfo.image_width);
    }
    jpeg_destroy_decompress(&cinfo);
    if (ok) return 1;
    return 0;
  }

  // PNG: IHDR is fixed-position — width/height big-endian at bytes 16/20.
  if (raw.size() >= 24 && !png_sig_cmp(raw.data(), 0, 8)) {
    const uint8_t* p = raw.data();
    const uint32_t pw = (uint32_t(p[16]) << 24) | (uint32_t(p[17]) << 16) |
                        (uint32_t(p[18]) << 8) | uint32_t(p[19]);
    const uint32_t ph = (uint32_t(p[20]) << 24) | (uint32_t(p[21]) << 16) |
                        (uint32_t(p[22]) << 8) | uint32_t(p[23]);
    if (pw == 0 || ph == 0 ||
        uint64_t(ph) * pw > facenet_native::kMaxPixels)
      return 0;
    *h = static_cast<int>(ph);
    *w = static_cast<int>(pw);
    return 1;
  }

  // Unknown magic: fall back to a full decode attempt.
  facenet_native::Image img;
  if (!facenet_native::decode_any(raw.data(), raw.size(), &img)) return 0;
  *h = img.height;
  *w = img.width;
  return 1;
}

}  // extern "C"

extern "C" {

// Decode one file at its native size; returns a malloc'd HWC RGB buffer
// (caller frees with fn_free) and fills (h, w). NULL on failure.
uint8_t* fn_decode_image_alloc(const char* path, int* h, int* w) {
  std::vector<uint8_t> raw;
  if (!facenet_native::read_file(path, &raw)) return nullptr;
  facenet_native::Image img;
  if (!facenet_native::decode_any(raw.data(), raw.size(), &img)) return nullptr;
  if (img.height <= 0 || img.width <= 0) return nullptr;
  uint8_t* out = static_cast<uint8_t*>(std::malloc(img.data.size()));
  if (!out) return nullptr;
  std::memcpy(out, img.data.data(), img.data.size());
  *h = img.height;
  *w = img.width;
  return out;
}

void fn_free(uint8_t* ptr) { std::free(ptr); }

}  // extern "C"
