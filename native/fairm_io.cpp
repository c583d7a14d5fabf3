// fairm_io — native data-loading runtime for the TPU framework.
//
// The reference feeds its training loop from 16 PyTorch DataLoader worker
// processes doing PIL decode + numpy crop/augment/noise (reference
// utils/dataset_utils.py, train.py:50-51). This library provides the same
// pipeline as a C++ shared object (libpng / libjpeg-turbo decode, fused
// crop+dihedral+normalize, SIMD-friendly Gaussian noise synthesis) exposed
// through a minimal C ABI consumed via ctypes — the host side of the
// pipeline runs native while the GIL is released, overlapping with TPU
// step dispatch.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC, links png + jpeg).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// Decode
// ---------------------------------------------------------------------------

// Decode a PNG or JPEG file (sniffed by magic bytes) to RGB8.
// On success returns 0 and sets *out (malloc'd, h*w*3), *h, *w.
int fio_decode_rgb(const char* path, uint8_t** out, int* h, int* w);

void fio_free(uint8_t* p) { free(p); }

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

static int decode_jpeg(FILE* f, uint8_t** out, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width, H = cinfo.output_height;
  uint8_t* buf = static_cast<uint8_t*>(malloc(size_t(W) * H * 3));
  if (!buf) { jpeg_destroy_decompress(&cinfo); return -3; }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + size_t(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = buf; *h = H; *w = W;
  return 0;
}

static int decode_png(FILE* f, uint8_t** out, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 W, H;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &W, &H, &bit_depth, &color_type,
               nullptr, nullptr, nullptr);

  // normalize anything to 8-bit RGB (PIL convert('RGB') semantics,
  // reference dataset_utils.py:118)
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  uint8_t* buf = static_cast<uint8_t*>(malloc(size_t(W) * H * 3));
  if (!buf) { png_destroy_read_struct(&png, &info, nullptr); return -3; }
  png_bytep* rows = static_cast<png_bytep*>(malloc(sizeof(png_bytep) * H));
  for (png_uint_32 y = 0; y < H; y++) rows[y] = buf + size_t(y) * W * 3;
  png_read_image(png, rows);
  free(rows);
  png_destroy_read_struct(&png, &info, nullptr);
  *out = buf; *h = int(H); *w = int(W);
  return 0;
}

int fio_decode_rgb(const char* path, uint8_t** out, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) { fclose(f); return -1; }
  rewind(f);
  int rc;
  if (magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png(f, out, h, w);
  } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, out, h, w);
  } else {
    rc = -4;  // unknown format
  }
  fclose(f);
  return rc;
}

// ---------------------------------------------------------------------------
// Fused crop + dihedral augment + normalize
// ---------------------------------------------------------------------------

// Copy a size x size crop at (iy, ix) from an h x w x 3 uint8 image,
// apply dihedral mode 0..7 (reference image_utils.py:133-163 semantics:
// mode 1 flipud; 2 rot90; 3 rot90+flipud; 4 rot180; 5 rot180+flipud;
// 6 rot270; 7 rot270+flipud), write float32 [0,1] HWC.
void fio_crop_augment_f32(const uint8_t* img, int h, int w,
                          int iy, int ix, int size, int mode, float* out) {
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < size; y++) {
    for (int x = 0; x < size; x++) {
      // destination (y, x) <- source coords under the inverse transform
      int sy, sx;
      switch (mode) {
        case 0: sy = y; sx = x; break;
        case 1: sy = size - 1 - y; sx = x; break;                  // flipud
        case 2: sy = x; sx = size - 1 - y; break;                  // rot90 ccw
        case 3: sy = x; sx = y; break;                             // rot90+flipud
        case 4: sy = size - 1 - y; sx = size - 1 - x; break;       // rot180
        case 5: sy = y; sx = size - 1 - x; break;                  // rot180+flipud
        case 6: sy = size - 1 - x; sx = y; break;                  // rot270
        case 7: sy = size - 1 - x; sx = size - 1 - y; break;       // rot270+flipud
        default: sy = y; sx = x; break;
      }
      const uint8_t* src = img + (size_t(iy + sy) * w + (ix + sx)) * 3;
      float* dst = out + (size_t(y) * size + x) * 3;
      dst[0] = src[0] * inv;
      dst[1] = src[1] * inv;
      dst[2] = src[2] * inv;
    }
  }
}

// ---------------------------------------------------------------------------
// Gaussian noise synthesis (reference dataset_utils.py:122-126)
// ---------------------------------------------------------------------------

// xorshift128+ — fast, good-enough PRNG for noise synthesis
struct Rng {
  uint64_t s0, s1;
};

static inline uint64_t rng_next(Rng* r) {
  uint64_t x = r->s0;
  const uint64_t y = r->s1;
  r->s0 = y;
  x ^= x << 23;
  r->s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
  return r->s1 + y;
}

// Ziggurat normal sampler (Marsaglia & Tsang 2000, 128 layers): one PRNG
// draw + one table compare on ~98% of samples, no transcendentals on the
// hot path (the Box-Muller predecessor spent 45 ns/sample in sinf/cosf/logf).
static uint32_t zig_kn[128];
static float zig_wn[128], zig_fn[128];

static bool zig_init() {
  const double m1 = 2147483648.0;
  double dn = 3.442619855899, tn = dn, vn = 9.91256303526217e-3;
  double q = vn / exp(-0.5 * dn * dn);
  zig_kn[0] = uint32_t((dn / q) * m1);
  zig_kn[1] = 0;
  zig_wn[0] = float(q / m1);
  zig_wn[127] = float(dn / m1);
  zig_fn[0] = 1.0f;
  zig_fn[127] = float(exp(-0.5 * dn * dn));
  for (int i = 126; i >= 1; i--) {
    dn = sqrt(-2.0 * log(vn / dn + exp(-0.5 * dn * dn)));
    zig_kn[i + 1] = uint32_t((dn / tn) * m1);
    tn = dn;
    zig_fn[i] = float(exp(-0.5 * dn * dn));
    zig_wn[i] = float(dn / m1);
  }
  return true;
}
static const bool zig_ready = zig_init();

static inline float zig_norm(Rng* r) {
  const float tail = 3.442620f;
  for (;;) {
    int32_t hz = int32_t(uint32_t(rng_next(r)));
    uint32_t iz = uint32_t(hz) & 127u;
    uint32_t ahz = hz < 0 ? uint32_t(-int64_t(hz)) : uint32_t(hz);
    if (ahz < zig_kn[iz]) return float(hz) * zig_wn[iz];
    if (iz == 0) {  // tail via Marsaglia's exponential method
      float x, y;
      do {
        float u1 = float((rng_next(r) >> 40) + 1) * (1.0f / 16777217.0f);
        float u2 = float((rng_next(r) >> 40) + 1) * (1.0f / 16777217.0f);
        x = -logf(u1) * (1.0f / tail);
        y = -logf(u2);
      } while (y + y < x * x);
      return hz > 0 ? tail + x : -tail - x;
    }
    float x = float(hz) * zig_wn[iz];
    float u = float(rng_next(r) >> 40) * (1.0f / 16777216.0f);
    if (zig_fn[iz] + u * (zig_fn[iz - 1] - zig_fn[iz])
        < expf(-0.5f * x * x))
      return x;
  }
}

// dst = clip(src + N(0, sigma), 0, 255); n bytes (any channel layout)
void fio_gaussian_noise_u8(const uint8_t* src, uint8_t* dst, int64_t n,
                           float sigma, uint64_t seed) {
  Rng r = {seed ^ 0x9E3779B97F4A7C15ull, (seed << 1) | 1};
  // warm up
  for (int i = 0; i < 8; i++) rng_next(&r);
  for (int64_t i = 0; i < n; i++) {
    float v = float(src[i]) + sigma * zig_norm(&r);
    dst[i] = uint8_t(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
  }
}

// Fused: gaussian-noise an h x w x 3 u8 image then crop+augment both the
// noisy and clean versions with the same window — one call per train sample.
void fio_noisy_pair_crop_augment(const uint8_t* clean, int h, int w,
                                 float sigma, uint64_t seed,
                                 int iy, int ix, int size, int mode,
                                 float* out_degraded, float* out_clean) {
  // noise only the crop window region (cheaper than the full image); the
  // reference noises the full image then crops — same distribution
  const int64_t npix = int64_t(size) * size * 3;
  uint8_t* tmp = static_cast<uint8_t*>(malloc(npix));
  // gather the crop first (un-augmented), then noise, then augment both
  for (int y = 0; y < size; y++) {
    memcpy(tmp + size_t(y) * size * 3,
           clean + (size_t(iy + y) * w + ix) * 3, size_t(size) * 3);
  }
  uint8_t* noisy = static_cast<uint8_t*>(malloc(npix));
  fio_gaussian_noise_u8(tmp, noisy, npix, sigma, seed);
  fio_crop_augment_f32(noisy, size, size, 0, 0, size, mode, out_degraded);
  fio_crop_augment_f32(tmp, size, size, 0, 0, size, mode, out_clean);
  free(noisy);
  free(tmp);
}

}  // extern "C"
