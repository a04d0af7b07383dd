// LAFS-TPU native data plane: mmap'd indexed RecordIO + multithreaded JPEG
// batch decode.
//
// TPU-native replacement for the implicit native layer of the reference's
// data plane (mxnet.recordio + mx.image.imdecode, image_iter.py:264-306):
// the host must keep a pod-slice fed with 112x112 JPEG decodes, so record
// IO is zero-copy (mmap) and decodes fan out over a pthread pool, exposed
// through a C ABI consumed via ctypes (no pybind11 dependency).
//
// Record wire format (see lafs_cvpr2024_tpu/data/recordio.py for the
// layout documentation): [magic u32][lrecord u32][payload][pad to 4].
// Payload = IRHeader '<IfQQ' + flag*f32 extra labels + JPEG bytes.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <thread>
#include <atomic>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <csetjmp>
#include <jpeglib.h>

namespace {

constexpr uint32_t kMagic = 0xced7230a;
constexpr uint32_t kLrecMask = (1u << 29) - 1;

struct IRHeader {
  uint32_t flag;
  float label;
  uint64_t id;
  uint64_t id2;
} __attribute__((packed));

struct Reader {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<int64_t> keys;
  std::unordered_map<int64_t, size_t> offsets;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG into RGB; returns 0 on success. Output must be h*w*3.
int decode_jpeg(const uint8_t* buf, size_t len, uint8_t* out, int out_h,
                int out_w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  if (w != out_w || h != out_h) {
    // decode to a temp then nearest-resize (datasets are fixed-size; this
    // path only fires for stray records)
    std::vector<uint8_t> tmp(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row = tmp.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    for (int y = 0; y < out_h; ++y) {
      int sy = y * h / out_h;
      for (int x = 0; x < out_w; ++x) {
        int sx = x * w / out_w;
        memcpy(out + (static_cast<size_t>(y) * out_w + x) * 3,
               tmp.data() + (static_cast<size_t>(sy) * w + sx) * 3, 3);
      }
    }
  } else {
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode one JPEG at its NATIVE size into px (resized to hold h*w*3).
int decode_jpeg_native(const uint8_t* buf, size_t len,
                       std::vector<uint8_t>& px, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  px.resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        px.data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear inverse affine warp, border 0 — the cv2.warpAffine semantics of
// eval/ijb.py::warp_affine (out-of-range corner taps contribute 0 through
// their weight, final float truncated to uint8 like numpy .astype).
// M is the FORWARD 2x3 map src->dst; inverted here.
void warp_bilinear(const uint8_t* img, int h, int w, const float* M,
                   uint8_t* dst, int oh, int ow) {
  const float a = M[0], b = M[1], c = M[2], d = M[3], e = M[4], f = M[5];
  const float det = a * e - b * d;
  if (!std::isfinite(det) || std::fabs(det) < 1e-12f) {
    // degenerate/NaN alignment matrix (e.g. all 5 landmarks identical →
    // rank-0 Umeyama): match the numpy warp_affine path's deterministic
    // zero image instead of NaN source coords + UB float->int casts
    std::memset(dst, 0, static_cast<size_t>(oh) * ow * 3);
    return;
  }
  const float ia = e / det, ib = -b / det;
  const float id_ = -d / det, ie = a / det;
  const float ic = -(ia * c + ib * f);
  const float if_ = -(id_ * c + ie * f);
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      const float sx = ia * x + ib * y + ic;
      const float sy = id_ * x + ie * y + if_;
      const float fx0 = std::floor(sx), fy0 = std::floor(sy);
      const int x0 = static_cast<int>(fx0), y0 = static_cast<int>(fy0);
      const float wx = sx - fx0, wy = sy - fy0;
      float acc[3] = {0.f, 0.f, 0.f};
      for (int dy = 0; dy < 2; ++dy) {
        for (int dx = 0; dx < 2; ++dx) {
          const int xi = x0 + dx, yi = y0 + dy;
          if (xi < 0 || xi >= w || yi < 0 || yi >= h) continue;
          const float wgt = (dx ? wx : 1.f - wx) * (dy ? wy : 1.f - wy);
          const uint8_t* p = img + (static_cast<size_t>(yi) * w + xi) * 3;
          acc[0] += wgt * p[0];
          acc[1] += wgt * p[1];
          acc[2] += wgt * p[2];
        }
      }
      uint8_t* o = dst + (static_cast<size_t>(y) * ow + x) * 3;
      o[0] = static_cast<uint8_t>(acc[0]);
      o[1] = static_cast<uint8_t>(acc[1]);
      o[2] = static_cast<uint8_t>(acc[2]);
    }
  }
}

// Locate a record's payload: returns pointer, length, label; nullptr on error.
const uint8_t* record_payload(const Reader* r, int64_t key, size_t* len,
                              float* label) {
  auto it = r->offsets.find(key);
  if (it == r->offsets.end()) return nullptr;
  size_t off = it->second;
  if (off + 8 > r->size) return nullptr;
  uint32_t magic, lrec;
  memcpy(&magic, r->data + off, 4);
  memcpy(&lrec, r->data + off + 4, 4);
  if (magic != kMagic) return nullptr;
  size_t plen = lrec & kLrecMask;
  if (off + 8 + plen > r->size) return nullptr;
  const uint8_t* payload = r->data + off + 8;
  IRHeader hdr;
  memcpy(&hdr, payload, sizeof(IRHeader));
  size_t skip = sizeof(IRHeader);
  if (hdr.flag > 0) {
    float first;
    memcpy(&first, payload + skip, 4);
    *label = first;
    skip += static_cast<size_t>(hdr.flag) * 4;
  } else {
    *label = hdr.label;
  }
  if (skip > plen) return nullptr;
  *len = plen - skip;
  return payload + skip;
}

}  // namespace

extern "C" {

void* lafs_open(const char* idx_path, const char* rec_path) {
  auto* r = new Reader();
  r->fd = open(rec_path, O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  fstat(r->fd, &st);
  r->size = static_cast<size_t>(st.st_size);
  r->data = static_cast<const uint8_t*>(
      mmap(nullptr, r->size, PROT_READ, MAP_SHARED, r->fd, 0));
  if (r->data == MAP_FAILED) {
    close(r->fd);
    delete r;
    return nullptr;
  }
  madvise(const_cast<uint8_t*>(r->data), r->size, MADV_RANDOM);
  FILE* f = fopen(idx_path, "r");
  if (!f) {
    munmap(const_cast<uint8_t*>(r->data), r->size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  long long key, off;
  while (fscanf(f, "%lld\t%lld\n", &key, &off) == 2) {
    r->keys.push_back(key);
    r->offsets.emplace(key, static_cast<size_t>(off));
  }
  fclose(f);
  return r;
}

void lafs_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (!r) return;
  munmap(const_cast<uint8_t*>(r->data), r->size);
  close(r->fd);
  delete r;
}

int64_t lafs_num_records(void* h) {
  return static_cast<Reader*>(h)->keys.size();
}

void lafs_keys(void* h, int64_t* out) {
  auto* r = static_cast<Reader*>(h);
  memcpy(out, r->keys.data(), r->keys.size() * sizeof(int64_t));
}

// Raw payload access (zero-copy pointer into the mmap).
const uint8_t* lafs_record(void* h, int64_t key, int64_t* len, float* label) {
  size_t l = 0;
  const uint8_t* p =
      record_payload(static_cast<Reader*>(h), key, &l, label);
  *len = static_cast<int64_t>(l);
  return p;
}

// Decode a batch of records into out (n, out_h, out_w, 3) uint8 + labels (n).
// Returns number of failed decodes (their slots are zeroed).
int lafs_decode_batch(void* h, const int64_t* keys, int n, uint8_t* out,
                      float* labels, int out_h, int out_w, int nthreads) {
  auto* r = static_cast<Reader*>(h);
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      size_t len = 0;
      float label = 0.0f;
      const uint8_t* jpg = record_payload(r, keys[i], &len, &label);
      labels[i] = label;
      uint8_t* dst = out + static_cast<size_t>(i) * img_bytes;
      if (!jpg || decode_jpeg(jpg, len, dst, out_h, out_w) != 0) {
        memset(dst, 0, img_bytes);
        failures.fetch_add(1);
      }
    }
  };

  if (nthreads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

// Fused JPEG decode + per-face affine alignment (the IJB loose-crop host
// path: ~470k faces of decode→Umeyama-warp per protocol run). Inputs: one
// concatenated JPEG blob + per-image (offset, length), and n forward 2x3
// matrices (row-major, src→dst — the Umeyama transform from
// eval/ijb.py::norm_crop). Output (n, out_h, out_w, 3) uint8 RGB. The
// full-resolution decode stays thread-local and never crosses the ctypes
// boundary. Returns the number of failed decodes (their slots zeroed).
int lafs_decode_warp_batch(const uint8_t* blob, const int64_t* offs,
                           const int64_t* lens, int n, const float* mats,
                           uint8_t* out, int out_h, int out_w,
                           int nthreads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    std::vector<uint8_t> px;  // reused full-res decode buffer
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + static_cast<size_t>(i) * img_bytes;
      int w = 0, h = 0;
      if (decode_jpeg_native(blob + offs[i], static_cast<size_t>(lens[i]),
                             px, &w, &h) != 0) {
        memset(dst, 0, img_bytes);
        failures.fetch_add(1);
        continue;
      }
      warp_bilinear(px.data(), h, w, mats + static_cast<size_t>(i) * 6, dst,
                    out_h, out_w);
    }
  };

  if (nthreads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

}  // extern "C"
