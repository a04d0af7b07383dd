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

}  // extern "C"
