// Native multithreaded per-track feature-file loader.
//
// The reference stacks one small .pt tensor per track id at dataset load
// (spotify_graph.py:66-79) — a serial interpreted loop over up to a million
// files at dataset_large scale.  Here a thread pool reads .npy vectors
// (float32/float64, 1-D or [1, d]) straight into a preallocated [N, d]
// float32 matrix; Python only resolves id -> path and handles .pt interop
// stragglers.
//
// C ABI only (consumed via ctypes from
// gcn_song_embeddings_tpu/native/featload.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal .npy reader: fills `out[0..dim)` from a 1-D (or [1, d]) vector of
// float32/float64.  Returns true on success.
bool read_npy_vector(const char* path, float* out, int64_t dim) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  bool ok = false;
  std::vector<char> header;
  do {
    unsigned char magic[8];
    if (std::fread(magic, 1, 8, f) != 8) break;
    if (std::memcmp(magic, "\x93NUMPY", 6) != 0) break;
    int major = magic[6];
    uint32_t hlen = 0;
    if (major == 1) {
      unsigned char b[2];
      if (std::fread(b, 1, 2, f) != 2) break;
      hlen = b[0] | (b[1] << 8);
    } else {
      unsigned char b[4];
      if (std::fread(b, 1, 4, f) != 4) break;
      hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    }
    if (hlen > (1u << 20)) break;
    header.resize(hlen + 1);
    if (std::fread(header.data(), 1, hlen, f) != hlen) break;
    header[hlen] = '\0';
    const char* h = header.data();

    // dtype: accept little-endian / byte-order-free '<f4' / '<f8' /
    // '|f4' / '=f4' only.  Big-endian ('>f4') would fread byte-swapped
    // garbage, so it must be REJECTED — the Python caller
    // (native/featload.py) then re-reads the directory with np.load,
    // which byte-swaps correctly.
    const char* descr = std::strstr(h, "'descr'");
    if (!descr) break;
    bool f64;
    if (std::strstr(descr, "<f4") || std::strstr(descr, "|f4") ||
        std::strstr(descr, "=f4")) {
      f64 = false;
    } else if (std::strstr(descr, "<f8") || std::strstr(descr, "|f8") ||
               std::strstr(descr, "=f8")) {
      f64 = true;
    } else {
      break;
    }
    if (std::strstr(h, "'fortran_order': True")) {
      // 1-D vectors are order-agnostic; [1, d] fortran is also contiguous.
    }

    // shape: '(d,)' or '(1, d)'
    const char* shp = std::strstr(h, "'shape'");
    if (!shp) break;
    const char* lp = std::strchr(shp, '(');
    if (!lp) break;
    long long a = -1, b = -1;
    int nread = std::sscanf(lp, "(%lld, %lld", &a, &b);
    if (nread < 1) break;
    long long n_elems;
    if (nread == 1 || b < 0) {
      n_elems = a;
    } else {
      if (a != 1 && b != 1) break;
      n_elems = a * b;
    }
    if (n_elems != dim) break;

    if (!f64) {
      ok = std::fread(out, sizeof(float), dim, f) == (size_t)dim;
    } else {
      std::vector<double> tmp(dim);
      ok = std::fread(tmp.data(), sizeof(double), dim, f) == (size_t)dim;
      if (ok)
        for (int64_t i = 0; i < dim; ++i) out[i] = (float)tmp[i];
    }
  } while (false);

  std::fclose(f);
  return ok;
}

}  // namespace

extern "C" {

// Dimension of the vector in one .npy file, or -1 if unreadable.
int64_t fl_probe_dim(const char* path) {
  // Read generously sized then parse: reuse the reader at increasing dims is
  // wasteful; parse the header directly instead.
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int64_t dim = -1;
  do {
    unsigned char magic[8];
    if (std::fread(magic, 1, 8, f) != 8) break;
    if (std::memcmp(magic, "\x93NUMPY", 6) != 0) break;
    uint32_t hlen = 0;
    if (magic[6] == 1) {
      unsigned char b[2];
      if (std::fread(b, 1, 2, f) != 2) break;
      hlen = b[0] | (b[1] << 8);
    } else {
      unsigned char b[4];
      if (std::fread(b, 1, 4, f) != 4) break;
      hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    }
    if (hlen > (1u << 20)) break;
    std::vector<char> header(hlen + 1);
    if (std::fread(header.data(), 1, hlen, f) != hlen) break;
    header[hlen] = '\0';
    const char* shp = std::strstr(header.data(), "'shape'");
    if (!shp) break;
    const char* lp = std::strchr(shp, '(');
    if (!lp) break;
    long long a = -1, b = -1;
    int nread = std::sscanf(lp, "(%lld, %lld", &a, &b);
    if (nread < 1) break;
    dim = (nread == 1 || b < 0) ? a : (a == 1 ? b : (b == 1 ? a : -1));
  } while (false);
  std::fclose(f);
  return dim;
}

// Load n rows of `dim` float32s from per-row .npy paths into out [n, dim].
// Empty-string paths are skipped (left zeroed, not counted as failures —
// the caller handles them, e.g. .pt interop).  Returns the number of FAILED
// rows (unreadable/mismatched); *first_bad gets the first failed row index
// (or -1).  Failed rows are zero-filled.
int64_t fl_load_rows(const char** paths, int64_t n, float* out, int64_t dim,
                     int32_t n_threads, int64_t* first_bad) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > 32) n_threads = 32;
  if ((int64_t)n_threads > n) n_threads = (int32_t)(n > 0 ? n : 1);

  std::atomic<int64_t> next(0), bad(0), first(-1);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(64);
      if (i >= n) return;
      int64_t hi = i + 64 < n ? i + 64 : n;
      for (; i < hi; ++i) {
        const char* path = paths[i];
        float* row = out + i * dim;
        if (!path || !path[0]) {
          std::memset(row, 0, sizeof(float) * dim);
          continue;
        }
        if (!read_npy_vector(path, row, dim)) {
          std::memset(row, 0, sizeof(float) * dim);
          bad.fetch_add(1);
          int64_t expect = -1;
          first.compare_exchange_strong(expect, i);
        }
      }
    }
  };

  std::vector<std::thread> pool;
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  if (first_bad) *first_bad = first.load();
  return bad.load();
}

}  // extern "C"
