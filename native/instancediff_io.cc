// Native host-IO runtime for instancediff_tpu.
//
// TPU-native replacement for the reference's native input pipeline — the
// pinned-memory multi-worker torch DataLoader (reference data/__init__.py:
// 21-29 runs torch's C++ DataLoader machinery; SURVEY.md SS2.10 last row).
// Here: a pthread pool reads raw-float32 sample files straight into the
// caller-provided contiguous batch buffer and fuses the per-modality
// normalisation (MedSpeckle.py:55-70 semantics) into the read pass, so
// Python sees one ready-to-device NHWC batch with zero per-sample numpy
// round trips.
//
// Exposed C ABI (ctypes):
//   int idf_read_f32(path, out, n)                     — read one file
//   int idf_read_batch(paths, count, out, per_item,
//                      modes, n_threads)               — parallel batch read
// Normalisation modes: 0 = affine only (x*2-1), 1 = CT clamp[0,1800]/1800,
// 2 = cryo-EM clamp[0,255]/255, 3 = raw (no transform; embeddings).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>
#include <atomic>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

void normalize(float* data, int64_t n, int mode) {
  switch (mode) {
    case 1:  // scatter-artifact CT only: clamp [0,1800] / 1800, then affine
      for (int64_t i = 0; i < n; ++i)
        data[i] = clampf(data[i], 0.f, 1800.f) / 1800.f * 2.f - 1.f;
      break;
    case 2:  // cryo-EM: clamp [0,255] / 255, then affine
      for (int64_t i = 0; i < n; ++i)
        data[i] = clampf(data[i], 0.f, 255.f) / 255.f * 2.f - 1.f;
      break;
    case 0:  // plain affine to [-1,1]
      for (int64_t i = 0; i < n; ++i) data[i] = data[i] * 2.f - 1.f;
      break;
    default:  // 3: raw passthrough (CLIP embeddings)
      break;
  }
}

int read_one(const char* path, float* out, int64_t n, int mode) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  size_t got = std::fread(out, sizeof(float), static_cast<size_t>(n), f);
  std::fclose(f);
  if (got != static_cast<size_t>(n)) return -2;
  normalize(out, n, mode);
  return 0;
}

}  // namespace

extern "C" {

int idf_read_f32(const char* path, float* out, int64_t n) {
  return read_one(path, out, n, 3);
}

// Parallel batch read: paths[count] -> out[count * per_item], modes[count].
// Returns 0 on success, else the first nonzero per-item status.
int idf_read_batch(const char** paths, int32_t count, float* out,
                   int64_t per_item, const int32_t* modes,
                   int32_t n_threads) {
  if (count <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > count) n_threads = count;

  std::atomic<int32_t> next(0);
  std::atomic<int> status(0);

  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= count) break;
      int rc = read_one(paths[i], out + static_cast<int64_t>(i) * per_item,
                        per_item, modes[i]);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

}  // extern "C"
