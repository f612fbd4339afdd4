// Native Zarr chunk loader: parallel file read + blosc/LZ4 decode.
//
// TPU-native replacement for the reference's dask-threaded zarr ingestion
// (reference: main_baseline.py:169 xr.open_zarr + dask chunk scheduling).
// The Python side (climate_tpu/data/native_loader.py) hands us a list of
// chunk-file paths and one contiguous output buffer; we stream-decode every
// chunk with C-Blosc into its slot, fanning out over a thread pool.
//
// Build: make -C native   (links against the system libblosc)
//
// ABI (ctypes):
//   int ctpu_decode_chunks(const char** paths, int n_chunks,
//                          char* out, size_t chunk_nbytes, int n_threads);
// Returns 0 on success; -(1+i) if chunk i failed.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
// from libblosc
int blosc_decompress_ctx(const void* src, void* dest, size_t destsize,
                         int numinternalthreads);
}

namespace {

// Decode one chunk file into `dst` (capacity `cap`). Returns bytes written
// or -1 on failure.
long decode_one(const char* path, char* dst, size_t cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize < 0) {
    std::fclose(f);
    return -1;
  }
  std::vector<char> raw(static_cast<size_t>(fsize));
  size_t got = std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);
  if (got != raw.size()) return -1;

  if (raw.size() == cap) {
    // Uncompressed chunk (compressor: null) — straight copy.
    std::memcpy(dst, raw.data(), cap);
    return static_cast<long>(cap);
  }
  if (raw.size() < 16) return -1;
  uint32_t nbytes;
  std::memcpy(&nbytes, raw.data() + 4, 4);  // blosc header: uncompressed size
  if (nbytes > cap) return -1;
  int rc = blosc_decompress_ctx(raw.data(), dst, nbytes, 1);
  if (rc <= 0) return -1;
  return rc;
}

}  // namespace

extern "C" int ctpu_decode_chunks(const char** paths, int n_chunks, char* out,
                                  size_t chunk_nbytes, int n_threads) {
  if (n_chunks <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n_chunks) n_threads = n_chunks;

  std::atomic<int> next{0};
  std::atomic<int> failed{0};  // stores 1+index of first failing chunk

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n_chunks || failed.load(std::memory_order_relaxed)) break;
      long rc = decode_one(paths[i], out + static_cast<size_t>(i) * chunk_nbytes,
                           chunk_nbytes);
      if (rc < 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  int f = failed.load();
  return f ? -f : 0;
}
