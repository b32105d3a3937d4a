// Bit-pack ELL rows into the tiled binary layout scored by the Pallas
// bit-plane kernel (ops/bitpack.py).
//
// Layout: column id v lives at word (v/4096)*128 + v%128, bit
// (v%4096)/128 — i.e. 4096-bit k-tiles of 128 lanes x 32 planes, so the
// kernel's plane extraction (word >> p) & 1 walks vocab ids in plain
// order and the query matrix needs no permutation.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <functional>
#include <algorithm>

namespace {
void run_parallel(int64_t n, int nthreads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (nthreads <= 1 || n < 4096) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}
}  // namespace

extern "C" {

// cols: [n, nnz_pad] int32 (entries >= num_cols are padding and are
// skipped); out: [n, num_words] uint32, zero-initialized by caller.
void bitpack_ell(const int32_t* cols, const int32_t* nnz, int64_t n,
                 int32_t nnz_pad, int32_t num_cols, int32_t num_words,
                 uint32_t* out, int32_t nthreads) {
  run_parallel(n, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      const int32_t* row = cols + i * nnz_pad;
      uint32_t* dst = out + i * num_words;
      int32_t m = nnz ? nnz[i] : nnz_pad;
      for (int32_t j = 0; j < m; j++) {
        int32_t v = row[j];
        if (v < 0 || v >= num_cols) continue;
        int32_t word = (v / 4096) * 128 + (v % 128);
        int32_t bit = (v % 4096) / 128;
        dst[word] |= (uint32_t{1} << bit);
      }
    }
  });
}

}  // extern "C"
