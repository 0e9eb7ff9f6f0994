// Native host-side segment gather for the streaming data path.
//
// The framework packs all utterances into one contiguous (N_frames, n_mels)
// array (data/dataset.py); a training batch is B segments, each a contiguous
// range of rows. numpy's fancy-index gather goes through elementwise copy
// machinery (~1.7 GB/s on the bench host); this is just B memcpys of
// seg_rows*row_bytes each, split across threads — memory-bandwidth bound.
//
// The reference has no native code anywhere (SURVEY.md §2); this accelerates
// the host-streamed fallback path (datasets larger than HBM) where the thin
// host CPU is the bottleneck.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// packed: (n_rows, row_bytes) contiguous buffer
// starts: n segment start rows
// out:    (n, seg_rows * row_bytes) output buffer
void gather_segments(const char* packed, int64_t row_bytes,
                     const int64_t* starts, int64_t n, int64_t seg_rows,
                     char* out, int n_threads) {
  const int64_t seg_bytes = seg_rows * row_bytes;
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || n < n_threads * 4) {
    for (int64_t i = 0; i < n; ++i) {
      std::memcpy(out + i * seg_bytes, packed + starts[i] * row_bytes,
                  seg_bytes);
    }
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(out + i * seg_bytes, packed + starts[i] * row_bytes,
                    seg_bytes);
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
