// Native Criteo npy data loader: mmap'd day files, background batch
// assembly, bounded prefetch ring.
//
// Role parity with the reference's input pipeline (torchrec
// datasets/criteo.py InMemoryBinaryCriteoIterDataPipe:715 batch math +
// the multi-worker torch DataLoader it runs under). Re-designed as a
// TPU-host sidecar: the reference materializes per-rank slices in
// python and relies on DataLoader worker processes; here day files stay
// on disk (mmap, page cache does the tiering), a C++ thread assembles
// feature-major batches off the GIL into a bounded ring, and the python
// side only wraps ready buffers as jnp arrays — host input assembly
// overlaps device compute with no worker processes to babysit.
//
// Layout contract (criteo npy layout, reference criteo.py:62-67):
//   dense  [N, 13] <f4     sparse [N, 26] <i8 (or <i4)     labels [N] <i4
// Batch output (matches InMemoryBinaryCriteoIterDataPipe):
//   dense [B, 13] f32 (optionally log(|x|+3)*sign transform),
//   sparse [26 * B] int32 feature-major (optionally hash-modded),
//   labels [B] f32.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -pthread -o libcriteo.so \
//            criteo_loader.cc

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kDense = 13;
constexpr int kSparse = 26;

// ---- minimal npy v1.0/v2.0 reader over mmap --------------------------------

struct NpyFile {
  void* map = nullptr;
  size_t map_len = 0;
  const char* data = nullptr;  // first element
  int64_t rows = 0;
  int64_t cols = 1;
  char kind = 0;     // 'f' or 'i'
  int itemsize = 0;  // bytes per element

  bool Open(const char* path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (::fstat(fd, &st) != 0) {
      ::close(fd);
      return false;
    }
    map_len = static_cast<size_t>(st.st_size);
    map = ::mmap(nullptr, map_len, PROT_READ, MAP_PRIVATE, fd, 0);
    ::close(fd);
    if (map == MAP_FAILED) {
      map = nullptr;
      return false;
    }
    const unsigned char* p = static_cast<const unsigned char*>(map);
    if (map_len < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
    int major = p[6];
    size_t hlen, hoff;
    if (major == 1) {
      hlen = p[8] | (p[9] << 8);
      hoff = 10;
    } else {  // v2.0: 4-byte header length
      if (map_len < 12) return false;
      hlen = p[8] | (p[9] << 8) | (static_cast<size_t>(p[10]) << 16) |
             (static_cast<size_t>(p[11]) << 24);
      hoff = 12;
    }
    if (hoff + hlen > map_len) return false;
    std::string hdr(reinterpret_cast<const char*>(p) + hoff, hlen);
    // descr: '<f4' / '<i8' / '<i4'; fortran_order must be False
    if (hdr.find("'fortran_order': True") != std::string::npos) return false;
    size_t dpos = hdr.find("'descr':");
    if (dpos == std::string::npos) return false;
    size_t q1 = hdr.find('\'', dpos + 8);
    size_t q2 = hdr.find('\'', q1 + 1);
    std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
    if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|')) return false;
    kind = descr[1];
    itemsize = std::atoi(descr.c_str() + 2);
    if ((kind != 'f' && kind != 'i') || itemsize <= 0) return false;
    // float payloads must be f4 or f8 (FloatAt reads exactly those widths;
    // silently memcpy'ing 4 bytes of a wider float would yield garbage)
    if (kind == 'f' && itemsize != 4 && itemsize != 8) return false;
    size_t spos = hdr.find("'shape':");
    size_t par = hdr.find('(', spos);
    if (spos == std::string::npos || par == std::string::npos) return false;
    rows = std::atoll(hdr.c_str() + par + 1);
    size_t comma = hdr.find(',', par);
    size_t close = hdr.find(')', par);
    cols = 1;
    if (comma != std::string::npos && comma < close) {
      int64_t c = std::atoll(hdr.c_str() + comma + 1);
      if (c > 0) cols = c;
    }
    data = reinterpret_cast<const char*>(p) + hoff + hlen;
    if (static_cast<size_t>(rows) * cols * itemsize >
        map_len - hoff - hlen) {
      return false;
    }
    return true;
  }

  int64_t IntAt(int64_t row, int64_t col) const {
    const char* q = data + (row * cols + col) * itemsize;
    switch (itemsize) {
      case 8: {
        int64_t v;
        std::memcpy(&v, q, 8);
        return v;
      }
      case 4: {
        int32_t v;
        std::memcpy(&v, q, 4);
        return v;
      }
      default: {
        int16_t v = 0;
        std::memcpy(&v, q, itemsize);
        return v;
      }
    }
  }

  float FloatAt(int64_t row, int64_t col) const {
    if (kind == 'f') {
      const char* q = data + (row * cols + col) * itemsize;
      if (itemsize == 8) {
        double v;
        std::memcpy(&v, q, 8);
        return static_cast<float>(v);
      }
      float v;
      std::memcpy(&v, q, 4);
      return v;
    }
    return static_cast<float>(IntAt(row, col));
  }

  ~NpyFile() {
    if (map) ::munmap(map, map_len);
  }
};

// ---- loader ----------------------------------------------------------------

struct BatchBuf {
  std::vector<float> dense;    // [B, 13]
  std::vector<int32_t> sparse;  // [26 * B] feature-major
  std::vector<float> labels;   // [B]
};

class CriteoLoader {
 public:
  CriteoLoader(const char** dense_paths, const char** sparse_paths,
               const char** labels_paths, int64_t n_files, int64_t batch_size,
               int64_t rank, int64_t world_size, int transform_dense,
               const int64_t* hashes, int64_t shuffle_seed,
               int64_t prefetch_depth)
      : b_(batch_size),
        transform_(transform_dense != 0),
        seed_(shuffle_seed),
        depth_(std::max<int64_t>(prefetch_depth, 1)) {
    dense_.resize(n_files);
    sparse_.resize(n_files);
    labels_.resize(n_files);
    std::vector<int64_t> lengths(n_files);
    for (int64_t i = 0; i < n_files; ++i) {
      if (!dense_[i].Open(dense_paths[i]) ||
          !sparse_[i].Open(sparse_paths[i]) ||
          !labels_[i].Open(labels_paths[i]) ||
          dense_[i].cols != kDense || sparse_[i].cols != kSparse ||
          // mismatched day files would read past the shorter mmaps
          sparse_[i].rows != dense_[i].rows ||
          labels_[i].rows != dense_[i].rows) {
        ok_ = false;
        return;
      }
      lengths[i] = dense_[i].rows;
    }
    if (hashes) {
      for (int c = 0; c < kSparse; ++c) {
        if (hashes[c] <= 0) {  // zero/negative modulus -> SIGFPE in Produce
          ok_ = false;
          return;
        }
      }
      hashes_.assign(hashes, hashes + kSparse);
    }
    // per-rank global row range (reference get_file_row_ranges_and_
    // remainder:304 — even split, remainder to the last rank). Stored as
    // ranges, not per-row vectors: terabyte-scale day files are billions
    // of rows and O(N) index arrays would dwarf the page cache.
    int64_t total = 0;
    for (int64_t n : lengths) total += n;
    int64_t per = total / world_size;
    int64_t start_g = rank * per;
    int64_t stop_g =
        start_g + per + (rank == world_size - 1 ? total % world_size : 0);
    int64_t off = 0;
    for (int64_t i = 0; i < n_files; ++i) {
      int64_t lo = std::max<int64_t>(start_g - off, 0);
      int64_t hi = std::min<int64_t>(stop_g - off, lengths[i]);
      if (lo < hi) ranges_.push_back({n_rows_, i, lo, hi - lo});
      n_rows_ += std::max<int64_t>(hi - lo, 0);
      off += lengths[i];
    }
    n_batches_ = n_rows_ / b_;  // drop_last
    Start(0);
  }

  ~CriteoLoader() { StopWorker(); }

  bool ok() const { return ok_; }
  int64_t num_batches() const { return n_batches_; }

  int64_t Next(float* dense, int32_t* sparse, float* labels) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_out_.wait(lk, [&] { return !ring_.empty() || produced_ == n_batches_; });
    if (ring_.empty()) return 0;  // epoch exhausted
    BatchBuf buf = std::move(ring_.front());
    ring_.pop_front();
    lk.unlock();
    cv_in_.notify_one();
    std::memcpy(dense, buf.dense.data(), sizeof(float) * b_ * kDense);
    std::memcpy(sparse, buf.sparse.data(), sizeof(int32_t) * kSparse * b_);
    std::memcpy(labels, buf.labels.data(), sizeof(float) * b_);
    return b_;
  }

  void Reset(int64_t epoch) {
    StopWorker();
    {
      std::lock_guard<std::mutex> lk(mu_);
      ring_.clear();
      produced_ = 0;
    }
    Start(epoch);
  }

 private:
  // (file, in-file row) for per-rank-local row index g (binary search over
  // the range table — O(log files), no O(N) index arrays)
  std::pair<int64_t, int64_t> Locate(int64_t g) const {
    size_t lo = 0, hi = ranges_.size() - 1;
    while (lo < hi) {
      size_t mid = (lo + hi + 1) / 2;
      if (ranges_[mid].start_local <= g) lo = mid;
      else hi = mid - 1;
    }
    const Range& rg = ranges_[lo];
    return {rg.file, rg.lo + (g - rg.start_local)};
  }

  void Start(int64_t epoch) {
    if (seed_ >= 0) {
      // row-level shuffle (reference shuffle_batches): materialize the
      // permutation only when asked — identity order costs no memory
      order_.resize(n_rows_);
      for (int64_t i = 0; i < n_rows_; ++i) order_[i] = i;
      std::mt19937_64 rng(static_cast<uint64_t>(seed_) + epoch);
      std::shuffle(order_.begin(), order_.end(), rng);
    }
    stop_.store(false);
    worker_ = std::thread([this] { Produce(); });
  }

  void StopWorker() {
    stop_.store(true);
    cv_in_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  void Produce() {
    for (int64_t bi = 0; bi < n_batches_ && !stop_.load(); ++bi) {
      BatchBuf buf;
      buf.dense.resize(b_ * kDense);
      buf.sparse.resize(kSparse * b_);
      buf.labels.resize(b_);
      for (int64_t e = 0; e < b_; ++e) {
        int64_t g = bi * b_ + e;
        if (!order_.empty()) g = order_[g];
        auto [f, r] = Locate(g);
        for (int c = 0; c < kDense; ++c) {
          float v = dense_[f].FloatAt(r, c);
          if (transform_) {
            // reference transform: log(|x| + 3) * sign(x); sign(0) == 0
            float s = (v > 0) - (v < 0);
            v = std::log(std::fabs(v) + 3.0f) * s;
          }
          buf.dense[e * kDense + c] = v;
        }
        for (int c = 0; c < kSparse; ++c) {
          int64_t id = sparse_[f].IntAt(r, c);
          if (!hashes_.empty()) {
            id %= hashes_[c];
            if (id < 0) id += hashes_[c];
          } else if (id < 0 || id > INT32_MAX) {
            // raw 64-bit hash values without a modulus: a plain int32
            // cast would wrap NEGATIVE (out-of-range table indices
            // downstream) — bound deterministically instead
            id = static_cast<int64_t>(
                static_cast<uint64_t>(id) % 2147483647ULL);
          }
          buf.sparse[c * b_ + e] = static_cast<int32_t>(id);  // feature-major
        }
        buf.labels[e] = labels_[f].FloatAt(r, 0);
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_in_.wait(lk, [&] {
        return static_cast<int64_t>(ring_.size()) < depth_ || stop_.load();
      });
      if (stop_.load()) return;
      ring_.push_back(std::move(buf));
      ++produced_;
      lk.unlock();
      cv_out_.notify_one();
    }
    // mark end-of-epoch even when n_batches_ == 0
    std::lock_guard<std::mutex> lk(mu_);
    produced_ = n_batches_;
    cv_out_.notify_all();
  }

  struct Range {
    int64_t start_local;  // first per-rank-local row of this range
    int64_t file;
    int64_t lo;     // first in-file row
    int64_t count;
  };

  std::vector<NpyFile> dense_, sparse_, labels_;
  std::vector<Range> ranges_;
  int64_t n_rows_ = 0;
  std::vector<int64_t> order_;  // row permutation; empty = identity
  std::vector<int64_t> hashes_;
  int64_t b_;
  bool transform_;
  int64_t seed_;
  int64_t depth_;
  int64_t n_batches_ = 0;
  bool ok_ = true;

  std::mutex mu_;
  std::condition_variable cv_in_, cv_out_;
  std::deque<BatchBuf> ring_;
  int64_t produced_ = 0;
  std::atomic<bool> stop_{false};
  std::thread worker_;
};

}  // namespace

extern "C" {

// hashes: 26 int64 moduli or NULL; shuffle_seed < 0 disables shuffling.
void* cl_create(const char** dense_paths, const char** sparse_paths,
                const char** labels_paths, int64_t n_files,
                int64_t batch_size, int64_t rank, int64_t world_size,
                int transform_dense, const int64_t* hashes,
                int64_t shuffle_seed, int64_t prefetch_depth) {
  auto* l = new CriteoLoader(dense_paths, sparse_paths, labels_paths, n_files,
                             batch_size, rank, world_size, transform_dense,
                             hashes, shuffle_seed, prefetch_depth);
  if (!l->ok()) {
    delete l;
    return nullptr;
  }
  return l;
}

void cl_destroy(void* h) { delete static_cast<CriteoLoader*>(h); }

int64_t cl_num_batches(void* h) {
  return static_cast<CriteoLoader*>(h)->num_batches();
}

// Blocks for the next prefetched batch; returns batch_size, or 0 when the
// epoch is exhausted (call cl_reset to start the next one).
int64_t cl_next(void* h, float* dense, int32_t* sparse, float* labels) {
  return static_cast<CriteoLoader*>(h)->Next(dense, sparse, labels);
}

// Rewind; epoch reseeds the shuffle (seed + epoch).
void cl_reset(void* h, int64_t epoch) {
  static_cast<CriteoLoader*>(h)->Reset(epoch);
}

}  // extern "C"
