// Native tests for the Criteo npy loader sidecar (reference analog: the
// batch math of torchrec datasets/criteo.py InMemoryBinaryCriteoIterDataPipe
// :715 and its tests under datasets/tests/). gtest-style via minitest.h;
// drives the C ABI of libcriteo.so through dlopen, the exact surface the
// Python wrapper (datasets/criteo_native.py) uses.
//
// argv[1] = path to libcriteo.so (default "libcriteo.so")

#include <dlfcn.h>
#include <stdlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <set>
#include <string>
#include <vector>

#include "minitest.h"

using CreateFn = void* (*)(const char**, const char**, const char**, int64_t,
                           int64_t, int64_t, int64_t, int, const int64_t*,
                           int64_t, int64_t);
using NextFn = int64_t (*)(void*, float*, int32_t*, float*);
using NumFn = int64_t (*)(void*);
using ResetFn = void (*)(void*, int64_t);
using DestroyFn = void (*)(void*);

namespace {

constexpr int kDense = 13;
constexpr int kSparse = 26;

struct Api {
  CreateFn create;
  NextFn next;
  NumFn num_batches;
  ResetFn reset;
  DestroyFn destroy;
} api;

// ---- tiny npy v1.0 writer ---------------------------------------------------

void WriteNpy(const std::string& path, const std::string& descr, int64_t rows,
              int64_t cols, const void* data, size_t itemsize) {
  std::string shape = cols > 1 ? "(" + std::to_string(rows) + ", " +
                                     std::to_string(cols) + ")"
                               : "(" + std::to_string(rows) + ",)";
  std::string dict = "{'descr': '" + descr +
                     "', 'fortran_order': False, 'shape': " + shape + ", }";
  size_t total = 10 + dict.size() + 1;
  dict += std::string((64 - total % 64) % 64, ' ');
  dict += '\n';
  uint16_t dlen = static_cast<uint16_t>(dict.size());
  FILE* f = std::fopen(path.c_str(), "wb");
  std::fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  std::fwrite(&dlen, 2, 1, f);
  std::fwrite(dict.data(), 1, dict.size(), f);
  std::fwrite(data, itemsize, static_cast<size_t>(rows * cols), f);
  std::fclose(f);
}

// One synthetic "day": dense[r][c] = r*100 + c, sparse[r][c] = r*1000 + c,
// labels[r] = r % 2. Row identity is recoverable from sparse feature 0.
struct Day {
  std::string dense_p, sparse_p, labels_p;
  Day(const std::string& dir, int idx, int64_t rows, int64_t row0,
      bool sparse_i4 = false, const int64_t* sparse_override = nullptr,
      const float* dense_override = nullptr) {
    std::string tag = std::to_string(idx);
    dense_p = dir + "/dense_" + tag + ".npy";
    sparse_p = dir + "/sparse_" + tag + ".npy";
    labels_p = dir + "/labels_" + tag + ".npy";
    std::vector<float> dense(rows * kDense);
    std::vector<int64_t> sparse(rows * kSparse);
    std::vector<int32_t> labels(rows);
    for (int64_t r = 0; r < rows; ++r) {
      for (int c = 0; c < kDense; ++c)
        dense[r * kDense + c] = dense_override
                                    ? dense_override[c]
                                    : static_cast<float>((row0 + r) * 100 + c);
      for (int c = 0; c < kSparse; ++c)
        sparse[r * kSparse + c] = sparse_override
                                      ? sparse_override[c]
                                      : (row0 + r) * 1000 + c;
      labels[r] = static_cast<int32_t>((row0 + r) % 2);
    }
    WriteNpy(dense_p, "<f4", rows, kDense, dense.data(), 4);
    if (sparse_i4) {
      std::vector<int32_t> s4(sparse.begin(), sparse.end());
      WriteNpy(sparse_p, "<i4", rows, kSparse, s4.data(), 4);
    } else {
      WriteNpy(sparse_p, "<i8", rows, kSparse, sparse.data(), 8);
    }
    WriteNpy(labels_p, "<i4", rows, 1, labels.data(), 4);
  }
};

struct Loader {
  void* h = nullptr;
  explicit Loader(const std::vector<Day>& days, int64_t b, int64_t rank = 0,
                  int64_t world = 1, int transform = 0,
                  const int64_t* hashes = nullptr, int64_t seed = -1,
                  int64_t depth = 2) {
    std::vector<const char*> dp, sp, lp;
    for (const Day& d : days) {
      dp.push_back(d.dense_p.c_str());
      sp.push_back(d.sparse_p.c_str());
      lp.push_back(d.labels_p.c_str());
    }
    h = api.create(dp.data(), sp.data(), lp.data(),
                   static_cast<int64_t>(days.size()), b, rank, world,
                   transform, hashes, seed, depth);
  }
  ~Loader() {
    if (h) api.destroy(h);
  }
};

struct Batch {
  std::vector<float> dense;
  std::vector<int32_t> sparse;
  std::vector<float> labels;
  explicit Batch(int64_t b)
      : dense(b * kDense), sparse(kSparse * b), labels(b) {}
  int64_t Fill(void* h) {
    return api.next(h, dense.data(), sparse.data(), labels.data());
  }
  // row id of batch element e (from sparse feature 0, feature-major layout)
  int64_t Row(int64_t b, int64_t e) const { return sparse[0 * b + e] / 1000; }
};

std::string g_dir;

TEST(CriteoLoader, BatchAssemblyFeatureMajor) {
  std::vector<Day> days;
  days.emplace_back(g_dir, 0, 8, 0);
  Loader l(days, /*b=*/4);
  ASSERT_TRUE(l.h != nullptr);
  EXPECT_EQ(api.num_batches(l.h), 2);
  Batch b(4);
  ASSERT_EQ(b.Fill(l.h), 4);
  for (int64_t e = 0; e < 4; ++e) {
    for (int c = 0; c < kDense; ++c)
      EXPECT_FLOAT_EQ(b.dense[e * kDense + c],
                      static_cast<float>(e * 100 + c));
    for (int c = 0; c < kSparse; ++c)  // feature-major: [26 * B]
      EXPECT_EQ(b.sparse[c * 4 + e], static_cast<int32_t>(e * 1000 + c));
    EXPECT_FLOAT_EQ(b.labels[e], static_cast<float>(e % 2));
  }
  ASSERT_EQ(b.Fill(l.h), 4);
  EXPECT_EQ(b.Row(4, 0), 4);  // second batch starts at row 4
  EXPECT_EQ(b.Fill(l.h), 0);  // epoch exhausted
}

TEST(CriteoLoader, DenseTransformAndHashMod) {
  // dense values exercising sign(x) at <0, 0, >0; sparse ids incl. negative
  float dvals[kDense];
  int64_t svals[kSparse];
  for (int c = 0; c < kDense; ++c) dvals[c] = (c % 3 == 0) ? -2.0f
                                              : (c % 3 == 1) ? 0.0f
                                                             : 5.0f;
  for (int c = 0; c < kSparse; ++c) svals[c] = (c == 3) ? -5 : 100 + c;
  std::vector<Day> days;
  days.emplace_back(g_dir, 1, 2, 0, false, svals, dvals);
  int64_t hashes[kSparse];
  for (int c = 0; c < kSparse; ++c) hashes[c] = 7;
  Loader l(days, /*b=*/2, 0, 1, /*transform=*/1, hashes);
  ASSERT_TRUE(l.h != nullptr);
  Batch b(2);
  ASSERT_EQ(b.Fill(l.h), 2);
  for (int c = 0; c < kDense; ++c) {
    float x = dvals[c];
    float s = (x > 0) - (x < 0);
    float want = std::log(std::fabs(x) + 3.0f) * s;
    EXPECT_FLOAT_EQ(b.dense[c], want);
  }
  // python semantics: -5 % 7 == 2 (loader adds the modulus back)
  EXPECT_EQ(b.sparse[3 * 2 + 0], 2);
  EXPECT_EQ(b.sparse[4 * 2 + 0], (100 + 4) % 7);
}

TEST(CriteoLoader, RankSplitRemainderToLastRank) {
  std::vector<Day> days;
  days.emplace_back(g_dir, 2, 10, 0);
  // world=3: per-rank 3 rows, remainder 1 goes to the last rank
  Loader r0(days, 1, 0, 3), r2(days, 1, 2, 3);
  ASSERT_TRUE(r0.h != nullptr);
  ASSERT_TRUE(r2.h != nullptr);
  EXPECT_EQ(api.num_batches(r0.h), 3);
  EXPECT_EQ(api.num_batches(r2.h), 4);
  Batch b(1);
  ASSERT_EQ(b.Fill(r2.h), 1);
  EXPECT_EQ(b.Row(1, 0), 6);  // rank 2 starts at global row 6
}

TEST(CriteoLoader, MultiFileRangesCrossBoundary) {
  std::vector<Day> days;
  days.emplace_back(g_dir, 3, 3, 0);   // rows 0..2
  days.emplace_back(g_dir, 4, 5, 3);   // rows 3..7
  Loader l(days, /*b=*/2);
  ASSERT_TRUE(l.h != nullptr);
  EXPECT_EQ(api.num_batches(l.h), 4);
  Batch b(2);
  ASSERT_EQ(b.Fill(l.h), 2);   // rows 0,1
  ASSERT_EQ(b.Fill(l.h), 2);   // rows 2,3 — spans the file boundary
  EXPECT_EQ(b.Row(2, 0), 2);
  EXPECT_EQ(b.Row(2, 1), 3);
}

TEST(CriteoLoader, ShuffleDeterministicFullCoverage) {
  std::vector<Day> days;
  days.emplace_back(g_dir, 5, 16, 0);
  Loader a(days, 4, 0, 1, 0, nullptr, /*seed=*/42);
  Loader c(days, 4, 0, 1, 0, nullptr, /*seed=*/42);
  ASSERT_TRUE(a.h != nullptr);
  std::set<int64_t> seen;
  std::vector<int64_t> order_a, order_c;
  Batch ba(4), bc(4);
  for (int bi = 0; bi < 4; ++bi) {
    ASSERT_EQ(ba.Fill(a.h), 4);
    ASSERT_EQ(bc.Fill(c.h), 4);
    for (int64_t e = 0; e < 4; ++e) {
      seen.insert(ba.Row(4, e));
      order_a.push_back(ba.Row(4, e));
      order_c.push_back(bc.Row(4, e));
    }
  }
  EXPECT_EQ(seen.size(), 16u);           // a permutation: every row once
  EXPECT_TRUE(order_a == order_c);       // same seed -> same order
  // epoch reseed changes the order but keeps full coverage
  api.reset(a.h, /*epoch=*/1);
  std::set<int64_t> seen1;
  std::vector<int64_t> order1;
  for (int bi = 0; bi < 4; ++bi) {
    ASSERT_EQ(ba.Fill(a.h), 4);
    for (int64_t e = 0; e < 4; ++e) {
      seen1.insert(ba.Row(4, e));
      order1.push_back(ba.Row(4, e));
    }
  }
  EXPECT_EQ(seen1.size(), 16u);
  EXPECT_TRUE(order1 != order_a);
}

TEST(CriteoLoader, ResetRewindsEpoch) {
  std::vector<Day> days;
  days.emplace_back(g_dir, 6, 4, 0);
  Loader l(days, 2);
  ASSERT_TRUE(l.h != nullptr);
  Batch b(2);
  ASSERT_EQ(b.Fill(l.h), 2);
  ASSERT_EQ(b.Fill(l.h), 2);
  EXPECT_EQ(b.Fill(l.h), 0);
  api.reset(l.h, 0);
  ASSERT_EQ(b.Fill(l.h), 2);
  EXPECT_EQ(b.Row(2, 0), 0);  // identity order again
}

TEST(CriteoLoader, Int32SparseAndDropLast) {
  std::vector<Day> days;
  days.emplace_back(g_dir, 7, 7, 0, /*sparse_i4=*/true);
  Loader l(days, 2);  // 7 rows, B=2 -> 3 batches (drop_last)
  ASSERT_TRUE(l.h != nullptr);
  EXPECT_EQ(api.num_batches(l.h), 3);
  Batch b(2);
  ASSERT_EQ(b.Fill(l.h), 2);
  EXPECT_EQ(b.sparse[1 * 2 + 1], 1001);  // feature 1 of row 1
}

TEST(CriteoLoader, BadPathReturnsNull) {
  const char* nope[] = {"/nonexistent/x.npy"};
  EXPECT_TRUE(api.create(nope, nope, nope, 1, 2, 0, 1, 0, nullptr, -1, 2) ==
              nullptr);
}

}  // namespace

int main(int argc, char** argv) {
  const char* so = argc > 1 ? argv[1] : "libcriteo.so";
  void* lib = dlopen(so, RTLD_NOW);
  if (!lib) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", so, dlerror());
    return 2;
  }
  api.create = reinterpret_cast<CreateFn>(dlsym(lib, "cl_create"));
  api.next = reinterpret_cast<NextFn>(dlsym(lib, "cl_next"));
  api.num_batches = reinterpret_cast<NumFn>(dlsym(lib, "cl_num_batches"));
  api.reset = reinterpret_cast<ResetFn>(dlsym(lib, "cl_reset"));
  api.destroy = reinterpret_cast<DestroyFn>(dlsym(lib, "cl_destroy"));
  if (!api.create || !api.next || !api.num_batches || !api.reset ||
      !api.destroy) {
    std::fprintf(stderr, "missing cl_* symbol in %s\n", so);
    return 2;
  }
  char tmpl[] = "/tmp/criteo_test_XXXXXX";
  g_dir = mkdtemp(tmpl);
  return minitest::run_all("criteo_loader_test");
}
