// Native tests for the serving front-end (reference analogs:
// torchrec/inference/tests/BatchingQueueTest.cpp, ResultSplitTest.cpp).
// gtest-style via minitest.h; drives the C ABI of the built libserving.so
// through dlopen, the exact surface Python uses.
//
// argv[1] = path to libserving.so (default "libserving.so")

#include <dlfcn.h>

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include "minitest.h"

using CreateFn = void* (*)(int64_t, int64_t, int64_t, int64_t, int64_t,
                           int64_t);
using SubmitFn = int64_t (*)(void*, const float*, const int64_t*,
                             const int32_t*);
using GetBatchFn = int64_t (*)(void*, float*, int64_t*, int32_t*, int64_t*,
                               int64_t);
using PutFn = void (*)(void*, const int64_t*, const float*, int64_t);
using WaitFn = int64_t (*)(void*, int64_t, float*, int64_t);
using StatsFn = void (*)(void*, int64_t*);
using InFlightFn = int64_t (*)(void*);
using VoidFn = void (*)(void*);

namespace {

struct Api {
  CreateFn create;
  SubmitFn submit;
  GetBatchFn get_batch;
  PutFn put;
  WaitFn wait;
  StatsFn stats;
  InFlightFn in_flight;
  VoidFn stop;
  VoidFn destroy;
} api;

}  // namespace

TEST(BatchAssembly, FeatureMajorAndOrderPreserving) {
  void* q = api.create(/*max_batch=*/4, /*timeout_us=*/50000, /*in_flight=*/8,
                       /*num_dense=*/2, /*num_sparse=*/2, /*out_dim=*/1);
  float d1[2] = {1.f, 2.f}, d2[2] = {3.f, 4.f};
  int64_t ids1[3] = {10, 11, 20};
  int32_t len1[2] = {2, 1};
  int64_t ids2[3] = {12, 21, 22};
  int32_t len2[2] = {1, 2};
  int64_t t1 = api.submit(q, d1, ids1, len1);
  int64_t t2 = api.submit(q, d2, ids2, len2);
  EXPECT_TRUE(t1 > 0);
  EXPECT_TRUE(t2 > 0 && t2 != t1);

  float dense[4 * 2];
  int64_t ids[64];
  int32_t lengths[2 * 4];
  int64_t tickets[4];
  ASSERT_EQ(api.get_batch(q, dense, ids, lengths, tickets, 64), 2);
  const int64_t want_ids[6] = {10, 11, 12, 20, 21, 22};
  EXPECT_TRUE(std::memcmp(ids, want_ids, sizeof(want_ids)) == 0);
  EXPECT_EQ(lengths[0], 2);  // f0: ex0=2, ex1=1
  EXPECT_EQ(lengths[1], 1);
  EXPECT_EQ(lengths[4], 1);  // f1
  EXPECT_EQ(lengths[5], 2);
  EXPECT_FLOAT_EQ(dense[0], 1.f);
  EXPECT_FLOAT_EQ(dense[2], 3.f);

  // result split: rows fan back out to the right tickets
  float out[2] = {d1[0] * 10, d2[0] * 10};
  api.put(q, tickets, out, 2);
  float r = 0;
  EXPECT_EQ(api.wait(q, t1, &r, 1000000), 1);
  EXPECT_FLOAT_EQ(r, 10.f);
  EXPECT_EQ(api.wait(q, t2, &r, 1000000), 1);
  EXPECT_FLOAT_EQ(r, 30.f);
  EXPECT_EQ(api.wait(q, 999, &r, 1000), -1);  // unknown ticket
  api.stop(q);
  api.destroy(q);
}

TEST(BatchAssembly, CapsAtMaxBatch) {
  void* q = api.create(4, 50000, 16, 1, 1, 1);
  float d[1] = {0.f};
  int64_t ids[1] = {1};
  int32_t len[1] = {1};
  for (int i = 0; i < 6; ++i) EXPECT_TRUE(api.submit(q, d, ids, len) > 0);
  float dense[4];
  int64_t bids[16];
  int32_t lengths[4];
  int64_t tickets[4];
  EXPECT_EQ(api.get_batch(q, dense, bids, lengths, tickets, 16), 4);
  EXPECT_EQ(api.get_batch(q, dense, bids, lengths, tickets, 16), 2);
  api.stop(q);
  api.destroy(q);
}

TEST(BatchAssembly, EmptyQueueTimesOutWithoutBlocking) {
  void* q = api.create(4, /*timeout_us=*/20000, 8, 1, 1, 1);
  float dense[4];
  int64_t ids[16];
  int32_t lengths[4];
  int64_t tickets[4];
  auto t0 = std::chrono::steady_clock::now();
  EXPECT_EQ(api.get_batch(q, dense, ids, lengths, tickets, 16), 0);
  auto us = std::chrono::duration_cast<std::chrono::microseconds>(
                std::chrono::steady_clock::now() - t0)
                .count();
  EXPECT_TRUE(us >= 15000);   // respected the timeout...
  EXPECT_TRUE(us < 2000000);  // ...but did not hang
  api.stop(q);
  // after stop, the executor loop gets the shutdown signal
  EXPECT_EQ(api.get_batch(q, dense, ids, lengths, tickets, 16), -1);
  api.destroy(q);
}

TEST(Admission, RejectsOverInFlightAndCounts) {
  void* q = api.create(4, 50000, 8, 2, 2, 1);
  float d[2] = {1.f, 2.f};
  int64_t ids[3] = {10, 11, 20};
  int32_t len[2] = {2, 1};
  for (int i = 0; i < 8; ++i) EXPECT_TRUE(api.submit(q, d, ids, len) > 0);
  EXPECT_EQ(api.submit(q, d, ids, len), 0);  // over max_in_flight
  EXPECT_EQ(api.in_flight(q), 8);
  int64_t s[39];
  api.stats(q, s);
  EXPECT_EQ(s[0], 8);  // submitted
  EXPECT_EQ(s[1], 1);  // rejected
  api.stop(q);
  api.destroy(q);
}

TEST(Admission, TimeoutAbandonsTicketAndReleasesCapacity) {
  // a client that gives up must not wedge the queue at max_in_flight:
  // WaitResult timeout erases the ticket and frees its admission credit;
  // a late PutResults row for it is dropped.
  void* q = api.create(4, 50000, /*in_flight=*/2, 1, 1, 1);
  float d[1] = {1.f};
  int64_t ids[1] = {7};
  int32_t len[1] = {1};
  int64_t t1 = api.submit(q, d, ids, len);
  int64_t t2 = api.submit(q, d, ids, len);
  EXPECT_TRUE(t1 > 0 && t2 > 0);
  EXPECT_EQ(api.submit(q, d, ids, len), 0);  // full
  float r = 0;
  EXPECT_EQ(api.wait(q, t1, &r, /*timeout_us=*/2000), 0);  // gives up
  EXPECT_EQ(api.in_flight(q), 1);  // slot released
  EXPECT_EQ(api.wait(q, t1, &r, 1000), -1);  // ticket is gone
  int64_t t3 = api.submit(q, d, ids, len);  // admitted again
  EXPECT_TRUE(t3 > 0);
  // late result for the abandoned ticket is dropped; live ones complete
  float dense[4];
  int64_t bids[16];
  int32_t blens[4];
  int64_t tickets[4];
  int64_t n = api.get_batch(q, dense, bids, blens, tickets, 16);
  EXPECT_EQ(n, 3);  // t1 (stale), t2, t3 were all queued for batching
  float out[4] = {1.f, 2.f, 3.f, 4.f};
  api.put(q, tickets, out, n);
  EXPECT_EQ(api.wait(q, t2, &r, 1000000), 1);
  EXPECT_EQ(api.wait(q, t3, &r, 1000000), 1);
  EXPECT_EQ(api.in_flight(q), 0);
  api.stop(q);
  api.destroy(q);
}

TEST(Stats, LatencyHistogramCountsCompletions) {
  void* q = api.create(4, 50000, 8, 1, 1, 1);
  float d[1] = {5.f};
  int64_t ids[1] = {3};
  int32_t len[1] = {1};
  int64_t t1 = api.submit(q, d, ids, len);
  int64_t t2 = api.submit(q, d, ids, len);
  float dense[4];
  int64_t bids[16];
  int32_t lengths[4];
  int64_t tickets[4];
  int64_t n = api.get_batch(q, dense, bids, lengths, tickets, 16);
  ASSERT_EQ(n, 2);
  float out[2] = {1.f, 2.f};
  api.put(q, tickets, out, n);
  float r;
  EXPECT_EQ(api.wait(q, t1, &r, 1000000), 1);
  EXPECT_EQ(api.wait(q, t2, &r, 1000000), 1);
  int64_t s[39];
  api.stats(q, s);
  EXPECT_EQ(s[2], 2);  // completed
  EXPECT_EQ(s[4], 1);  // one batch...
  EXPECT_EQ(s[5], 2);  // ...of two requests
  int64_t hist_total = 0;
  for (int i = 7; i < 39; ++i) hist_total += s[i];
  EXPECT_EQ(hist_total, s[2]);  // histogram buckets sum to completions
  api.stop(q);
  api.destroy(q);
}

TEST(Concurrency, ManyProducersOneExecutorAllComplete) {
  // the production shape: client threads submit, one executor drains +
  // runs the model + fans results back; every client gets its own answer
  constexpr int kProducers = 4;
  constexpr int kPerProducer = 25;
  void* q = api.create(8, 5000, 256, 1, 1, 1);
  std::atomic<bool> done{false};
  std::thread executor([&] {
    float dense[8];
    int64_t ids[64];
    int32_t lengths[8];
    int64_t tickets[8];
    float out[8];
    while (!done.load()) {
      int64_t n = api.get_batch(q, dense, ids, lengths, tickets, 64);
      if (n <= 0) continue;
      for (int64_t i = 0; i < n; ++i) out[i] = dense[i] * 2.f;
      api.put(q, tickets, out, n);
    }
  });
  std::atomic<int> failures{0};
  std::vector<std::thread> producers;
  for (int p = 0; p < kProducers; ++p) {
    producers.emplace_back([&, p] {
      for (int i = 0; i < kPerProducer; ++i) {
        float d[1] = {float(p * 1000 + i)};
        int64_t ids1[1] = {i};
        int32_t len[1] = {1};
        int64_t t = api.submit(q, d, ids1, len);
        if (t <= 0) {
          ++failures;
          continue;
        }
        float r = -1.f;
        if (api.wait(q, t, &r, 2000000) != 1 || r != d[0] * 2.f) ++failures;
      }
    });
  }
  for (auto& t : producers) t.join();
  done.store(true);
  api.stop(q);
  executor.join();
  EXPECT_EQ(failures.load(), 0);
  int64_t s[39];
  api.stats(q, s);
  EXPECT_EQ(s[2], kProducers * kPerProducer);  // all completed
  api.destroy(q);
}

int main(int argc, char** argv) {
  const char* so = argc > 1 ? argv[1] : "libserving.so";
  void* lib = dlopen(so, RTLD_NOW);
  if (!lib) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", so, dlerror());
    return 2;
  }
  api.create = (CreateFn)dlsym(lib, "bq_create");
  api.submit = (SubmitFn)dlsym(lib, "bq_submit");
  api.get_batch = (GetBatchFn)dlsym(lib, "bq_get_batch");
  api.put = (PutFn)dlsym(lib, "bq_put_results");
  api.wait = (WaitFn)dlsym(lib, "bq_wait_result");
  api.stats = (StatsFn)dlsym(lib, "bq_stats");
  api.in_flight = (InFlightFn)dlsym(lib, "bq_in_flight");
  api.stop = (VoidFn)dlsym(lib, "bq_stop");
  api.destroy = (VoidFn)dlsym(lib, "bq_destroy");
  if (!api.create || !api.submit || !api.get_batch || !api.put || !api.wait ||
      !api.stats || !api.in_flight || !api.stop || !api.destroy) {
    std::fprintf(stderr, "missing C ABI symbols in %s\n", so);
    return 2;
  }
  return minitest::run_all("serving_test");
}
