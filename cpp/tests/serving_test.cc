// Native tests for the serving front-end (reference analogs:
// inference_legacy/tests/BatchingQueueTest.cpp, ResultSplitTest.cpp).
// Plain assert-based (no gtest in the image); exit 0 = pass.
//
// Build+run: g++ -O2 -std=c++17 -pthread serving_test.cc ../inference/serving.cc
// is NOT how this links — serving.cc has no header, so this test drives the
// C ABI of the built libserving.so via dlopen, the exact surface Python uses.

#include <dlfcn.h>

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

using CreateFn = void* (*)(int64_t, int64_t, int64_t, int64_t, int64_t,
                           int64_t);
using SubmitFn = int64_t (*)(void*, const float*, const int64_t*,
                             const int32_t*);
using GetBatchFn = int64_t (*)(void*, float*, int64_t*, int32_t*, int64_t*,
                               int64_t);
using PutFn = void (*)(void*, const int64_t*, const float*, int64_t);
using WaitFn = int64_t (*)(void*, int64_t, float*, int64_t);
using StatsFn = void (*)(void*, int64_t*);
using VoidFn = void (*)(void*);

int main(int argc, char** argv) {
  const char* so = argc > 1 ? argv[1] : "libserving.so";
  void* lib = dlopen(so, RTLD_NOW);
  if (!lib) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", so, dlerror());
    return 2;
  }
  auto create = (CreateFn)dlsym(lib, "bq_create");
  auto submit = (SubmitFn)dlsym(lib, "bq_submit");
  auto get_batch = (GetBatchFn)dlsym(lib, "bq_get_batch");
  auto put = (PutFn)dlsym(lib, "bq_put_results");
  auto wait = (WaitFn)dlsym(lib, "bq_wait_result");
  auto stats = (StatsFn)dlsym(lib, "bq_stats");
  auto stop = (VoidFn)dlsym(lib, "bq_stop");
  auto destroy = (VoidFn)dlsym(lib, "bq_destroy");
  assert(create && submit && get_batch && put && wait && stats && stop);

  // ---- batch assembly is feature-major and order-preserving ----
  void* q = create(/*max_batch=*/4, /*timeout_us=*/50000, /*in_flight=*/8,
                   /*num_dense=*/2, /*num_sparse=*/2, /*out_dim=*/1);
  float d1[2] = {1.f, 2.f}, d2[2] = {3.f, 4.f};
  int64_t ids1[3] = {10, 11, 20};
  int32_t len1[2] = {2, 1};
  int64_t ids2[3] = {12, 21, 22};
  int32_t len2[2] = {1, 2};
  int64_t t1 = submit(q, d1, ids1, len1);
  int64_t t2 = submit(q, d2, ids2, len2);
  assert(t1 > 0 && t2 > 0 && t2 != t1);

  float dense[4 * 2];
  int64_t ids[64];
  int32_t lengths[2 * 4];
  int64_t tickets[4];
  int64_t n = get_batch(q, dense, ids, lengths, tickets, 64);
  assert(n == 2);
  const int64_t want_ids[6] = {10, 11, 12, 20, 21, 22};
  assert(std::memcmp(ids, want_ids, sizeof(want_ids)) == 0);
  assert(lengths[0] == 2 && lengths[1] == 1);  // f0: ex0=2, ex1=1
  assert(lengths[4] == 1 && lengths[5] == 2);  // f1

  // ---- result split + per-ticket wait -----------------------------------
  float out[2] = {d1[0] * 10, d2[0] * 10};
  put(q, tickets, out, n);
  float r = 0;
  assert(wait(q, t1, &r, 1000000) == 1 && r == 10.f);
  assert(wait(q, t2, &r, 1000000) == 1 && r == 30.f);
  assert(wait(q, 999, &r, 1000) == -1);  // unknown ticket

  // ---- admission control + observer counters ----------------------------
  for (int i = 0; i < 8; ++i) {
    int64_t t = submit(q, d1, ids1, len1);
    assert(t > 0);
  }
  assert(submit(q, d1, ids1, len1) == 0);  // over max_in_flight
  int64_t s[39];
  stats(q, s);
  assert(s[0] == 10);               // submitted
  assert(s[1] == 1);                // rejected
  assert(s[2] == 2);                // completed
  assert(s[4] == 1 && s[5] == 2);   // one batch of 2
  int64_t hist_total = 0;
  for (int i = 7; i < 39; ++i) hist_total += s[i];
  assert(hist_total == s[2]);

  stop(q);
  destroy(q);
  std::puts("serving_test PASS");
  return 0;
}
