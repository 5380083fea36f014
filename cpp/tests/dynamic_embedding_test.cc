// Native tests for the dynamic-embedding C++ core (reference analogs:
// test/cpp/dynamic_embedding/ naive_id_transformer_test.cpp,
// mixed_lfu_lru_strategy_test.cpp, and the io_registry/redis_io tests).
// gtest-style via minitest.h; drives the C ABI of libtde.so through
// dlopen — the exact surface Python uses.
//
// argv[1] = path to libtde.so (default "libtde.so")
// argv[2] = optional path to the dirstore example plugin
//           (libtde_dirstore.so); the Plugin suite is skipped without it.

#include <dlfcn.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "minitest.h"

using CreateFn = void* (*)(int64_t);
using XformFn = int64_t (*)(void*, const int64_t*, int64_t*, int64_t,
                            int64_t*);
using Xform2Fn = int64_t (*)(void*, const int64_t*, int64_t*, int64_t,
                             int64_t*, uint8_t*);
using EvictFn = int64_t (*)(void*, int64_t, int64_t*, int64_t*);
using ExportFn = int64_t (*)(void*, int64_t*, int64_t*, int64_t);
using RestoreFn = int64_t (*)(void*, const int64_t*, const int64_t*, int64_t);
using SizeFn = int64_t (*)(void*);
using VoidFn = void (*)(void*);
using PsPushFn = void (*)(void*, const int64_t*, const float*, int64_t);
using PsPullFn = int64_t (*)(void*, const int64_t*, float*, int64_t);
using PsCreate2Fn = void* (*)(int64_t, const char*, const char*);
using RemoveFn = int64_t (*)(void*, const int64_t*, int64_t, int64_t*,
                             int64_t*);
using RegisterPluginFn = int (*)(const char*);

namespace {

struct Api {
  CreateFn idt_create;
  XformFn idt_transform;
  Xform2Fn idt_transform2;
  EvictFn idt_evict;
  RemoveFn idt_remove;
  ExportFn idt_export;
  RestoreFn idt_restore;
  SizeFn idt_size;
  SizeFn idt_capacity;
  VoidFn idt_destroy;
  CreateFn ps_create;
  PsCreate2Fn ps_create2;
  PsPushFn ps_push;
  PsPullFn ps_pull;
  PsPullFn ps_scan;
  SizeFn ps_size;
  VoidFn ps_destroy;
  RegisterPluginFn register_plugin;
} api;

std::string plugin_path;  // argv[2], empty = skip Plugin suite

}  // namespace

// ---- IDTransformer ---------------------------------------------------------

TEST(IdTransformer, StableMappingAndDedup) {
  void* t = api.idt_create(4);
  int64_t gids[3] = {1000000007LL, 42, 1000000007LL};
  int64_t cids[3], fresh = -1;
  ASSERT_EQ(api.idt_transform(t, gids, cids, 3, &fresh), 3);
  EXPECT_EQ(cids[0], cids[2]);  // same gid -> same slot
  EXPECT_NE(cids[0], cids[1]);
  EXPECT_EQ(fresh, 2);  // two distinct new ids mapped
  EXPECT_EQ(api.idt_size(t), 2);
  EXPECT_EQ(api.idt_capacity(t), 4);
  // repeat lookup is stable and not fresh
  int64_t cids2[3];
  api.idt_transform(t, gids, cids2, 3, &fresh);
  EXPECT_EQ(cids2[0], cids[0]);
  EXPECT_EQ(cids2[1], cids[1]);
  EXPECT_EQ(fresh, 0);
  api.idt_destroy(t);
}

TEST(IdTransformer, FreshFlagsPerId) {
  void* t = api.idt_create(4);
  int64_t warm[1] = {7};
  int64_t c[3], fresh;
  api.idt_transform(t, warm, c, 1, &fresh);
  int64_t gids[3] = {7, 11, 7};
  uint8_t flags[3] = {9, 9, 9};
  ASSERT_EQ(api.idt_transform2(t, gids, c, 3, &fresh, flags), 3);
  EXPECT_EQ(fresh, 1);
  EXPECT_EQ(flags[0], 0);  // pre-warmed
  EXPECT_EQ(flags[1], 1);  // newly mapped -> caller fresh-inits the slot
  EXPECT_EQ(flags[2], 0);  // duplicate within the call is not fresh twice
  api.idt_destroy(t);
}

TEST(IdTransformer, FullThenEvictMakesRoom) {
  void* t = api.idt_create(4);
  int64_t gids[4] = {1, 2, 3, 4}, cids[4], fresh;
  api.idt_transform(t, gids, cids, 4, &fresh);
  ASSERT_EQ(api.idt_size(t), 4);
  int64_t extra[1] = {12345}, ec[1];
  EXPECT_EQ(api.idt_transform(t, extra, ec, 1, &fresh), 0);
  EXPECT_EQ(ec[0], -1);  // full: unmapped marked -1, caller evicts + retries
  int64_t egids[2], eslots[2];
  EXPECT_EQ(api.idt_evict(t, 2, egids, eslots), 2);
  EXPECT_EQ(api.idt_size(t), 2);
  EXPECT_EQ(api.idt_transform(t, extra, ec, 1, &fresh), 1);
  EXPECT_EQ(fresh, 1);
  api.idt_destroy(t);
}

TEST(IdTransformer, EvictionIsLruAmongEqualFreqAndPinsCurrentTick) {
  // eviction order is (freq asc, last-access asc) — the reference's
  // MixedLFULRUStrategy. All-equal freq degrades to LRU; ids touched in
  // the current tick are pinned so an evict/retry loop can't evict the
  // in-flight batch's own ids.
  void* t = api.idt_create(4);
  int64_t c[1], fresh;
  int64_t a = 100, b = 200, d = 300;
  api.idt_transform(t, &a, c, 1, &fresh);  // tick 1
  api.idt_transform(t, &b, c, 1, &fresh);  // tick 2
  api.idt_transform(t, &d, c, 1, &fresh);  // tick 3
  api.idt_transform(t, &a, c, 1, &fresh);  // tick 4: a is now newest + pinned
  int64_t egids[2], eslots[2];
  ASSERT_EQ(api.idt_evict(t, 2, egids, eslots), 2);
  EXPECT_EQ(egids[0], b);  // oldest last-access first
  EXPECT_EQ(egids[1], d);
  // the pinned id survives and still resolves to its slot
  int64_t c2[1];
  api.idt_transform(t, &a, c2, 1, &fresh);
  EXPECT_EQ(fresh, 0);
  EXPECT_EQ(c2[0], c[0]);
  api.idt_destroy(t);
}

TEST(IdTransformer, ExportRestoreRoundTrip) {
  void* t = api.idt_create(4);
  int64_t gids[3] = {5, 9, 1000000009LL}, cids[3], fresh;
  api.idt_transform(t, gids, cids, 3, &fresh);
  int64_t xg[4], xs[4];
  int64_t n = api.idt_export(t, xg, xs, 4);
  ASSERT_EQ(n, api.idt_size(t));
  void* t2 = api.idt_create(4);
  ASSERT_EQ(api.idt_restore(t2, xg, xs, n), n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t c, f;
    api.idt_transform(t2, &xg[i], &c, 1, &f);
    EXPECT_EQ(c, xs[i]);
    EXPECT_EQ(f, 0);
  }
  api.idt_destroy(t);
  api.idt_destroy(t2);
}

TEST(IdTransformer, RestoreIsAtomicOnBadRows) {
  // a restore with ANY inconsistent row must leave the transformer fully
  // untouched — a partial restore leaves restored slots on the free list
  // and the next transform silently double-books them
  void* t = api.idt_create(4);
  int64_t gids[3] = {5, 9, 77}, slots_bad[3] = {0, 1, 99};  // 99 OOB
  EXPECT_EQ(api.idt_restore(t, gids, slots_bad, 3), 2);  // refused at row 2
  EXPECT_EQ(api.idt_size(t), 0);  // nothing landed
  int64_t slots_dup[3] = {0, 1, 1};  // duplicate slot in the batch
  EXPECT_EQ(api.idt_restore(t, gids, slots_dup, 3), 2);
  EXPECT_EQ(api.idt_size(t), 0);
  // the transformer still hands out 4 DISTINCT slots afterwards
  int64_t g[4] = {100, 200, 300, 400}, c[4], fresh;
  api.idt_transform(t, g, c, 4, &fresh);
  for (int i = 0; i < 4; ++i)
    for (int j = i + 1; j < 4; ++j) EXPECT_TRUE(c[i] != c[j]);
  // and a VALID restore still works
  void* t2 = api.idt_create(4);
  int64_t slots_ok[3] = {0, 1, 2};
  EXPECT_EQ(api.idt_restore(t2, gids, slots_ok, 3), 3);
  EXPECT_EQ(api.idt_size(t2), 3);
  api.idt_destroy(t);
  api.idt_destroy(t2);
}

TEST(IdTransformer, TargetedRemoveFreesSlots) {
  // policy-driven eviction: the virtual-table eviction tracker removes
  // specific slots (count/timestamp/L2 policies), not the LFU/LRU head
  void* t = api.idt_create(4);
  int64_t g[3] = {10, 20, 30}, c[3], fresh;
  api.idt_transform(t, g, c, 3, &fresh);
  int64_t victims[2] = {c[1], 99};  // one live slot, one bogus
  int64_t out_g[2], out_s[2];
  ASSERT_EQ(api.idt_remove(t, victims, 2, out_g, out_s), 1);
  EXPECT_EQ(out_g[0], 20);
  EXPECT_EQ(out_s[0], c[1]);
  EXPECT_EQ(api.idt_size(t), 2);
  // freed slot is reusable and the survivors still resolve
  int64_t g4 = 40, c4;
  EXPECT_EQ(api.idt_transform(t, &g4, &c4, 1, &fresh), 1);
  int64_t g5[2] = {10, 30}, c5[2];
  api.idt_transform(t, g5, c5, 2, &fresh);
  EXPECT_EQ(c5[0], c[0]);
  EXPECT_EQ(c5[1], c[2]);
  api.idt_destroy(t);
}

// ---- ParameterServer (host storage tier) ----------------------------------

TEST(ParameterServer, PushPullRoundTrip) {
  void* ps = api.ps_create(4);
  int64_t g[2] = {5, 900000000LL};
  float rows[8] = {1, 2, 3, 4, 5, 6, 7, 8};
  api.ps_push(ps, g, rows, 2);
  EXPECT_EQ(api.ps_size(ps), 2);
  float back[8] = {0};
  EXPECT_EQ(api.ps_pull(ps, g, back, 2), 2);
  for (int i = 0; i < 8; ++i) EXPECT_FLOAT_EQ(back[i], rows[i]);
  api.ps_destroy(ps);
}

TEST(ParameterServer, MissZeroFills) {
  void* ps = api.ps_create(4);
  int64_t miss = 404;
  float row[4] = {9, 9, 9, 9};
  EXPECT_EQ(api.ps_pull(ps, &miss, row, 1), 0);
  for (int i = 0; i < 4; ++i) EXPECT_FLOAT_EQ(row[i], 0.f);
  api.ps_destroy(ps);
}

TEST(ParameterServer, OverwriteKeepsLatest) {
  void* ps = api.ps_create(2);
  int64_t g = 7;
  float v1[2] = {1, 2}, v2[2] = {8, 9}, back[2];
  api.ps_push(ps, &g, v1, 1);
  api.ps_push(ps, &g, v2, 1);
  EXPECT_EQ(api.ps_size(ps), 1);
  EXPECT_EQ(api.ps_pull(ps, &g, back, 1), 1);
  EXPECT_FLOAT_EQ(back[0], 8.f);
  EXPECT_FLOAT_EQ(back[1], 9.f);
  api.ps_destroy(ps);
}

// ---- file storage provider (durable log backend) ---------------------------

TEST(FileProvider, RowsSurviveRestartAndLastWriteWins) {
  char logp[256];
  std::snprintf(logp, sizeof logp, "/tmp/tde_io_test_%d.log", (int)getpid());
  std::remove(logp);
  void* fps = api.ps_create2(4, "file", logp);
  ASSERT_TRUE(fps != nullptr);
  float rows[8] = {11, 12, 13, 14, 21, 22, 23, 24};
  int64_t g[2] = {7, 1000000009LL};
  api.ps_push(fps, g, rows, 2);
  float over[4] = {91, 92, 93, 94};  // last record must win on replay
  api.ps_push(fps, g, over, 1);
  EXPECT_EQ(api.ps_size(fps), 2);
  api.ps_destroy(fps);  // process "dies"

  void* fps2 = api.ps_create2(4, "file", logp);  // restart: replay the log
  ASSERT_TRUE(fps2 != nullptr);
  EXPECT_EQ(api.ps_size(fps2), 2);
  float back[8] = {0};
  EXPECT_EQ(api.ps_pull(fps2, g, back, 2), 2);
  for (int i = 0; i < 4; ++i) EXPECT_FLOAT_EQ(back[i], over[i]);
  for (int i = 0; i < 4; ++i) EXPECT_FLOAT_EQ(back[4 + i], rows[4 + i]);
  // scan walks the whole store (checkpoint dump)
  int64_t sg[4];
  float srows[16];
  EXPECT_EQ(api.ps_scan(fps2, sg, srows, 4), 2);
  api.ps_destroy(fps2);
  std::remove(logp);
}

TEST(FileProvider, UnknownProviderFailsCleanly) {
  EXPECT_TRUE(api.ps_create2(4, "no_such_backend", "") == nullptr);
}

// ---- dlopen plugin backend (reference redis_io analog) ----------------------

TEST(Plugin, DirstoreBackendThroughRegistry) {
  if (plugin_path.empty()) {
    std::puts("  (skipped: no plugin .so passed as argv[2])");
    return;
  }
  ASSERT_EQ(api.register_plugin(plugin_path.c_str()), 0);
  char dir[256];
  std::snprintf(dir, sizeof dir, "/tmp/tde_dirstore_test_%d", (int)getpid());
  void* ps = api.ps_create2(2, "dirstore", dir);
  ASSERT_TRUE(ps != nullptr);
  int64_t g[2] = {3, -17};  // negative gids must round-trip too
  float rows[4] = {1.5f, 2.5f, -3.5f, 4.5f};
  api.ps_push(ps, g, rows, 2);
  EXPECT_EQ(api.ps_size(ps), 2);
  api.ps_destroy(ps);
  // rows are durable: a fresh instance over the same dir sees them
  void* ps2 = api.ps_create2(2, "dirstore", dir);
  ASSERT_TRUE(ps2 != nullptr);
  float back[4] = {0};
  EXPECT_EQ(api.ps_pull(ps2, g, back, 2), 2);
  for (int i = 0; i < 4; ++i) EXPECT_FLOAT_EQ(back[i], rows[i]);
  int64_t sg[4];
  float srows[8];
  EXPECT_EQ(api.ps_scan(ps2, sg, srows, 4), 2);
  api.ps_destroy(ps2);
}

TEST(Plugin, DuplicateProviderNameIsRejected) {
  if (plugin_path.empty()) {
    std::puts("  (skipped: no plugin .so passed as argv[2])");
    return;
  }
  // the dirstore plugin is registered by the test above; re-registering
  // the same provider name must be REFUSED (rc 4), not overwritten —
  // live ParameterServers hold pointers into the registry
  EXPECT_EQ(api.register_plugin(plugin_path.c_str()), 4);
}

TEST(Plugin, BadPluginPathIsRejected) {
  EXPECT_NE(api.register_plugin("/no/such/plugin.so"), 0);
}

int main(int argc, char** argv) {
  const char* so = argc > 1 ? argv[1] : "libtde.so";
  if (argc > 2) plugin_path = argv[2];
  void* lib = dlopen(so, RTLD_NOW);
  if (!lib) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", so, dlerror());
    return 2;
  }
  api.idt_create = (CreateFn)dlsym(lib, "idt_create");
  api.idt_transform = (XformFn)dlsym(lib, "idt_transform");
  api.idt_transform2 = (Xform2Fn)dlsym(lib, "idt_transform2");
  api.idt_evict = (EvictFn)dlsym(lib, "idt_evict");
  api.idt_remove = (RemoveFn)dlsym(lib, "idt_remove");
  api.idt_export = (ExportFn)dlsym(lib, "idt_export");
  api.idt_restore = (RestoreFn)dlsym(lib, "idt_restore");
  api.idt_size = (SizeFn)dlsym(lib, "idt_size");
  api.idt_capacity = (SizeFn)dlsym(lib, "idt_capacity");
  api.idt_destroy = (VoidFn)dlsym(lib, "idt_destroy");
  api.ps_create = (CreateFn)dlsym(lib, "ps_create");
  api.ps_create2 = (PsCreate2Fn)dlsym(lib, "ps_create2");
  api.ps_push = (PsPushFn)dlsym(lib, "ps_push");
  api.ps_pull = (PsPullFn)dlsym(lib, "ps_pull");
  api.ps_scan = (PsPullFn)dlsym(lib, "ps_scan");
  api.ps_size = (SizeFn)dlsym(lib, "ps_size");
  api.ps_destroy = (VoidFn)dlsym(lib, "ps_destroy");
  api.register_plugin = (RegisterPluginFn)dlsym(lib, "tde_io_register_plugin");
  if (!api.idt_create || !api.idt_transform || !api.idt_transform2 ||
      !api.idt_evict || !api.idt_remove || !api.idt_export ||
      !api.idt_restore || !api.idt_size || !api.idt_capacity ||
      !api.idt_destroy || !api.ps_create || !api.ps_create2 || !api.ps_push ||
      !api.ps_pull || !api.ps_scan || !api.ps_size || !api.ps_destroy ||
      !api.register_plugin) {
    std::fprintf(stderr, "missing C ABI symbols in %s\n", so);
    return 2;
  }
  return minitest::run_all("dynamic_embedding_test");
}
