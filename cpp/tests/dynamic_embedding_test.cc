// Native tests for the dynamic-embedding C++ core (reference analogs:
// test/cpp/dynamic_embedding/ naive_id_transformer_test.cpp,
// mixed_lfu_lru_strategy_test.cpp; ps tests). assert-based, exit 0 = pass.
// Drives the C ABI of libtde.so via dlopen — the surface Python uses.

#include <dlfcn.h>
#include <unistd.h>

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <vector>

using CreateFn = void* (*)(int64_t);
using XformFn = int64_t (*)(void*, const int64_t*, int64_t*, int64_t,
                            int64_t*);
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

int main(int argc, char** argv) {
  const char* so = argc > 1 ? argv[1] : "libtde.so";
  void* lib = dlopen(so, RTLD_NOW);
  if (!lib) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", so, dlerror());
    return 2;
  }
  auto idt_create = (CreateFn)dlsym(lib, "idt_create");
  auto idt_transform = (XformFn)dlsym(lib, "idt_transform");
  auto idt_evict = (EvictFn)dlsym(lib, "idt_evict");
  auto idt_export = (ExportFn)dlsym(lib, "idt_export");
  auto idt_restore = (RestoreFn)dlsym(lib, "idt_restore");
  auto idt_size = (SizeFn)dlsym(lib, "idt_size");
  auto idt_destroy = (VoidFn)dlsym(lib, "idt_destroy");
  assert(idt_create && idt_transform && idt_evict && idt_export &&
         idt_restore && idt_size && idt_destroy);

  // ---- stable global->slot mapping, bounded capacity --------------------
  void* t = idt_create(/*capacity=*/4);
  int64_t gids[3] = {1000000007LL, 42, 1000000007LL};
  int64_t cids[3], fresh = -1;  // scalar out: count of newly mapped ids
  int64_t ok = idt_transform(t, gids, cids, 3, &fresh);
  assert(ok == 3);
  assert(cids[0] == cids[2]);            // same gid -> same slot
  assert(cids[0] != cids[1]);
  assert(fresh == 2);                    // two distinct new ids mapped
  assert(idt_size(t) == 2);

  // repeat lookup is stable
  int64_t cids2[3];
  idt_transform(t, gids, cids2, 3, &fresh);
  assert(cids2[0] == cids[0] && cids2[1] == cids[1]);
  assert(fresh == 0);

  // ---- fill to capacity, then evict makes room --------------------------
  int64_t more[2] = {7, 9};
  int64_t mc[2];
  idt_transform(t, more, mc, 2, &fresh);
  assert(idt_size(t) == 4);
  int64_t full[1] = {12345};
  int64_t fc[1];
  int64_t mapped = idt_transform(t, full, fc, 1, &fresh);
  assert(mapped == 0 && fc[0] == -1);  // full: unmapped marked -1
  int64_t egids[2], eslots[2];
  int64_t evicted = idt_evict(t, 2, egids, eslots);
  assert(evicted == 2);
  assert(idt_size(t) == 2);
  mapped = idt_transform(t, full, fc, 1, &fresh);
  assert(mapped == 1 && fresh == 1);

  // ---- export / restore round trip --------------------------------------
  int64_t xg[4], xs[4];
  int64_t n = idt_export(t, xg, xs, 4);
  assert(n == idt_size(t));
  void* t2 = idt_create(4);
  assert(idt_restore(t2, xg, xs, n) == n);
  // restored transformer maps the exported gids to the same slots
  for (int64_t i = 0; i < n; ++i) {
    int64_t c, f;
    idt_transform(t2, &xg[i], &c, 1, &f);
    assert(c == xs[i] && f == 0);
  }
  idt_destroy(t);
  idt_destroy(t2);

  // ---- parameter server push/pull ---------------------------------------
  auto ps_create = (CreateFn)dlsym(lib, "ps_create");
  auto ps_push = (PsPushFn)dlsym(lib, "ps_push");
  auto ps_pull = (PsPullFn)dlsym(lib, "ps_pull");
  auto ps_size = (SizeFn)dlsym(lib, "ps_size");
  auto ps_destroy = (VoidFn)dlsym(lib, "ps_destroy");
  assert(ps_create && ps_push && ps_pull && ps_size && ps_destroy);
  void* ps = ps_create(/*dim=*/4);
  int64_t rg[2] = {5, 900000000LL};
  float rows[8] = {1, 2, 3, 4, 5, 6, 7, 8};
  ps_push(ps, rg, rows, 2);
  assert(ps_size(ps) == 2);
  float back[8] = {0};
  int64_t hits = ps_pull(ps, rg, back, 2);
  assert(hits == 2);
  for (int i = 0; i < 8; ++i) assert(back[i] == rows[i]);
  int64_t miss[1] = {404};
  float mrow[4] = {9, 9, 9, 9};
  hits = ps_pull(ps, miss, mrow, 1);
  assert(hits == 0);
  ps_destroy(ps);

  // ---- targeted removal (policy-driven eviction) ------------------------
  auto idt_remove = (RemoveFn)dlsym(lib, "idt_remove");
  assert(idt_remove);
  void* t3 = idt_create(4);
  int64_t g3[3] = {10, 20, 30};
  int64_t c3[3], f3;
  idt_transform(t3, g3, c3, 3, &f3);
  assert(idt_size(t3) == 3);
  int64_t victims[2] = {c3[1], 99};  // one live slot, one bogus
  int64_t out_g[2], out_s[2];
  int64_t removed = idt_remove(t3, victims, 2, out_g, out_s);
  assert(removed == 1 && out_g[0] == 20 && out_s[0] == c3[1]);
  assert(idt_size(t3) == 2);
  // freed slot is reusable and the survivors still resolve
  int64_t g4[1] = {40};
  int64_t c4[1];
  assert(idt_transform(t3, g4, c4, 1, &f3) == 1);
  int64_t c5[2];
  int64_t g5[2] = {10, 30};
  idt_transform(t3, g5, c5, 2, &f3);
  assert(c5[0] == c3[0] && c5[1] == c3[2]);
  idt_destroy(t3);

  // ---- file storage provider: rows survive a simulated restart ----------
  // (the storage-plugin ABI of tde_io.h; reference io_registry/redis_io)
  auto ps_create2 = (PsCreate2Fn)dlsym(lib, "ps_create2");
  auto ps_scan = (PsPullFn)dlsym(lib, "ps_scan");
  assert(ps_create2 && ps_scan);
  char logp[256];
  std::snprintf(logp, sizeof logp, "/tmp/tde_io_test_%d.log", (int)getpid());
  std::remove(logp);
  void* fps = ps_create2(4, "file", logp);
  assert(fps);
  float frows[8] = {11, 12, 13, 14, 21, 22, 23, 24};
  int64_t fg[2] = {7, 1000000009LL};
  ps_push(fps, fg, frows, 2);
  // overwrite gid 7 (last record must win on replay)
  float frow2[4] = {91, 92, 93, 94};
  ps_push(fps, fg, frow2, 1);
  assert(ps_size(fps) == 2);
  ps_destroy(fps);  // process "dies"

  void* fps2 = ps_create2(4, "file", logp);  // restart: replay the log
  assert(fps2);
  assert(ps_size(fps2) == 2);
  float fback[8] = {0};
  assert(ps_pull(fps2, fg, fback, 2) == 2);
  for (int i = 0; i < 4; ++i) assert(fback[i] == frow2[i]);
  for (int i = 0; i < 4; ++i) assert(fback[4 + i] == frows[4 + i]);
  // scan walks the whole store (checkpoint dump)
  int64_t sg[4];
  float srows[16];
  int64_t sn = ps_scan(fps2, sg, srows, 4);
  assert(sn == 2);
  ps_destroy(fps2);
  std::remove(logp);

  // unknown provider fails cleanly
  assert(ps_create2(4, "no_such_backend", "") == nullptr);

  std::puts("dynamic_embedding_test PASS");
  return 0;
}
