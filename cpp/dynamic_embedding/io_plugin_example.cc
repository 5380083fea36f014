// Example external storage-provider plugin for the parameter server.
//
// Role parity with the reference's Redis backend
// (torchrec/csrc/dynamic_embedding/details/redis/redis_io.cpp): a
// separately-compiled .so implementing the tde_io.h ABI, loaded at
// runtime with tde_io_register_plugin / register_io_plugin. This one
// stores each row as its own file under a directory (cfg = dir path) —
// trivially durable, and structurally what a networked KV backend looks
// like through the ABI.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -I. -o libtde_dirstore.so \
//            io_plugin_example.cc

#include "tde_io.h"

#include <sys/stat.h>

#include <cinttypes>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <mutex>
#include <string>

namespace {

struct DirStore {
  std::mutex mu;
  std::string dir;
};

std::string row_path(const DirStore* s, int64_t gid) {
  char name[64];
  // gids span the full int64 range; encode sign explicitly
  std::snprintf(name, sizeof name, "/%c%" PRIu64 ".row",
                gid < 0 ? 'n' : 'p',
                gid < 0 ? static_cast<uint64_t>(-(gid + 1))
                        : static_cast<uint64_t>(gid));
  return s->dir + name;
}

void* dir_init(const char* cfg, int64_t /*dim*/) {
  if (!cfg || !*cfg) return nullptr;
  ::mkdir(cfg, 0755);  // ok if it already exists
  struct stat st;
  if (::stat(cfg, &st) != 0 || !S_ISDIR(st.st_mode)) return nullptr;
  auto* s = new DirStore();
  s->dir = cfg;
  return s;
}

void dir_push(void* inst, const int64_t* gids, const float* rows, int64_t n,
              int64_t dim) {
  auto* s = static_cast<DirStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  for (int64_t i = 0; i < n; ++i) {
    if (std::FILE* f = std::fopen(row_path(s, gids[i]).c_str(), "wb")) {
      std::fwrite(rows + i * dim, sizeof(float), dim, f);
      std::fclose(f);
    }
  }
}

int64_t dir_pull(void* inst, const int64_t* gids, float* rows, int64_t n,
                 int64_t dim) {
  auto* s = static_cast<DirStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  int64_t hits = 0;
  for (int64_t i = 0; i < n; ++i) {
    std::FILE* f = std::fopen(row_path(s, gids[i]).c_str(), "rb");
    if (!f) {
      std::memset(rows + i * dim, 0, sizeof(float) * dim);
      continue;
    }
    if (std::fread(rows + i * dim, sizeof(float), dim, f) ==
        static_cast<size_t>(dim)) {
      ++hits;
    } else {
      std::memset(rows + i * dim, 0, sizeof(float) * dim);
    }
    std::fclose(f);
  }
  return hits;
}

int64_t decode_gid(const char* name, int64_t* out) {
  char sign;
  uint64_t mag;
  char tail[8];
  if (std::sscanf(name, "%c%" SCNu64 ".ro%1s", &sign, &mag, tail) != 3 ||
      (sign != 'p' && sign != 'n') || std::strcmp(tail, "w") != 0) {
    return 0;
  }
  *out = sign == 'n' ? -static_cast<int64_t>(mag) - 1
                     : static_cast<int64_t>(mag);
  return 1;
}

int64_t dir_scan(void* inst, int64_t* gids, float* rows, int64_t max_n,
                 int64_t dim) {
  auto* s = static_cast<DirStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  DIR* d = ::opendir(s->dir.c_str());
  if (!d) return 0;
  int64_t k = 0;
  while (struct dirent* e = ::readdir(d)) {
    if (k >= max_n) break;
    int64_t gid;
    if (!decode_gid(e->d_name, &gid)) continue;
    std::FILE* f = std::fopen((s->dir + "/" + e->d_name).c_str(), "rb");
    if (!f) continue;
    if (std::fread(rows + k * dim, sizeof(float), dim, f) ==
        static_cast<size_t>(dim)) {
      gids[k] = gid;
      ++k;
    }
    std::fclose(f);
  }
  ::closedir(d);
  return k;
}

int64_t dir_size(void* inst) {
  auto* s = static_cast<DirStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  DIR* d = ::opendir(s->dir.c_str());
  if (!d) return 0;
  int64_t k = 0;
  int64_t gid;
  while (struct dirent* e = ::readdir(d)) {
    if (decode_gid(e->d_name, &gid)) ++k;
  }
  ::closedir(d);
  return k;
}

void dir_fini(void* inst) { delete static_cast<DirStore*>(inst); }

const TdeIOProvider kDirProvider = {
    "dirstore", dir_init, dir_push, dir_pull, dir_scan, dir_size, dir_fini,
};

}  // namespace

extern "C" const TdeIOProvider* tde_io_provider(void) {
  return &kDirProvider;
}
