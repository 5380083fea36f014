// IO provider registry + built-in backends for the parameter server.
//
// Reference analogs: torchrec/csrc/dynamic_embedding/details/io_registry.cpp
// (provider map + dlopen plugin loading) and details/redis/redis_io.cpp
// (external KV backend). TPU-first differences: providers are synchronous
// (the PS runs host-side in the input pipeline; no torch streams), and the
// durable backend is an append-only log FILE standing in for Redis — same
// plugin ABI a real network backend would use (tde_io.h).
//
// Built-ins:
//   "memory" — process-lifetime unordered_map (the default tier).
//   "file"   — write-through append-only log; initialize() replays the log
//              so rows survive process restarts (cfg = log path).

#include "tde_io.h"

#include <dlfcn.h>

#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ------------------------------------------------------------------ memory
struct MemStore {
  std::mutex mu;
  int64_t dim;
  std::unordered_map<int64_t, std::vector<float>> rows;
};

void* mem_init(const char* /*cfg*/, int64_t dim) {
  auto* s = new MemStore();
  s->dim = dim;
  return s;
}

void mem_push(void* inst, const int64_t* gids, const float* rows, int64_t n,
              int64_t dim) {
  auto* s = static_cast<MemStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  for (int64_t i = 0; i < n; ++i) {
    s->rows[gids[i]].assign(rows + i * dim, rows + (i + 1) * dim);
  }
}

int64_t mem_pull(void* inst, const int64_t* gids, float* rows, int64_t n,
                 int64_t dim) {
  auto* s = static_cast<MemStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  int64_t hits = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto it = s->rows.find(gids[i]);
    if (it == s->rows.end()) {
      std::memset(rows + i * dim, 0, sizeof(float) * dim);
    } else {
      std::memcpy(rows + i * dim, it->second.data(), sizeof(float) * dim);
      ++hits;
    }
  }
  return hits;
}

int64_t mem_scan(void* inst, int64_t* gids, float* rows, int64_t max_n,
                 int64_t dim) {
  auto* s = static_cast<MemStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  int64_t k = 0;
  for (const auto& kv : s->rows) {
    if (k >= max_n) break;
    gids[k] = kv.first;
    std::memcpy(rows + k * dim, kv.second.data(), sizeof(float) * dim);
    ++k;
  }
  return k;
}

int64_t mem_size(void* inst) {
  auto* s = static_cast<MemStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  return static_cast<int64_t>(s->rows.size());
}

void mem_fini(void* inst) { delete static_cast<MemStore*>(inst); }

const TdeIOProvider kMemoryProvider = {
    "memory", mem_init, mem_push, mem_pull, mem_scan, mem_size, mem_fini,
};

// -------------------------------------------------------------------- file
// Append-only write-through log. Record: [int64 gid][float row[dim]].
// Duplicate gids: last record wins on replay (overwrite semantics). A
// restart replays the whole log into the in-memory map — the durability
// contract a Redis-style backend provides, minus the network.
struct FileStore {
  std::mutex mu;
  int64_t dim;
  std::string path;
  std::FILE* log = nullptr;
  std::unordered_map<int64_t, std::vector<float>> rows;
};

void* file_init(const char* cfg, int64_t dim) {
  if (!cfg || !*cfg) return nullptr;
  auto* s = new FileStore();
  s->dim = dim;
  s->path = cfg;
  // replay any existing log
  if (std::FILE* f = std::fopen(cfg, "rb")) {
    const size_t rec = sizeof(int64_t) + sizeof(float) * dim;
    std::vector<unsigned char> buf(rec);
    while (std::fread(buf.data(), 1, rec, f) == rec) {
      int64_t gid;
      std::memcpy(&gid, buf.data(), sizeof(int64_t));
      auto& v = s->rows[gid];
      v.resize(dim);
      std::memcpy(v.data(), buf.data() + sizeof(int64_t),
                  sizeof(float) * dim);
    }
    std::fclose(f);
  }
  s->log = std::fopen(cfg, "ab");
  if (!s->log) {
    delete s;
    return nullptr;
  }
  return s;
}

void file_push(void* inst, const int64_t* gids, const float* rows, int64_t n,
               int64_t dim) {
  auto* s = static_cast<FileStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  for (int64_t i = 0; i < n; ++i) {
    s->rows[gids[i]].assign(rows + i * dim, rows + (i + 1) * dim);
    std::fwrite(&gids[i], sizeof(int64_t), 1, s->log);
    std::fwrite(rows + i * dim, sizeof(float), dim, s->log);
  }
  std::fflush(s->log);
}

int64_t file_pull(void* inst, const int64_t* gids, float* rows, int64_t n,
                  int64_t dim) {
  auto* s = static_cast<FileStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  int64_t hits = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto it = s->rows.find(gids[i]);
    if (it == s->rows.end()) {
      std::memset(rows + i * dim, 0, sizeof(float) * dim);
    } else {
      std::memcpy(rows + i * dim, it->second.data(), sizeof(float) * dim);
      ++hits;
    }
  }
  return hits;
}

int64_t file_scan(void* inst, int64_t* gids, float* rows, int64_t max_n,
                  int64_t dim) {
  auto* s = static_cast<FileStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  int64_t k = 0;
  for (const auto& kv : s->rows) {
    if (k >= max_n) break;
    gids[k] = kv.first;
    std::memcpy(rows + k * dim, kv.second.data(), sizeof(float) * dim);
    ++k;
  }
  return k;
}

int64_t file_size(void* inst) {
  auto* s = static_cast<FileStore*>(inst);
  std::lock_guard<std::mutex> g(s->mu);
  return static_cast<int64_t>(s->rows.size());
}

void file_fini(void* inst) {
  auto* s = static_cast<FileStore*>(inst);
  if (s->log) std::fclose(s->log);
  delete s;
}

const TdeIOProvider kFileProvider = {
    "file", file_init, file_push, file_pull, file_scan, file_size, file_fini,
};

// ---------------------------------------------------------------- registry
struct Registry {
  std::mutex mu;
  std::map<std::string, TdeIOProvider> providers;
  std::vector<void*> dls;  // leaked intentionally: plugins live for process

  Registry() {
    providers["memory"] = kMemoryProvider;
    providers["file"] = kFileProvider;
  }
};

Registry& registry() {
  static Registry r;
  return r;
}

}  // namespace

extern "C" {

int tde_io_register_provider(const TdeIOProvider* provider) {
  if (!provider || !provider->type || !provider->initialize ||
      !provider->push || !provider->pull) {
    return 1;
  }
  Registry& r = registry();
  std::lock_guard<std::mutex> g(r.mu);
  // duplicate type names are REJECTED, not overwritten: live
  // ParameterServer instances hold pointers into this map (tde_io_resolve)
  // and an in-place overwrite would redirect their dispatch to another
  // provider's functions with the old provider's instance handle
  if (r.providers.count(provider->type)) return 4;
  r.providers[provider->type] = *provider;
  return 0;
}

int tde_io_register_plugin(const char* sofile) {
  void* dl = dlopen(sofile, RTLD_NOW | RTLD_LOCAL);
  if (!dl) return 1;
  using GetFn = const TdeIOProvider* (*)();
  auto get = reinterpret_cast<GetFn>(dlsym(dl, "tde_io_provider"));
  if (!get) {
    dlclose(dl);
    return 2;
  }
  const TdeIOProvider* p = get();
  int rc = tde_io_register_provider(p);
  if (rc != 0) {
    dlclose(dl);
    return rc == 4 ? 4 : 3;  // 4 = name already registered
  }
  registry().dls.push_back(dl);
  return 0;
}

const TdeIOProvider* tde_io_resolve(const char* name) {
  Registry& r = registry();
  std::lock_guard<std::mutex> g(r.mu);
  auto it = r.providers.find(name ? name : "memory");
  if (it == r.providers.end()) return nullptr;
  return &it->second;
}

}  // extern "C"
