// Dynamic-embedding ID transformer: unbounded global ids -> bounded cache
// slots, with mixed LFU/LRU eviction and an external-storage hook.
//
// Role parity with the reference's C++ sidecar
// (torchrec/csrc/dynamic_embedding/details/id_transformer.h:28 transform/
// evict/iterator contract, naive_id_transformer.h open-address map,
// mixed_lfu_lru_strategy.h eviction record, bitmap.h slot allocator).
// Re-designed for the TPU build: a C ABI (consumed via ctypes — no torch
// custom classes), power-of-two open addressing, and a frequency-capped
// LFU power-of-2 counter packed with an LRU timestamp so eviction order is
// (lowest freq, oldest access) — the reference's MixedLFULRUStrategy
// semantics.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o libtde.so id_transformer.cc \
//            io_registry.cc -ldl

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

#include "tde_io.h"

namespace {

constexpr int64_t kEmpty = INT64_MIN;
constexpr uint32_t kMaxFreqPower = 16;

struct Slot {
  int64_t global_id = kEmpty;
  uint32_t freq_power = 0;   // LFU: log2-ish visit count
  uint32_t last_time = 0;    // LRU: last access tick
};

class IDTransformer {
 public:
  explicit IDTransformer(int64_t capacity)
      : capacity_(capacity), size_(0), time_(0) {
    // open-addressing table sized 2x capacity (power of two)
    int64_t n = 1;
    while (n < capacity * 2) n <<= 1;
    mask_ = n - 1;
    table_.assign(n, -1);       // bucket -> slot index or -1
    slots_.resize(capacity);
    free_.reserve(capacity);
    for (int64_t i = capacity - 1; i >= 0; --i) free_.push_back(i);
  }

  // Returns number of ids transformed (== n on success); ids without a
  // slot when full keep cache_id = -1 (caller must evict + retry).
  // fresh_flags (may be null): per-id 1 iff the id was newly mapped this
  // call — callers use it to fresh-init recycled slots.
  int64_t Transform(const int64_t* global_ids, int64_t* cache_ids, int64_t n,
                    int64_t* newly_mapped /*out, may be null*/,
                    uint8_t* fresh_flags = nullptr) {
    std::lock_guard<std::mutex> g(mu_);
    ++time_;
    int64_t ok = 0, fresh = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t gid = global_ids[i];
      if (fresh_flags) fresh_flags[i] = 0;
      int64_t slot = Find(gid);
      if (slot < 0) {
        if (free_.empty()) {
          cache_ids[i] = -1;
          continue;
        }
        slot = free_.back();
        free_.pop_back();
        slots_[slot].global_id = gid;
        slots_[slot].freq_power = 1;
        slots_[slot].last_time = static_cast<uint32_t>(time_);
        Insert(gid, slot);
        ++size_;
        ++fresh;
        if (fresh_flags) fresh_flags[i] = 1;
      } else {
        Slot& s = slots_[slot];
        if (s.freq_power < kMaxFreqPower) {
          // probabilistic power-of-2 counting like the reference's
          // MixedLFULRUStrategy: increment with prob 2^-freq, here
          // deterministically every 2^freq-th visit via the time tick
          if ((time_ & ((1u << s.freq_power) - 1)) == 0) s.freq_power++;
        }
        s.last_time = static_cast<uint32_t>(time_);
      }
      cache_ids[i] = slot;
      ++ok;
    }
    if (newly_mapped) *newly_mapped = fresh;
    return ok;
  }

  // Evict up to n_evict ids in (freq asc, last_time asc) order; returns the
  // number evicted; fills evicted global ids + their slots.
  int64_t Evict(int64_t n_evict, int64_t* evicted_gids, int64_t* evicted_slots) {
    std::lock_guard<std::mutex> g(mu_);
    // collect occupied slots and partial-sort by (freq, time); slots
    // touched in the CURRENT tick are pinned — otherwise an evict/retry
    // loop for a batch larger than the free space would evict the batch's
    // own ids and never converge
    std::vector<int64_t> occ;
    occ.reserve(size_);
    for (int64_t i = 0; i < capacity_; ++i) {
      if (slots_[i].global_id != kEmpty &&
          slots_[i].last_time != static_cast<uint32_t>(time_))
        occ.push_back(i);
    }
    auto key = [&](int64_t s) {
      return (static_cast<uint64_t>(slots_[s].freq_power) << 32) |
             slots_[s].last_time;
    };
    if (n_evict > static_cast<int64_t>(occ.size()))
      n_evict = static_cast<int64_t>(occ.size());
    std::partial_sort(occ.begin(), occ.begin() + n_evict, occ.end(),
                      [&](int64_t a, int64_t b) { return key(a) < key(b); });
    for (int64_t i = 0; i < n_evict; ++i) {
      int64_t slot = occ[i];
      evicted_gids[i] = slots_[slot].global_id;
      evicted_slots[i] = slot;
      slots_[slot] = Slot();
      free_.push_back(slot);
      --size_;
    }
    // rebuild the bucket table: per-id tombstones would otherwise deplete
    // the empty buckets and make Find() probe forever once every bucket is
    // used-or-tombstone (open-addressing pathology under heavy churn)
    if (n_evict > 0) Rehash();
    return n_evict;
  }

  // Remove specific slots (policy-driven eviction from the virtual-table
  // eviction engine); returns the number removed and fills the removed
  // (gid, slot) pairs compacted — unknown/empty slots are skipped.
  int64_t Remove(const int64_t* slot_ids, int64_t n, int64_t* removed_gids,
                 int64_t* removed_slots) {
    std::lock_guard<std::mutex> g(mu_);
    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t slot = slot_ids[i];
      if (slot < 0 || slot >= capacity_ || slots_[slot].global_id == kEmpty)
        continue;
      removed_gids[k] = slots_[slot].global_id;
      removed_slots[k] = slot;
      ++k;
      slots_[slot] = Slot();
      free_.push_back(slot);
      --size_;
    }
    if (k > 0) Rehash();
    return k;
  }

  // Snapshot (gid, slot, freq, time) rows for checkpoint; returns count.
  int64_t Export(int64_t* gids, int64_t* slots, int64_t max_n) const {
    std::lock_guard<std::mutex> g(mu_);
    int64_t k = 0;
    for (int64_t i = 0; i < capacity_ && k < max_n; ++i) {
      if (slots_[i].global_id != kEmpty) {
        gids[k] = slots_[i].global_id;
        slots[k] = i;
        ++k;
      }
    }
    return k;
  }

  int64_t Restore(const int64_t* gids, const int64_t* slot_ids, int64_t n) {
    std::lock_guard<std::mutex> g(mu_);
    // validate the WHOLE batch before mutating anything: a partial restore
    // that returns early would leave restored slots still on the free list
    // (handed out again by the next Transform -> silent map corruption)
    std::vector<char> seen(capacity_, 0);
    for (int64_t i = 0; i < n; ++i) {
      int64_t slot = slot_ids[i];
      if (slot < 0 || slot >= capacity_ || slots_[slot].global_id != kEmpty ||
          seen[slot])
        return i;  // refuse inconsistent restore at row i; state untouched
      seen[slot] = 1;
    }
    for (int64_t i = 0; i < n; ++i) {
      int64_t slot = slot_ids[i];
      slots_[slot].global_id = gids[i];
      slots_[slot].freq_power = 1;
      slots_[slot].last_time = 0;
      Insert(gids[i], slot);
      ++size_;
    }
    // rebuild free list
    free_.clear();
    for (int64_t i = capacity_ - 1; i >= 0; --i)
      if (slots_[i].global_id == kEmpty) free_.push_back(i);
    return n;
  }

  int64_t size() const {
    std::lock_guard<std::mutex> g(mu_);
    return size_;
  }
  int64_t capacity() const { return capacity_; }

 private:
  int64_t Bucket(int64_t gid) const {
    uint64_t h = static_cast<uint64_t>(gid) * 0x9E3779B97F4A7C15ull;
    return static_cast<int64_t>(h & mask_);
  }
  int64_t Find(int64_t gid) const {
    int64_t b = Bucket(gid);
    for (int64_t probes = 0; probes <= mask_ && table_[b] != -1; ++probes) {
      if (table_[b] >= 0 && slots_[table_[b]].global_id == gid) return table_[b];
      b = (b + 1) & mask_;
    }
    return -1;
  }
  void Insert(int64_t gid, int64_t slot) {
    int64_t b = Bucket(gid);
    while (table_[b] >= 0) b = (b + 1) & mask_;
    table_[b] = slot;
  }
  void Rehash() {
    std::fill(table_.begin(), table_.end(), -1);
    for (int64_t i = 0; i < capacity_; ++i) {
      if (slots_[i].global_id != kEmpty) Insert(slots_[i].global_id, i);
    }
  }

  mutable std::mutex mu_;
  int64_t capacity_, size_, mask_;
  uint64_t time_;
  std::vector<int64_t> table_;
  std::vector<Slot> slots_;
  std::vector<int64_t> free_;
};

// ------------------------------------------------------------- parameter
// server: row store (the reference's ps.h LocalShard role) over a
// pluggable storage provider (tde_io.h; reference io_registry.cpp) —
// "memory" (default), "file" (durable log, the Redis stand-in), or any
// plugin registered via tde_io_register_plugin.

class ParameterServer {
 public:
  ParameterServer(int64_t dim, const char* provider, const char* cfg)
      : dim_(dim),
        prov_(tde_io_resolve(provider && *provider ? provider : "memory")) {
    inst_ = prov_ ? prov_->initialize(cfg ? cfg : "", dim) : nullptr;
  }
  ~ParameterServer() {
    if (ok() && prov_->finalize) prov_->finalize(inst_);
  }
  bool ok() const { return prov_ != nullptr && inst_ != nullptr; }

  void Push(const int64_t* gids, const float* rows, int64_t n) {
    prov_->push(inst_, gids, rows, n, dim_);
  }

  // Fetch rows; missing ids fill with zeros and report count fetched.
  int64_t Pull(const int64_t* gids, float* rows, int64_t n) const {
    return prov_->pull(inst_, gids, rows, n, dim_);
  }

  int64_t Scan(int64_t* gids, float* rows, int64_t max_n) const {
    return prov_->scan ? prov_->scan(inst_, gids, rows, max_n, dim_) : 0;
  }

  int64_t size() const {
    return prov_->size ? prov_->size(inst_) : 0;
  }

 private:
  int64_t dim_;
  const TdeIOProvider* prov_;
  void* inst_ = nullptr;
};

}  // namespace

extern "C" {

void* idt_create(int64_t capacity) { return new IDTransformer(capacity); }
void idt_destroy(void* h) { delete static_cast<IDTransformer*>(h); }
int64_t idt_transform(void* h, const int64_t* gids, int64_t* cids, int64_t n,
                      int64_t* newly_mapped) {
  return static_cast<IDTransformer*>(h)->Transform(gids, cids, n, newly_mapped);
}
int64_t idt_transform2(void* h, const int64_t* gids, int64_t* cids, int64_t n,
                       int64_t* newly_mapped, uint8_t* fresh_flags) {
  return static_cast<IDTransformer*>(h)->Transform(gids, cids, n, newly_mapped,
                                                   fresh_flags);
}
int64_t idt_evict(void* h, int64_t n, int64_t* egids, int64_t* eslots) {
  return static_cast<IDTransformer*>(h)->Evict(n, egids, eslots);
}
int64_t idt_remove(void* h, const int64_t* slot_ids, int64_t n,
                   int64_t* removed_gids, int64_t* removed_slots) {
  return static_cast<IDTransformer*>(h)->Remove(slot_ids, n, removed_gids,
                                                removed_slots);
}
int64_t idt_export(void* h, int64_t* gids, int64_t* slots, int64_t max_n) {
  return static_cast<IDTransformer*>(h)->Export(gids, slots, max_n);
}
int64_t idt_restore(void* h, const int64_t* gids, const int64_t* slots,
                    int64_t n) {
  return static_cast<IDTransformer*>(h)->Restore(gids, slots, n);
}
int64_t idt_size(void* h) { return static_cast<IDTransformer*>(h)->size(); }
int64_t idt_capacity(void* h) {
  return static_cast<IDTransformer*>(h)->capacity();
}

void* ps_create(int64_t dim) {
  return new ParameterServer(dim, "memory", "");
}
// provider-backed PS ("memory", "file", or a registered plugin); returns
// NULL if the provider is unknown or its initialize() fails.
void* ps_create2(int64_t dim, const char* provider, const char* cfg) {
  auto* ps = new ParameterServer(dim, provider, cfg);
  if (!ps->ok()) {
    delete ps;
    return nullptr;
  }
  return ps;
}
void ps_destroy(void* h) { delete static_cast<ParameterServer*>(h); }
int64_t ps_scan(void* h, int64_t* gids, float* rows, int64_t max_n) {
  return static_cast<ParameterServer*>(h)->Scan(gids, rows, max_n);
}
void ps_push(void* h, const int64_t* gids, const float* rows, int64_t n) {
  static_cast<ParameterServer*>(h)->Push(gids, rows, n);
}
int64_t ps_pull(void* h, const int64_t* gids, float* rows, int64_t n) {
  return static_cast<ParameterServer*>(h)->Pull(gids, rows, n);
}
int64_t ps_size(void* h) { return static_cast<ParameterServer*>(h)->size(); }

}  // extern "C"
