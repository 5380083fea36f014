// Inference serving front-end: cross-request batching queue, result
// splitter, and admission control.
//
// Role parity with the reference's C++ serving stack
// (torchrec/inference/inference_legacy/include/torchrec/inference/
// BatchingQueue.h:40 — cross-request combine with batching funcs;
// ResultSplit.h:16 — un-batching; ResourceManager.h:29 — overload
// admission; GPUExecutor.h:39 — executor pool). Re-designed for the TPU
// build: the executor is the HOST thread that runs the AOT-compiled
// XLA/JAX predictor, so the C++ side owns request queueing, batch
// assembly (fixed batch size -> one compiled program), result splitting
// and admission; Python pulls assembled batches and pushes back outputs
// through a C ABI (ctypes).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -pthread -o libserving.so serving.cc

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Request {
  int64_t ticket;
  std::vector<float> dense;      // [num_dense]
  std::vector<int64_t> ids;      // flattened sparse ids
  std::vector<int32_t> lengths;  // [num_sparse_features]
};

struct Result {
  std::vector<float> out;
  bool ready = false;
  std::chrono::steady_clock::time_point submit_time;
};

// Observer: QPS/latency counters (reference Observer.h — per-server
// qps/latency/batch-size observers updated by BatchingQueue/GPUExecutor).
// Log2-bucketed end-to-end latency histogram: bucket k = [2^k, 2^(k+1)) us.
constexpr int kLatBuckets = 32;
struct Stats {
  int64_t submitted = 0;
  int64_t rejected = 0;
  int64_t completed = 0;
  int64_t timeouts = 0;
  int64_t batches = 0;
  int64_t batched_requests = 0;
  int64_t latency_sum_us = 0;
  int64_t latency_hist[kLatBuckets] = {0};
};

class BatchingQueue {
 public:
  BatchingQueue(int64_t max_batch, int64_t timeout_us, int64_t max_in_flight,
                int64_t num_dense, int64_t num_sparse, int64_t out_dim)
      : max_batch_(max_batch),
        timeout_us_(timeout_us),
        max_in_flight_(max_in_flight),
        num_dense_(num_dense),
        num_sparse_(num_sparse),
        out_dim_(out_dim),
        next_ticket_(1),
        in_flight_(0),
        stopped_(false) {}

  // ResourceManager admission: returns ticket > 0, or 0 when over limit
  // (reference ResourceManager.h:29 rejects when outstanding > threshold).
  int64_t Submit(const float* dense, const int64_t* ids,
                 const int32_t* lengths) {
    std::unique_lock<std::mutex> lk(mu_);
    if (stopped_) return 0;
    if (in_flight_ >= max_in_flight_) {
      ++stats_.rejected;
      return 0;  // admission reject
    }
    ++stats_.submitted;
    int64_t t = next_ticket_++;
    Request r;
    r.ticket = t;
    r.dense.assign(dense, dense + num_dense_);
    r.lengths.assign(lengths, lengths + num_sparse_);
    int64_t total = 0;
    for (int64_t i = 0; i < num_sparse_; ++i) total += lengths[i];
    r.ids.assign(ids, ids + total);
    queue_.push_back(std::move(r));
    Result res;
    res.submit_time = std::chrono::steady_clock::now();
    results_.emplace(t, std::move(res));
    ++in_flight_;
    cv_batch_.notify_one();
    return t;
  }

  // Executor side: blocks until >=1 request or stop; assembles up to
  // max_batch requests (BatchingQueue.h combine). Returns the number of
  // requests in the batch; fills caller buffers (padded to max_batch):
  //   dense [max_batch, num_dense], lengths [num_sparse, max_batch]
  //   (feature-major like a KJT), ids [capacity], tickets [max_batch].
  int64_t GetBatch(float* dense, int64_t* ids, int32_t* lengths,
                   int64_t* tickets, int64_t ids_capacity) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_batch_.wait_for(lk, std::chrono::microseconds(timeout_us_),
                       [&] { return !queue_.empty() || stopped_; });
    if (queue_.empty()) return stopped_ ? -1 : 0;
    int64_t n = std::min<int64_t>(max_batch_, queue_.size());
    std::vector<Request> reqs;
    for (int64_t i = 0; i < n; ++i) {
      reqs.push_back(std::move(queue_.front()));
      queue_.pop_front();
    }
    ++stats_.batches;
    stats_.batched_requests += n;
    lk.unlock();

    std::memset(dense, 0, sizeof(float) * max_batch_ * num_dense_);
    std::memset(lengths, 0, sizeof(int32_t) * num_sparse_ * max_batch_);
    std::memset(ids, 0, sizeof(int64_t) * ids_capacity);
    // feature-major id stream: for f in features: for b in batch: ids of (f, b)
    int64_t pos = 0;
    for (int64_t f = 0; f < num_sparse_; ++f) {
      for (int64_t b = 0; b < n; ++b) {
        const Request& r = reqs[b];
        int64_t off = 0;
        for (int64_t k = 0; k < f; ++k) off += r.lengths[k];
        int32_t len = r.lengths[f];
        if (pos + len > ids_capacity) len = 0;  // overflow guard: drop ids
        std::memcpy(ids + pos, r.ids.data() + off, sizeof(int64_t) * len);
        lengths[f * max_batch_ + b] = len;
        pos += len;
      }
    }
    for (int64_t b = 0; b < n; ++b) {
      std::memcpy(dense + b * num_dense_, reqs[b].dense.data(),
                  sizeof(float) * num_dense_);
      tickets[b] = reqs[b].ticket;
    }
    return n;
  }

  // Executor pushes back [n, out_dim] outputs; ResultSplit: fan the rows
  // back out to per-ticket results (ResultSplit.h:16).
  void PutResults(const int64_t* tickets, const float* out, int64_t n) {
    std::lock_guard<std::mutex> lk(mu_);
    for (int64_t i = 0; i < n; ++i) {
      auto it = results_.find(tickets[i]);
      if (it == results_.end()) continue;
      it->second.out.assign(out + i * out_dim_, out + (i + 1) * out_dim_);
      it->second.ready = true;
    }
    cv_result_.notify_all();
  }

  // Client side: blocks for its ticket's result; returns 1 on success,
  // 0 on timeout, -1 on unknown ticket. Timeout ABANDONS the ticket: the
  // result slot and admission credit are released (a late PutResults row
  // for it is dropped) — otherwise timed-out clients would wedge the
  // queue at max_in_flight forever.
  int64_t WaitResult(int64_t ticket, float* out, int64_t timeout_us) {
    std::unique_lock<std::mutex> lk(mu_);
    auto it = results_.find(ticket);
    if (it == results_.end()) return -1;
    bool ok = cv_result_.wait_for(
        lk, std::chrono::microseconds(timeout_us),
        [&] { return results_[ticket].ready || stopped_; });
    it = results_.find(ticket);
    if (!ok || !it->second.ready) {
      ++stats_.timeouts;
      results_.erase(it);
      --in_flight_;
      return 0;
    }
    std::memcpy(out, it->second.out.data(), sizeof(float) * out_dim_);
    int64_t us = std::chrono::duration_cast<std::chrono::microseconds>(
                     std::chrono::steady_clock::now() -
                     it->second.submit_time)
                     .count();
    ++stats_.completed;
    stats_.latency_sum_us += us;
    int b = 0;
    while (b + 1 < kLatBuckets && (int64_t{1} << (b + 1)) <= us) ++b;
    ++stats_.latency_hist[b];
    results_.erase(it);
    --in_flight_;
    return 1;
  }

  void Stop() {
    std::lock_guard<std::mutex> lk(mu_);
    stopped_ = true;
    cv_batch_.notify_all();
    cv_result_.notify_all();
  }

  int64_t InFlight() const {
    std::lock_guard<std::mutex> lk(mu_);
    return in_flight_;
  }

  // Fills out[0..6] = submitted, rejected, completed, timeouts, batches,
  // batched_requests, latency_sum_us; out[7..38] = latency histogram.
  void GetStats(int64_t* out) const {
    std::lock_guard<std::mutex> lk(mu_);
    out[0] = stats_.submitted;
    out[1] = stats_.rejected;
    out[2] = stats_.completed;
    out[3] = stats_.timeouts;
    out[4] = stats_.batches;
    out[5] = stats_.batched_requests;
    out[6] = stats_.latency_sum_us;
    for (int i = 0; i < kLatBuckets; ++i) out[7 + i] = stats_.latency_hist[i];
  }

 private:
  const int64_t max_batch_, timeout_us_, max_in_flight_;
  const int64_t num_dense_, num_sparse_, out_dim_;
  mutable std::mutex mu_;
  std::condition_variable cv_batch_, cv_result_;
  std::deque<Request> queue_;
  std::unordered_map<int64_t, Result> results_;
  int64_t next_ticket_;
  int64_t in_flight_;
  bool stopped_;
  Stats stats_;
};

}  // namespace

extern "C" {

void* bq_create(int64_t max_batch, int64_t timeout_us, int64_t max_in_flight,
                int64_t num_dense, int64_t num_sparse, int64_t out_dim) {
  return new BatchingQueue(max_batch, timeout_us, max_in_flight, num_dense,
                           num_sparse, out_dim);
}
void bq_destroy(void* h) { delete static_cast<BatchingQueue*>(h); }
int64_t bq_submit(void* h, const float* dense, const int64_t* ids,
                  const int32_t* lengths) {
  return static_cast<BatchingQueue*>(h)->Submit(dense, ids, lengths);
}
int64_t bq_get_batch(void* h, float* dense, int64_t* ids, int32_t* lengths,
                     int64_t* tickets, int64_t ids_capacity) {
  return static_cast<BatchingQueue*>(h)->GetBatch(dense, ids, lengths, tickets,
                                                  ids_capacity);
}
void bq_put_results(void* h, const int64_t* tickets, const float* out,
                    int64_t n) {
  static_cast<BatchingQueue*>(h)->PutResults(tickets, out, n);
}
int64_t bq_wait_result(void* h, int64_t ticket, float* out,
                       int64_t timeout_us) {
  return static_cast<BatchingQueue*>(h)->WaitResult(ticket, out, timeout_us);
}
void bq_stop(void* h) { static_cast<BatchingQueue*>(h)->Stop(); }
int64_t bq_in_flight(void* h) {
  return static_cast<BatchingQueue*>(h)->InFlight();
}
void bq_stats(void* h, int64_t* out) {
  static_cast<BatchingQueue*>(h)->GetStats(out);
}

}  // extern "C"
