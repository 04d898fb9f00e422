// dfd_tpu native env pool — batched host-side environment stepping.
//
// The reference's answer to slow host envs is many single-threaded CPU client
// processes (reference run_client.py:15 pins torch to 1 thread).  This pool
// inverts that: one process steps N environment instances in lockstep across
// a thread pool, feeding either the elastic client topology or a host-driven
// population evaluator, with per-step python overhead amortized to one FFI
// call per batch.
//
// Implements the simple_trap_env dynamics (walkability-grid gather with the
// reference's action encoding dx = a/3 - 1, dy = a%3 - 1, out-of-range
// actions as no-ops, reward = +x progress in world units, 201-step episodes)
// plus a generic batch interface the python side drives via ctypes.
//
// Build: runtime/build.sh  ->  runtime/libdfd_envpool.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int kNodeRadius = 7;
constexpr float kMaxX = 1918.0f;
constexpr float kMaxY = 1071.0f;
constexpr int kEpisodeLength = 200;

struct TrapEnvState {
  int ix, iy, t;
};

class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false), pending_(0) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Loop(); });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  // Run fn(i) for i in [0, n) across the pool; blocks until all complete.
  void ParallelFor(int n, const std::function<void(int, int)>& fn) {
    int n_shards = static_cast<int>(workers_.size());
    if (n_shards <= 1 || n < 2 * n_shards) {
      fn(0, n);
      return;
    }
    int shard = (n + n_shards - 1) / n_shards;
    {
      std::unique_lock<std::mutex> lk(mu_);
      for (int s = 0; s < n_shards; ++s) {
        int lo = s * shard;
        int hi = lo + shard < n ? lo + shard : n;
        if (lo >= hi) break;
        tasks_.emplace_back([fn, lo, hi] { fn(lo, hi); });
        ++pending_;
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.back());
        tasks_.pop_back();
      }
      task();
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::vector<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  bool stop_;
  int pending_;
};

struct TrapPool {
  std::vector<uint8_t> walkable;  // h x w
  int h = 0, w = 0;
  int start_ix = 0, start_iy = 0;
  std::vector<TrapEnvState> envs;
  ThreadPool* threads = nullptr;
};

inline void StepOne(const TrapPool& p, TrapEnvState& s, int action, float* obs,
                    float* reward, uint8_t* done) {
  int nx = s.ix, ny = s.iy;
  if (action >= 0 && action < 9) {
    int dx = action / 3 - 1;
    int dy = action % 3 - 1;
    int tx = s.ix + dx;
    int ty = s.iy + dy;
    if (tx < 0 || tx >= p.w || ty < 0 || ty >= p.h) {
      tx = s.ix;  // out-of-bounds links point back at the node
      ty = s.iy;
    }
    if (p.walkable[static_cast<size_t>(ty) * p.w + tx]) {
      nx = tx;
      ny = ty;
    }
  }
  *reward = static_cast<float>(kNodeRadius * (nx - s.ix));
  *done = s.t >= kEpisodeLength ? 1 : 0;
  s.ix = nx;
  s.iy = ny;
  s.t += 1;
  obs[0] = (s.ix * kNodeRadius) / kMaxX;
  obs[1] = (s.iy * kNodeRadius) / kMaxY;
}

inline void ResetOne(const TrapPool& p, TrapEnvState& s, float* obs) {
  s.ix = p.start_ix;
  s.iy = p.start_iy;
  s.t = 0;
  obs[0] = (s.ix * kNodeRadius) / kMaxX;
  obs[1] = (s.iy * kNodeRadius) / kMaxY;
}

}  // namespace

extern "C" {

void* dfd_trap_pool_create(const uint8_t* walkable, int h, int w, int n_envs,
                           int n_threads) {
  auto* p = new TrapPool();
  p->h = h;
  p->w = w;
  p->walkable.assign(walkable, walkable + static_cast<size_t>(h) * w);
  p->start_ix = (w * kNodeRadius / 2) / kNodeRadius;
  p->start_iy = (h * kNodeRadius / 2) / kNodeRadius;
  p->envs.resize(n_envs);
  if (n_threads < 1) n_threads = 1;
  p->threads = new ThreadPool(n_threads);
  for (auto& e : p->envs) {
    float obs[2];
    ResetOne(*p, e, obs);
  }
  return p;
}

void dfd_trap_pool_destroy(void* handle) {
  auto* p = static_cast<TrapPool*>(handle);
  delete p->threads;
  delete p;
}

void dfd_trap_pool_reset_all(void* handle, float* obs_out) {
  auto* p = static_cast<TrapPool*>(handle);
  for (size_t i = 0; i < p->envs.size(); ++i) {
    ResetOne(*p, p->envs[i], obs_out + 2 * i);
  }
}

// Steps every env; auto-resets finished episodes AFTER reporting their
// terminal transition (done=1 with the terminal obs/reward).
void dfd_trap_pool_step(void* handle, const int32_t* actions, float* obs_out,
                        float* rew_out, uint8_t* done_out, int auto_reset) {
  auto* p = static_cast<TrapPool*>(handle);
  int n = static_cast<int>(p->envs.size());
  p->threads->ParallelFor(n, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      StepOne(*p, p->envs[i], actions[i], obs_out + 2 * i, rew_out + i,
              done_out + i);
      if (auto_reset && done_out[i]) {
        ResetOne(*p, p->envs[i], obs_out + 2 * i);
      }
    }
  });
}

int dfd_trap_pool_size(void* handle) {
  return static_cast<int>(static_cast<TrapPool*>(handle)->envs.size());
}

}  // extern "C"
