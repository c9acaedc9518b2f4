// Native tokenized-data loader: mmap'd token shards -> prefetched batches.
//
// The reference's data path is Python np.memmap slicing inside the
// Lightning datamodule (`training/src/datamodules/lm_dataset.py`); at
// production batch sizes the per-batch gather and the host->device copy
// staging belong off the Python thread.  This loader mmaps binary token
// shards, assembles (batch, seq_len + 1) int32 example blocks on a
// background thread pool with a deterministic shuffled order (matching the
// FaultTolerantLoader contract: order is a pure function of (seed, epoch)
// and resume is (epoch, batch_idx)), and hands zero-copy-ready buffers to
// Python via ctypes (`flash_attn_tpu/training/native_loader.py`).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

typedef struct NativeLoader NativeLoader;

struct Shard {
  const void* data = nullptr;
  int64_t n_tokens = 0;
  int fd = -1;
  int64_t bytes = 0;
};

struct Batch {
  std::vector<int32_t> tokens;  // (batch, seq_len + 1) row-major
  int64_t index = -1;
};

struct NativeLoader {
  std::vector<Shard> shards;
  int itemsize = 2;  // uint16 tokens by default
  int64_t seq_len = 0;
  int64_t batch = 0;
  uint64_t seed = 0;
  int64_t epoch = 0;
  int64_t next_batch = 0;   // next batch index to schedule
  int64_t n_examples = 0;
  int64_t n_batches = 0;
  std::vector<int64_t> order;  // shuffled example order for this epoch

  // prefetch machinery
  std::deque<Batch> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  int64_t scheduled = 0;
  int64_t start_batch = 0;
  int64_t delivered = 0;
  size_t depth = 4;

  int64_t total_tokens() const {
    int64_t t = 0;
    for (auto& s : shards) t += s.n_tokens;
    return t;
  }

  int32_t token_at(int64_t i) const {
    for (auto& s : shards) {
      if (i < s.n_tokens) {
        if (itemsize == 2)
          return ((const uint16_t*)s.data)[i];
        return ((const int32_t*)s.data)[i];
      }
      i -= s.n_tokens;
    }
    return 0;
  }

  void fill(Batch* b, int64_t batch_idx) const {
    b->index = batch_idx;
    b->tokens.resize(batch * (seq_len + 1));
    for (int64_t r = 0; r < batch; ++r) {
      const int64_t ex = order[(batch_idx * batch + r) % n_examples];
      const int64_t start = ex * seq_len;
      for (int64_t c = 0; c <= seq_len; ++c)
        b->tokens[r * (seq_len + 1) + c] = token_at(start + c);
    }
  }

  void reshuffle() {
    order.resize(n_examples);
    for (int64_t i = 0; i < n_examples; ++i) order[i] = i;
    std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + (uint64_t)epoch);
    for (int64_t i = n_examples - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> d(0, i);
      std::swap(order[i], order[d(rng)]);
    }
  }

  void worker() {
    while (true) {
      int64_t my;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          // outstanding = scheduled-but-not-delivered (relative to the
          // resume point, NOT the absolute batch index)
          const int64_t outstanding = (scheduled - start_batch) - delivered;
          return stop.load() ||
                 (outstanding < (int64_t)depth + (int64_t)workers.size() &&
                  scheduled < n_batches);
        });
        if (stop.load()) return;
        my = scheduled++;
      }
      Batch b;
      fill(&b, my);
      {
        std::unique_lock<std::mutex> lk(mu);
        ready.push_back(std::move(b));
      }
      cv_ready.notify_all();
    }
  }
};

NativeLoader* nl_create(int64_t seq_len, int64_t batch, uint64_t seed,
                        int itemsize, int nthreads) {
  auto* L = new NativeLoader();
  L->seq_len = seq_len;
  L->batch = batch;
  L->seed = seed;
  L->itemsize = itemsize == 4 ? 4 : 2;
  L->depth = 4;
  (void)nthreads;
  return L;
}

int nl_add_shard(NativeLoader* L, const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return 1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return 2; }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) { close(fd); return 3; }
  madvise(p, st.st_size, MADV_SEQUENTIAL);
  Shard s;
  s.data = p;
  s.bytes = st.st_size;
  s.fd = fd;
  s.n_tokens = st.st_size / L->itemsize;
  L->shards.push_back(s);
  return 0;
}

/* Finalize setup and launch `nthreads` prefetch workers.  Resume at
 * (epoch, batch_idx) — the deterministic-resume contract of the
 * FaultTolerantLoader. */
int nl_start(NativeLoader* L, int64_t epoch, int64_t batch_idx,
             int nthreads) {
  /* Examples are laid out at stride seq_len and need seq_len+1 tokens
   (input + shifted target), so the last valid start is total-seq_len-1:
   matches the Python LMDataset's (total_tokens - 1) / seq_len count. */
  L->n_examples = (L->total_tokens() - 1) / L->seq_len;
  if (L->n_examples < L->batch) return 1;
  L->n_batches = L->n_examples / L->batch;
  L->epoch = epoch;
  L->reshuffle();
  L->scheduled = batch_idx;
  L->start_batch = batch_idx;
  if (nthreads < 1) nthreads = 2;
  for (int i = 0; i < nthreads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return 0;
}

int64_t nl_num_batches(NativeLoader* L) { return L->n_batches; }

/* Copy the next ready batch (in scheduling order is NOT guaranteed across
 * threads; batches are delivered as produced — deterministic CONTENT per
 * index, near-FIFO order).  Returns the batch index, or -1 if exhausted. */
int64_t nl_next(NativeLoader* L, int32_t* out) {
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_space.notify_all();
  const int64_t target = L->n_batches - L->start_batch;
  L->cv_ready.wait(lk, [&] {
    return !L->ready.empty() || L->delivered >= target;
  });
  if (L->ready.empty()) return -1;
  Batch b = std::move(L->ready.front());
  L->ready.pop_front();
  ++L->delivered;
  lk.unlock();
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  std::memcpy(out, b.tokens.data(), b.tokens.size() * sizeof(int32_t));
  return b.index;
}

void nl_destroy(NativeLoader* L) {
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  for (auto& s : L->shards) {
    munmap((void*)s.data, s.bytes);
    close(s.fd);
  }
  delete L;
}

}  // extern "C"
