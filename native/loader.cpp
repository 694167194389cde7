// Native training data loader: mmap'ed latent shards + background
// batch prefetch.
//
// Native runtime piece for the training subsystem (no reference analog
// — the reference is inference-only). Diffusion fine-tunes consume
// precomputed (latents, conditioning) arrays; this loader mmaps a shard
// file, assembles shuffled batches on a background thread (row gathers
// + memcpy into reusable buffers), and hands Python zero-copy-out
// batches to feed jax.device_put. Semantics: a continuous shuffled
// stream, reshuffled per full pass (the Python fallback
// train/data.py LatentDataset reshuffles per epoch() call instead).
//
// Shard format (written by train/data.py write_shard):
//   magic  "TFLS"            4 bytes
//   version u32 (=1)
//   n_arrays u32
//   per array: dtype u32 (0=f32 1=f16 2=bf16 3=i32), ndim u32,
//              dims u64[ndim]           (dims[0] = n_records, shared)
//   then each array's data, contiguous, in order, 64-byte aligned.
//
// C API (ctypes):
//   void* tf_loader_open(const char* path, int batch, unsigned long seed,
//                        int shuffle, int depth);
//   int   tf_loader_num_arrays(void* h);
//   long  tf_loader_num_records(void* h);
//   int   tf_loader_ndim(void* h, int arr);
//   void  tf_loader_dims(void* h, int arr, unsigned long* out);
//   int   tf_loader_dtype(void* h, int arr);
//   int   tf_loader_next(void* h);              // blocks; 1 ok, 0 closed
//   void  tf_loader_copy(void* h, int arr, void* dst);  // current batch
//   void  tf_loader_close(void* h);

#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x534c4654;  // "TFLS" little-endian

struct ArrayMeta {
  uint32_t dtype = 0;
  std::vector<uint64_t> dims;
  const char* data = nullptr;  // into the mmap
  size_t row_bytes = 0;        // bytes per record
};

size_t dtype_size(uint32_t code) {
  switch (code) {
    case 0: return 4;  // f32
    case 1: return 2;  // f16
    case 2: return 2;  // bf16
    case 3: return 4;  // i32
    default: return 0;
  }
}

struct Loader {
  int fd = -1;
  const char* map = nullptr;
  size_t map_len = 0;
  std::vector<ArrayMeta> arrays;
  uint64_t n_records = 0;
  int batch = 0;
  bool shuffle = true;
  std::mt19937_64 rng;

  // prefetch machinery: queue of assembled batches
  struct Batch {
    std::vector<std::vector<char>> per_array;
  };
  std::deque<Batch> queue;
  size_t depth = 2;
  Batch current;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;
  bool closing = false;

  ~Loader() { close(); }

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    map_len = static_cast<size_t>(st.st_size);
    void* m = mmap(nullptr, map_len, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) return false;
    map = static_cast<const char*>(m);
    madvise(m, map_len, MADV_WILLNEED);

    // bounds-checked header reads: a truncated/corrupt shard must fail
    // the open (-> nullptr -> Python ValueError), not fault or throw
    // through the extern "C" boundary
    const char* p = map;
    const char* end = map + map_len;
    auto rd_u32 = [&p, end](uint32_t* v) {
      if (p + 4 > end) return false;
      memcpy(v, p, 4); p += 4; return true;
    };
    auto rd_u64 = [&p, end](uint64_t* v) {
      if (p + 8 > end) return false;
      memcpy(v, p, 8); p += 8; return true;
    };
    uint32_t magic = 0, version = 0, n_arrays = 0;
    if (!rd_u32(&magic) || !rd_u32(&version) || !rd_u32(&n_arrays))
      return false;
    if (magic != kMagic || version != 1 || n_arrays > 256) return false;
    arrays.resize(n_arrays);
    for (auto& a : arrays) {
      uint32_t ndim = 0;
      if (!rd_u32(&a.dtype) || !rd_u32(&ndim)) return false;
      if (dtype_size(a.dtype) == 0 || ndim == 0 || ndim > 16) return false;
      a.dims.resize(ndim);
      for (uint32_t d = 0; d < ndim; ++d)
        if (!rd_u64(&a.dims[d])) return false;
      size_t elems = 1;
      for (uint32_t d = 1; d < ndim; ++d) elems *= a.dims[d];
      a.row_bytes = elems * dtype_size(a.dtype);
    }
    n_records = arrays.empty() ? 0 : arrays[0].dims[0];
    // data sections, 64-byte aligned from file start
    size_t off = static_cast<size_t>(p - map);
    for (auto& a : arrays) {
      off = (off + 63) & ~size_t(63);
      a.data = map + off;
      off += a.row_bytes * a.dims[0];
    }
    return off <= map_len;
  }

  void start() {
    worker = std::thread([this] { this->run(); });
  }

  void run() {
    std::vector<uint64_t> order(n_records);
    for (uint64_t i = 0; i < n_records; ++i) order[i] = i;
    size_t cursor = 0;
    auto reshuffle = [&] {
      if (shuffle) std::shuffle(order.begin(), order.end(), rng);
      cursor = 0;
    };
    reshuffle();
    for (;;) {
      if (cursor + batch > n_records) reshuffle();
      Batch b;
      b.per_array.resize(arrays.size());
      for (size_t ai = 0; ai < arrays.size(); ++ai) {
        const auto& a = arrays[ai];
        b.per_array[ai].resize(a.row_bytes * batch);
        char* dst = b.per_array[ai].data();
        for (int r = 0; r < batch; ++r) {
          memcpy(dst + r * a.row_bytes,
                 a.data + order[cursor + r] * a.row_bytes, a.row_bytes);
        }
      }
      cursor += batch;
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [this] { return queue.size() < depth || closing; });
      if (closing) return;
      queue.push_back(std::move(b));
      cv_empty.notify_one();
    }
  }

  int next() {
    std::unique_lock<std::mutex> lk(mu);
    cv_empty.wait(lk, [this] { return !queue.empty() || closing; });
    if (queue.empty()) return 0;
    current = std::move(queue.front());
    queue.pop_front();
    cv_full.notify_one();
    return 1;
  }

  void close() {
    {
      std::lock_guard<std::mutex> lk(mu);
      closing = true;
    }
    cv_full.notify_all();
    cv_empty.notify_all();
    if (worker.joinable()) worker.join();
    if (map) munmap(const_cast<char*>(map), map_len);
    map = nullptr;
    if (fd >= 0) ::close(fd);
    fd = -1;
  }
};

}  // namespace

extern "C" {

void* tf_loader_open(const char* path, int batch, unsigned long seed,
                     int shuffle, int depth) {
  auto* l = new Loader();
  l->batch = batch;
  l->shuffle = shuffle != 0;
  l->rng.seed(seed);
  l->depth = depth > 0 ? static_cast<size_t>(depth) : 2;
  if (!l->open(path) || l->n_records < static_cast<uint64_t>(batch)) {
    delete l;
    return nullptr;
  }
  l->start();
  return l;
}

int tf_loader_num_arrays(void* h) {
  return static_cast<int>(static_cast<Loader*>(h)->arrays.size());
}

long tf_loader_num_records(void* h) {
  return static_cast<long>(static_cast<Loader*>(h)->n_records);
}

int tf_loader_ndim(void* h, int arr) {
  return static_cast<int>(
      static_cast<Loader*>(h)->arrays[arr].dims.size());
}

void tf_loader_dims(void* h, int arr, unsigned long* out) {
  const auto& dims = static_cast<Loader*>(h)->arrays[arr].dims;
  for (size_t i = 0; i < dims.size(); ++i) out[i] = dims[i];
}

int tf_loader_dtype(void* h, int arr) {
  return static_cast<int>(static_cast<Loader*>(h)->arrays[arr].dtype);
}

int tf_loader_next(void* h) { return static_cast<Loader*>(h)->next(); }

void tf_loader_copy(void* h, int arr, void* dst) {
  auto* l = static_cast<Loader*>(h);
  const auto& buf = l->current.per_array[arr];
  memcpy(dst, buf.data(), buf.size());
}

void tf_loader_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
