// Native data-loading runtime for nicediffusion_tpu.
//
// The reference feeds training from a torch DataLoader with 4 worker
// processes (reference scripts/train.py:47); this is the TPU-native
// equivalent: a C++ loader that parses idx/idx.gz image archives (EMNIST
// layout), performs the dataset's w/h orientation fix (reference
// trainer.py:76) and [0,1]->[-1,1] rescale (reference utils.py:309-314) at
// native speed, and runs a background prefetch thread filling a ring of
// ready NHWC float32 batches so the host never stalls the device feed.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image):
//   ndl_open(images_path, labels_path)        -> handle (0 on failure)
//   ndl_info(handle, &n, &rows, &cols)
//   ndl_start(handle, batch, seed, depth, transpose, rescale)
//   ndl_next(handle, float* images, int* labels)   (blocking pop)
//   ndl_close(handle)
//   ndl_last_error()                           -> const char*
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libnicediffusion_native.so
//        nicediffusion_native.cc -lz -lpthread

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

std::string g_last_error;

uint32_t read_be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Read a whole file, transparently gunzipping (gzopen handles both).
bool read_file(const std::string& path, std::vector<unsigned char>* out) {
  gzFile f = gzopen(path.c_str(), "rb");
  if (!f) {
    g_last_error = "cannot open " + path;
    return false;
  }
  out->clear();
  unsigned char buf[1 << 16];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) {
    out->insert(out->end(), buf, buf + n);
  }
  gzclose(f);
  if (n < 0) {
    g_last_error = "gzread failed on " + path;
    return false;
  }
  return true;
}

struct Batch {
  std::vector<float> images;
  std::vector<int32_t> labels;
};

struct Loader {
  // dataset
  std::vector<unsigned char> images;  // n * rows * cols, row-major
  std::vector<int32_t> labels;
  int64_t n = 0, rows = 0, cols = 0;

  // prefetch machinery
  int64_t batch = 0;
  bool transpose = true;
  bool rescale = true;
  uint64_t seed = 0;
  size_t depth = 4;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<Batch> ring;
  std::atomic<bool> stop{false};

  ~Loader() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_push.notify_all();
    cv_pop.notify_all();
    if (worker.joinable()) worker.join();
  }

  void produce() {
    std::mt19937_64 rng(seed);
    std::vector<int64_t> perm(n);
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    int64_t cursor = n;  // force shuffle on first use
    const int64_t px = rows * cols;

    while (!stop.load()) {
      Batch b;
      b.images.resize(batch * px);
      b.labels.resize(batch);
      for (int64_t i = 0; i < batch; ++i) {
        if (cursor + 1 > n) {  // new epoch: reshuffle (drop_last semantics)
          std::shuffle(perm.begin(), perm.end(), rng);
          cursor = 0;
        }
        const int64_t idx = perm[cursor++];
        const unsigned char* src = images.data() + idx * px;
        float* dst = b.images.data() + i * px;
        if (transpose) {
          // EMNIST stores (w, h); emit (h, w) — reference trainer.py:76
          for (int64_t r = 0; r < rows; ++r)
            for (int64_t c = 0; c < cols; ++c)
              dst[r * cols + c] = float(src[c * rows + r]);
        } else {
          for (int64_t k = 0; k < px; ++k) dst[k] = float(src[k]);
        }
        if (rescale) {
          const float inv = 2.0f / 255.0f;
          for (int64_t k = 0; k < px; ++k) dst[k] = dst[k] * inv - 1.0f;
        } else {
          const float inv = 1.0f / 255.0f;
          for (int64_t k = 0; k < px; ++k) dst[k] *= inv;
        }
        b.labels[i] = labels[idx];
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_push.wait(lock, [&] { return ring.size() < depth || stop.load(); });
      if (stop.load()) return;
      ring.push_back(std::move(b));
      cv_pop.notify_one();
    }
  }
};

}  // namespace

extern "C" {

const char* ndl_last_error() { return g_last_error.c_str(); }

void* ndl_open(const char* images_path, const char* labels_path) {
  auto loader = new Loader();
  std::vector<unsigned char> raw;
  if (!read_file(images_path, &raw) || raw.size() < 16) {
    delete loader;
    return nullptr;
  }
  const uint32_t magic = read_be32(raw.data());
  if (magic != 0x00000803) {
    g_last_error = "bad idx3 magic in images file";
    delete loader;
    return nullptr;
  }
  loader->n = read_be32(raw.data() + 4);
  loader->rows = read_be32(raw.data() + 8);
  loader->cols = read_be32(raw.data() + 12);
  const size_t need = 16 + size_t(loader->n) * loader->rows * loader->cols;
  if (raw.size() < need) {
    g_last_error = "truncated images file";
    delete loader;
    return nullptr;
  }
  loader->images.assign(raw.begin() + 16, raw.begin() + need);

  if (!read_file(labels_path, &raw) || raw.size() < 8) {
    delete loader;
    return nullptr;
  }
  if (read_be32(raw.data()) != 0x00000801) {
    g_last_error = "bad idx1 magic in labels file";
    delete loader;
    return nullptr;
  }
  const int64_t n_labels = read_be32(raw.data() + 4);
  if (n_labels != loader->n || raw.size() < size_t(8 + n_labels)) {
    g_last_error = "labels file does not match images file";
    delete loader;
    return nullptr;
  }
  loader->labels.resize(n_labels);
  for (int64_t i = 0; i < n_labels; ++i)
    loader->labels[i] = int32_t(raw[8 + i]);
  return loader;
}

void ndl_info(void* handle, int64_t* n, int64_t* rows, int64_t* cols) {
  auto* loader = static_cast<Loader*>(handle);
  *n = loader->n;
  *rows = loader->rows;
  *cols = loader->cols;
}

int ndl_start(void* handle, int64_t batch, uint64_t seed, int64_t depth,
              int transpose, int rescale) {
  auto* loader = static_cast<Loader*>(handle);
  if (loader->worker.joinable()) {
    g_last_error = "loader already started";
    return -1;
  }
  if (batch <= 0 || batch > loader->n) {
    g_last_error = "invalid batch size";
    return -1;
  }
  loader->batch = batch;
  loader->seed = seed;
  loader->depth = size_t(std::max<int64_t>(1, depth));
  loader->transpose = transpose != 0;
  loader->rescale = rescale != 0;
  loader->worker = std::thread([loader] { loader->produce(); });
  return 0;
}

int ndl_next(void* handle, float* images, int32_t* labels) {
  auto* loader = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(loader->mu);
  loader->cv_pop.wait(lock, [&] {
    return !loader->ring.empty() || loader->stop.load();
  });
  if (loader->ring.empty()) {
    g_last_error = "loader stopped";
    return -1;
  }
  Batch b = std::move(loader->ring.front());
  loader->ring.pop_front();
  loader->cv_push.notify_one();
  lock.unlock();
  std::memcpy(images, b.images.data(), b.images.size() * sizeof(float));
  std::memcpy(labels, b.labels.data(), b.labels.size() * sizeof(int32_t));
  return 0;
}

void ndl_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
