// Native data-loading runtime: NPY/IDX parsing + shuffled batch assembly
// with a background prefetch thread.
//
// The reference's data layer is Julia (src/dataset.jl) feeding a
// single-device training loop; host-side batch assembly (shuffle + gather
// + copy) there rides Julia's runtime. Here it is a small C++ library so
// batch gathering overlaps accelerator compute: a producer thread fills a
// ring of pinned host buffers while the training loop consumes them.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   rnde_load_npy(path, &info)            -> tensor handle (host memory)
//   rnde_tensor_data/ndim/shape/itemsize  -> accessors
//   rnde_load_idx(path, &info)            -> tensor handle (MNIST format)
//   rnde_loader_create(tensors, n, batch, shuffle, drop_last, seed, depth)
//   rnde_loader_next(loader, out_ptrs)    -> rows in batch (0 = epoch end)
//   rnde_loader_destroy / rnde_tensor_destroy
//
// Build: make -C csrc   (produces libregneuralde_data.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

struct RndeTensor {
  std::vector<char> data;
  std::vector<int64_t> shape;
  int64_t itemsize = 0;
  char dtype = 'f';  // 'f' float32, 'u' uint8, 'i' int64, 'd' float64
};

struct RndeLoader;

// ---------------------------------------------------------------- NPY ----
// Minimal NPY v1.0/2.0 reader for C-contiguous little-endian arrays.
static bool parse_npy_header(FILE* f, RndeTensor* t) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint16_t h16;
    if (fread(&h16, 2, 1, f) != 1) return false;
    hlen = h16;
  } else {
    if (fread(&hlen, 4, 1, f) != 1) return false;
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) return false;

  if (header.find("'fortran_order': True") != std::string::npos) return false;

  auto dpos = header.find("'descr':");
  if (dpos == std::string::npos) return false;
  auto q1 = header.find('\'', dpos + 8);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4") { t->dtype = 'f'; t->itemsize = 4; }
  else if (descr == "<f8") { t->dtype = 'd'; t->itemsize = 8; }
  else if (descr == "|u1") { t->dtype = 'u'; t->itemsize = 1; }
  else if (descr == "<i8") { t->dtype = 'i'; t->itemsize = 8; }
  else return false;

  auto spos = header.find("'shape':");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  t->shape.clear();
  const char* s = shape_s.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    t->shape.push_back(strtoll(s, const_cast<char**>(&s), 10));
  }
  if (t->shape.empty()) t->shape.push_back(1);
  return true;
}

RndeTensor* rnde_load_npy(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* t = new RndeTensor();
  if (!parse_npy_header(f, t)) { fclose(f); delete t; return nullptr; }
  int64_t n = t->itemsize;
  for (auto d : t->shape) n *= d;
  t->data.resize(n);
  bool ok = fread(t->data.data(), 1, (size_t)n, f) == (size_t)n;
  fclose(f);
  if (!ok) { delete t; return nullptr; }
  return t;
}

// ---------------------------------------------------------------- IDX ----
// MNIST IDX format: magic [0,0,dtype,ndim], big-endian dims, raw data.
RndeTensor* rnde_load_idx(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  unsigned char m[4];
  if (fread(m, 1, 4, f) != 4 || m[0] != 0 || m[1] != 0) { fclose(f); return nullptr; }
  auto* t = new RndeTensor();
  switch (m[2]) {
    case 0x08: t->dtype = 'u'; t->itemsize = 1; break;
    case 0x0D: t->dtype = 'f'; t->itemsize = 4; break;
    default: fclose(f); delete t; return nullptr;
  }
  int ndim = m[3];
  int64_t n = t->itemsize;
  for (int i = 0; i < ndim; i++) {
    unsigned char d[4];
    if (fread(d, 1, 4, f) != 4) { fclose(f); delete t; return nullptr; }
    int64_t dim = ((int64_t)d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3];
    t->shape.push_back(dim);
    n *= dim;
  }
  t->data.resize(n);
  bool ok = fread(t->data.data(), 1, (size_t)n, f) == (size_t)n;
  fclose(f);
  if (!ok) { delete t; return nullptr; }
  return t;
}

void* rnde_tensor_data(RndeTensor* t) { return t->data.data(); }
int rnde_tensor_ndim(RndeTensor* t) { return (int)t->shape.size(); }
int64_t rnde_tensor_dim(RndeTensor* t, int i) { return t->shape[i]; }
int64_t rnde_tensor_itemsize(RndeTensor* t) { return t->itemsize; }
char rnde_tensor_dtype(RndeTensor* t) { return t->dtype; }
void rnde_tensor_destroy(RndeTensor* t) { delete t; }

RndeTensor* rnde_tensor_from_buffer(const void* buf, const int64_t* shape,
                                    int ndim, int64_t itemsize, char dtype) {
  auto* t = new RndeTensor();
  t->itemsize = itemsize;
  t->dtype = dtype;
  int64_t n = itemsize;
  for (int i = 0; i < ndim; i++) { t->shape.push_back(shape[i]); n *= shape[i]; }
  t->data.resize(n);
  memcpy(t->data.data(), buf, (size_t)n);
  return t;
}

// ------------------------------------------------------------- Loader ----
struct Slot {
  std::vector<std::vector<char>> buffers;  // one per tensor
  int64_t rows = 0;
  bool epoch_end = false;
};

struct RndeLoader {
  std::vector<RndeTensor*> tensors;  // not owned
  std::vector<int64_t> row_bytes;
  int64_t n_rows = 0;
  int64_t batch = 0;
  bool shuffle = false;
  bool drop_last = false;
  uint64_t rng_state = 0;

  std::vector<int64_t> order;
  int64_t cursor = 0;

  // ring buffer
  std::vector<Slot> ring;
  size_t head = 0, tail = 0, filled = 0;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::thread worker;
  std::atomic<bool> stop{false};

  uint64_t next_rand() {  // xorshift64*
    uint64_t x = rng_state;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    rng_state = x;
    return x * 0x2545F4914F6CDD1DULL;
  }

  void reshuffle() {
    for (int64_t i = n_rows - 1; i > 0; i--) {
      int64_t j = (int64_t)(next_rand() % (uint64_t)(i + 1));
      std::swap(order[i], order[j]);
    }
  }

  int64_t batches_per_epoch() const {
    return drop_last ? n_rows / batch : (n_rows + batch - 1) / batch;
  }

  void fill(Slot* slot) {
    if (cursor >= batches_per_epoch()) {
      // epoch boundary marker
      slot->rows = 0;
      slot->epoch_end = true;
      cursor = 0;
      if (shuffle) reshuffle();
      return;
    }
    int64_t start = cursor * batch;
    int64_t rows = std::min(batch, n_rows - start);
    slot->rows = rows;
    slot->epoch_end = false;
    for (size_t k = 0; k < tensors.size(); k++) {
      const char* src = tensors[k]->data.data();
      char* dst = slot->buffers[k].data();
      int64_t rb = row_bytes[k];
      for (int64_t r = 0; r < rows; r++) {
        memcpy(dst + r * rb, src + order[start + r] * rb, (size_t)rb);
      }
    }
    cursor++;
  }

  void run() {
    while (true) {
      std::unique_lock<std::mutex> lk(mu);
      cv_produce.wait(lk, [&] { return stop.load() || filled < ring.size(); });
      if (stop.load()) return;
      Slot* slot = &ring[head];
      lk.unlock();
      fill(slot);
      lk.lock();
      head = (head + 1) % ring.size();
      filled++;
      cv_consume.notify_one();
    }
  }
};

RndeLoader* rnde_loader_create(RndeTensor** tensors, int n_tensors,
                               int64_t batch, int shuffle, int drop_last,
                               uint64_t seed, int prefetch_depth) {
  if (n_tensors <= 0 || batch <= 0) return nullptr;
  auto* L = new RndeLoader();
  L->batch = batch;
  L->shuffle = shuffle != 0;
  L->drop_last = drop_last != 0;
  L->rng_state = seed ? seed : 0x9E3779B97F4A7C15ULL;
  L->n_rows = tensors[0]->shape[0];
  for (int i = 0; i < n_tensors; i++) {
    RndeTensor* t = tensors[i];
    if (t->shape[0] != L->n_rows) { delete L; return nullptr; }
    int64_t rb = t->itemsize;
    for (size_t d = 1; d < t->shape.size(); d++) rb *= t->shape[d];
    L->tensors.push_back(t);
    L->row_bytes.push_back(rb);
  }
  L->order.resize(L->n_rows);
  for (int64_t i = 0; i < L->n_rows; i++) L->order[i] = i;
  if (L->shuffle) L->reshuffle();

  int depth = prefetch_depth > 0 ? prefetch_depth : 2;
  L->ring.resize(depth);
  for (auto& slot : L->ring) {
    slot.buffers.resize(n_tensors);
    for (int i = 0; i < n_tensors; i++) {
      slot.buffers[i].resize((size_t)(batch * L->row_bytes[i]));
    }
  }
  L->worker = std::thread([L] { L->run(); });
  return L;
}

// Copies the next batch into caller buffers (each sized batch*row_bytes).
// Returns rows in the batch; 0 marks the end of an epoch (call again for
// the next epoch's first batch); -1 on error.
int64_t rnde_loader_next(RndeLoader* L, void** out_ptrs) {
  if (!L) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_consume.wait(lk, [&] { return L->filled > 0; });
  Slot* slot = &L->ring[L->tail];
  int64_t rows = slot->epoch_end ? 0 : slot->rows;
  if (rows > 0) {
    for (size_t k = 0; k < L->tensors.size(); k++) {
      memcpy(out_ptrs[k], slot->buffers[k].data(),
             (size_t)(rows * L->row_bytes[k]));
    }
  }
  L->tail = (L->tail + 1) % L->ring.size();
  L->filled--;
  L->cv_produce.notify_one();
  return rows;
}

int64_t rnde_loader_batches_per_epoch(RndeLoader* L) {
  return L ? L->batches_per_epoch() : -1;
}

void rnde_loader_destroy(RndeLoader* L) {
  if (!L) return;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_produce.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;
}

}  // extern "C"
