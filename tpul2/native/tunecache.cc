// tpul2 native core: per-shape tuning-cache + dispatch heuristic.
//
// Role-parity with the reference's native layer (SURVEY.md C10-C13): where
// CUDA-L2 compiles a C++ dispatch surface per shape (pybind/hgemm_*.cc
// registering cuda_l2_<dev>_<acc> plus cuBLAS baselines) and caches tuned
// cuBLASLt algos in C++ statics (cublas/*/hgemm_cublaslt_auto_tuning.cu:291),
// tpul2 keeps the per-(M,N,K,acc) tuned kernel-config lookup in a native
// open-addressing hash table with binary persistence.  The Python layer
// calls in via ctypes at trace time: dispatch.resolve_config's exact-key
// lookup is served by this cache whenever the binary sidecar mirrors the
// JSON DB (TuneDB.native_get; tests/test_dispatch.py asserts the hit), with
// the JSON entries as the mutation-safe fallback.  The standalone
// self-test/benchmark main() is compiled out by -DNO_TL2_BIN, mirroring the
// reference's "#ifndef NO_CUBLAS_HGEMM_BIN" gated mains (cublas/*:71-173).
//
// Build: see Makefile (g++ -O3 -shared -fPIC -> libtpul2.so).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "tl2_constants.h"  // GENERATED from tpul2/config.py — shared truth

extern "C" {

// Packed kernel config — mirrors tpul2.config.KernelConfig (v2: adds the
// rhs_layout bit and the vmem_limit_bytes field; round-1 sidecars silently
// dropped rhs_layout='nk' — ADVICE r1 #2).
struct TL2Config {
  int32_t bm, bn, bk;
  int32_t acc;        // 0 = float32, 1 = bfloat16
  int32_t grid_order; // 0 = mn, 1 = nm
  int32_t flags;      // bit0: use_xla; bit1: parallel_mn; bit2: rhs_layout nk;
                      // bits3-5 + bit10 (high bit): xla_variant id
                      // (0=matmul; config.XLA_VARIANTS)
  int32_t vmem_limit; // vmem_limit_bytes (0 = compiler default)
  float tflops;       // measured at tuning time
};

struct TL2Key {
  int32_t m, n, k;
  int32_t acc;   // accumulator family
  int32_t dtype; // input dtype id (0 = bf16, 1 = f32)
};

} // extern "C"

namespace {

struct Slot {
  TL2Key key;
  TL2Config cfg;
  uint8_t used;
};

struct Cache {
  Slot* slots;
  uint64_t capacity; // power of two
  uint64_t size;
};

uint64_t hash_key(const TL2Key& k) {
  // FNV-1a over the key bytes.
  const uint8_t* p = reinterpret_cast<const uint8_t*>(&k);
  uint64_t h = 1469598103934665603ULL;
  for (size_t i = 0; i < sizeof(TL2Key); ++i) {
    h ^= p[i];
    h *= 1099511628211ULL;
  }
  return h;
}

bool key_eq(const TL2Key& a, const TL2Key& b) {
  return std::memcmp(&a, &b, sizeof(TL2Key)) == 0;
}

void rehash(Cache* c, uint64_t new_cap);

void insert(Cache* c, const TL2Key& key, const TL2Config& cfg) {
  if ((c->size + 1) * 10 >= c->capacity * 7) rehash(c, c->capacity * 2);
  uint64_t mask = c->capacity - 1;
  uint64_t i = hash_key(key) & mask;
  while (c->slots[i].used && !key_eq(c->slots[i].key, key)) {
    i = (i + 1) & mask;
  }
  if (!c->slots[i].used) {
    c->slots[i].used = 1;
    c->slots[i].key = key;
    c->size++;
  }
  c->slots[i].cfg = cfg;
}

void rehash(Cache* c, uint64_t new_cap) {
  Slot* old = c->slots;
  uint64_t old_cap = c->capacity;
  c->slots = static_cast<Slot*>(std::calloc(new_cap, sizeof(Slot)));
  c->capacity = new_cap;
  c->size = 0;
  for (uint64_t i = 0; i < old_cap; ++i) {
    if (old[i].used) insert(c, old[i].key, old[i].cfg);
  }
  std::free(old);
}

constexpr uint32_t kMagic = 0x54503255; // "TP2U"
constexpr uint32_t kVersion = 2;        // v2: rhs_layout bit + vmem_limit

} // namespace

extern "C" {

void* tl2_cache_new(void) {
  Cache* c = static_cast<Cache*>(std::malloc(sizeof(Cache)));
  c->capacity = 1024;
  c->size = 0;
  c->slots = static_cast<Slot*>(std::calloc(c->capacity, sizeof(Slot)));
  return c;
}

void tl2_cache_free(void* h) {
  if (!h) return;
  Cache* c = static_cast<Cache*>(h);
  std::free(c->slots);
  std::free(c);
}

uint64_t tl2_cache_size(void* h) { return static_cast<Cache*>(h)->size; }

void tl2_cache_put(void* h, const TL2Key* key, const TL2Config* cfg) {
  insert(static_cast<Cache*>(h), *key, *cfg);
}

// Returns 1 and fills *out on hit, 0 on miss.
int32_t tl2_cache_get(void* h, const TL2Key* key, TL2Config* out) {
  Cache* c = static_cast<Cache*>(h);
  uint64_t mask = c->capacity - 1;
  uint64_t i = hash_key(*key) & mask;
  while (c->slots[i].used) {
    if (key_eq(c->slots[i].key, *key)) {
      *out = c->slots[i].cfg;
      return 1;
    }
    i = (i + 1) & mask;
  }
  return 0;
}

// Binary persistence: [magic, version, count] then (key, cfg) pairs.
int32_t tl2_cache_save(void* h, const char* path) {
  Cache* c = static_cast<Cache*>(h);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t header[3] = {kMagic, kVersion, static_cast<uint32_t>(c->size)};
  if (std::fwrite(header, sizeof(header), 1, f) != 1) { std::fclose(f); return -2; }
  for (uint64_t i = 0; i < c->capacity; ++i) {
    if (!c->slots[i].used) continue;
    if (std::fwrite(&c->slots[i].key, sizeof(TL2Key), 1, f) != 1 ||
        std::fwrite(&c->slots[i].cfg, sizeof(TL2Config), 1, f) != 1) {
      std::fclose(f);
      return -2;
    }
  }
  std::fclose(f);
  return 0;
}

int32_t tl2_cache_load(void* h, const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint32_t header[3];
  if (std::fread(header, sizeof(header), 1, f) != 1 ||
      header[0] != kMagic || header[1] != kVersion) {
    std::fclose(f);
    return -2;
  }
  for (uint32_t i = 0; i < header[2]; ++i) {
    TL2Key key;
    TL2Config cfg;
    if (std::fread(&key, sizeof(key), 1, f) != 1 ||
        std::fread(&cfg, sizeof(cfg), 1, f) != 1) {
      std::fclose(f);
      return -2;
    }
    tl2_cache_put(h, &key, &cfg);
  }
  std::fclose(f);
  return 0;
}

// Heuristic fallback config — must stay in lockstep with
// tpul2.config.heuristic_config (the Python reference implementation).
// tests/test_native.py asserts equality over a dense grid including
// shrink-exercising shapes; the shared constants come from the generated
// tl2_constants.h (single source of truth = tpul2/config.py).
static int32_t pick(int32_t dim, int32_t lo, const int32_t* choices,
                    int32_t n_choices) {
  int32_t cap = dim > lo ? ((dim + lo - 1) / lo) * lo : lo;
  int32_t best = lo;
  for (int32_t i = 0; i < n_choices; ++i) {
    if (choices[i] <= cap) best = choices[i];
  }
  return best;
}

static int64_t round_up64(int64_t x, int64_t mult) {
  return ((x + mult - 1) / mult) * mult;
}

static int64_t cdiv64(int64_t a, int64_t b) { return (a + b - 1) / b; }

// Physical VMEM bytes of one (rows x cols) block: tiles are
// (sublane x lane)-aligned on chip (mirrors KernelConfig.vmem_bytes).
static int64_t phys(int64_t rows, int64_t cols, int32_t sub, int64_t item) {
  return round_up64(rows, sub) * round_up64(cols, kTl2Lane) * item;
}

// Conditional-double-buffering footprint model, exact mirror of
// KernelConfig.vmem_bytes(in=bf16, out=bf16, shape=(m,n,k)), rhs 'kn'.
static int64_t vmem_model(int32_t bm, int32_t bn, int32_t bk, int32_t acc,
                          int32_t sub_in, int64_t m, int64_t n, int64_t k) {
  const int64_t in_item = 2, out_item = 2;  // bf16 in/out
  const int32_t sub_out = 16;               // bf16 output sublane
  const int32_t sub_acc = (acc == 0) ? 8 : 16;
  const int64_t acc_item = (acc == 0) ? 4 : 2;
  int64_t a_blk = phys(bm, bk, sub_in, in_item);
  int64_t b_blk = phys(bk, bn, sub_in, in_item);
  int64_t o_blk = phys(bm, bn, sub_out, out_item);
  int64_t acc_b = phys(bm, bn, sub_acc, acc_item);
  int64_t gm = cdiv64(m, bm), gn = cdiv64(n, bn), gk = cdiv64(k, bk);
  int64_t a_mult = (gm > 1 || gk > 1) ? 2 : 1;
  int64_t b_mult = (gn > 1 || gk > 1) ? 2 : 1;
  int64_t o_mult = (gm > 1 || gn > 1) ? 2 : 1;
  if (gk == 1) acc_b = 0;
  return a_mult * a_blk + b_mult * b_blk + o_mult * o_blk + acc_b;
}

// Valid in the DEFAULT compiler regime (no vmem_limit): footprint within
// the calibrated budget AND the logical A block within the block cap —
// mirrors KernelConfig.validate for vmem_limit_bytes=None.
static bool default_regime_ok(int32_t bm, int32_t bn, int32_t bk,
                              int32_t acc, int32_t sub_in,
                              int64_t m, int64_t n, int64_t k) {
  if ((int64_t)bm * bk * 2 > kTl2ABlockCap) return false;
  return vmem_model(bm, bn, bk, acc, sub_in, m, n, k) <=
         kTl2DefaultVmemBudget;
}

void tl2_heuristic(int32_t m, int32_t n, int32_t k, int32_t acc,
                   int32_t sublane, TL2Config* out) {
  static const int32_t bm16[] = {16, 32, 64, 128, 256, 512};
  static const int32_t bm8[] = {8, 16, 32, 64, 128, 256, 512};
  static const int32_t bns[] = {128, 256, 512};
  static const int32_t bks[] = {128, 256, 512, 1024};
  // Sub-lane problem dims take a full-dim block (no HBM padding copy) —
  // round-2 rule, mirrored from heuristic_config.
  out->bm = (m < sublane) ? m
            : ((sublane == 16) ? pick(m, 16, bm16, 6) : pick(m, 8, bm8, 7));
  out->bn = (n < kTl2Lane) ? n : pick(n, 128, bns, 3);
  out->bk = (k < kTl2Lane) ? k : pick(k, 128, bks, 4);
  out->acc = acc;
  out->grid_order = 0;
  out->flags = 2; // parallel_mn, rhs 'kn', no xla
  out->vmem_limit = 0;
  out->tflops = 0.0f;
  // Shrink loops, same order as heuristic_config: bk, then bn, then bm.
  while (!default_regime_ok(out->bm, out->bn, out->bk, acc, sublane,
                            m, n, k) && out->bk > kTl2Lane)
    out->bk /= 2;
  while (!default_regime_ok(out->bm, out->bn, out->bk, acc, sublane,
                            m, n, k) && out->bn > kTl2Lane)
    out->bn /= 2;
  while (!default_regime_ok(out->bm, out->bn, out->bk, acc, sublane,
                            m, n, k) && out->bm > sublane)
    out->bm /= 2;
}

} // extern "C"

#ifndef NO_TL2_BIN
// Standalone self-test + micro-benchmark (compiled out of the library build
// by -DNO_TL2_BIN, like the reference's cublas mains).
#include <chrono>
#include <vector>

int main() {
  void* c = tl2_cache_new();
  // self-test: put/get round trip over a grid
  const int32_t dims[] = {64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384};
  int count = 0;
  for (int32_t m : dims)
    for (int32_t n : dims)
      for (int32_t k : dims) {
        TL2Key key{m, n, k, 0, 0};
        TL2Config cfg;
        tl2_heuristic(m, n, k, 0, 16, &cfg);
        cfg.tflops = static_cast<float>(count);
        tl2_cache_put(c, &key, &cfg);
        ++count;
      }
  std::printf("inserted %d entries, cache size %llu\n", count,
              static_cast<unsigned long long>(tl2_cache_size(c)));
  // verify
  int errors = 0;
  for (int32_t m : dims)
    for (int32_t n : dims)
      for (int32_t k : dims) {
        TL2Key key{m, n, k, 0, 0};
        TL2Config cfg;
        if (!tl2_cache_get(c, &key, &cfg)) ++errors;
      }
  std::printf("lookup errors: %d\n", errors);
  // micro-benchmark: lookup throughput
  auto t0 = std::chrono::steady_clock::now();
  int64_t hits = 0;
  for (int rep = 0; rep < 1000; ++rep)
    for (int32_t m : dims)
      for (int32_t n : dims) {
        TL2Key key{m, n, 4096, 0, 0};
        TL2Config cfg;
        hits += tl2_cache_get(c, &key, &cfg);
      }
  auto dt = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();
  std::printf("lookups/s: %.0f (hits %lld)\n", 81000.0 / dt,
              static_cast<long long>(hits));
  // persistence round trip
  if (tl2_cache_save(c, "/tmp/tl2_cache_test.bin") != 0) return 1;
  void* c2 = tl2_cache_new();
  if (tl2_cache_load(c2, "/tmp/tl2_cache_test.bin") != 0) return 1;
  std::printf("reloaded size %llu\n",
              static_cast<unsigned long long>(tl2_cache_size(c2)));
  bool ok = tl2_cache_size(c2) == tl2_cache_size(c) && errors == 0;
  tl2_cache_free(c);
  tl2_cache_free(c2);
  std::printf(ok ? "PASS\n" : "FAIL\n");
  return ok ? 0 : 1;
}
#endif // NO_TL2_BIN
