// vllm-i64-tpu native host runtime: KV block pool with LRU free list and
// prefix cache.
//
// The TPU compute path is JAX/Pallas; this is the *host-side* hot loop —
// the per-step integer block accounting of the scheduler (the analog of the
// reference's host allocator work that its CUDA-side engine hides in C++).
// Exposed through a plain C ABI and loaded via ctypes (no pybind11 in the
// image); Python falls back to core/block_pool.py when the toolchain is
// unavailable (same compile-or-fallback pattern as the reference's
// kernels/kernel_loader.py:114-128).
//
// Semantics mirror vllm_i64_tpu/core/block_pool.py exactly:
//  - block 0 reserved (null), ref-counted blocks
//  - doubly-linked LRU free list: popleft = LRU, append = MRU
//  - free() returns zero-ref blocks to the tail in REVERSE caller order so
//    sequence tails evict first
//  - prefix cache: 64-bit digest -> block id; hash evicted on reallocation
//  - first-writer-wins on duplicate hashes

#include <cstdint>
#include <cstdlib>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t NO_NODE = -1;

struct Pool {
  int32_t num_blocks;
  std::vector<int32_t> ref;
  std::vector<int32_t> prev;  // size num_blocks + 2 (head, tail sentinels)
  std::vector<int32_t> next;
  std::vector<uint8_t> in_free;
  int32_t head, tail;
  int32_t num_free;
  bool enable_caching;

  std::unordered_map<int32_t, uint64_t> hash_of;   // block -> digest
  std::unordered_map<uint64_t, int32_t> block_of;  // digest -> block
  int64_t cache_hits = 0;
  int64_t cache_queries = 0;

  void ll_remove(int32_t i) {
    int32_t p = prev[i], n = next[i];
    next[p] = n;
    prev[n] = p;
    prev[i] = NO_NODE;
    next[i] = NO_NODE;
    in_free[i] = 0;
    num_free--;
  }

  void ll_append(int32_t i) {  // tail append = MRU
    int32_t p = prev[tail];
    next[p] = i;
    prev[i] = p;
    next[i] = tail;
    prev[tail] = i;
    in_free[i] = 1;
    num_free++;
  }

  int32_t ll_popleft() {
    int32_t i = next[head];
    if (i == tail) return NO_NODE;
    ll_remove(i);
    return i;
  }

  void evict_hash(int32_t bid) {
    auto it = hash_of.find(bid);
    if (it != hash_of.end()) {
      block_of.erase(it->second);
      hash_of.erase(it);
    }
  }
};

}  // namespace

extern "C" {

void* pool_create(int32_t num_blocks, int32_t enable_caching) {
  if (num_blocks <= 1) return nullptr;
  Pool* p = new Pool();
  p->num_blocks = num_blocks;
  p->enable_caching = enable_caching != 0;
  p->ref.assign(num_blocks, 0);
  p->prev.assign(num_blocks + 2, NO_NODE);
  p->next.assign(num_blocks + 2, NO_NODE);
  p->in_free.assign(num_blocks, 0);
  p->head = num_blocks;
  p->tail = num_blocks + 1;
  // wire 1..n-1 in id order; block 0 = null, permanently claimed
  int32_t prev_node = p->head;
  for (int32_t i = 1; i < num_blocks; i++) {
    p->next[prev_node] = i;
    p->prev[i] = prev_node;
    p->in_free[i] = 1;
    prev_node = i;
  }
  p->next[prev_node] = p->tail;
  p->prev[p->tail] = prev_node;
  p->num_free = num_blocks - 1;
  p->ref[0] = 1;
  return p;
}

void pool_destroy(void* h) { delete static_cast<Pool*>(h); }

// Claim n LRU blocks into out[n]. Returns 1 on success, 0 if insufficient.
int32_t pool_allocate(void* h, int32_t n, int32_t* out) {
  Pool* p = static_cast<Pool*>(h);
  if (n > p->num_free) return 0;
  for (int32_t i = 0; i < n; i++) {
    int32_t bid = p->ll_popleft();
    p->evict_hash(bid);
    p->ref[bid] = 1;
    out[i] = bid;
  }
  return 1;
}

void pool_touch(void* h, const int32_t* ids, int32_t n) {
  Pool* p = static_cast<Pool*>(h);
  for (int32_t i = 0; i < n; i++) {
    int32_t bid = ids[i];
    if (bid <= 0 || bid >= p->num_blocks) continue;  // bounds guard
    if (p->ref[bid] == 0 && p->in_free[bid]) p->ll_remove(bid);
    p->ref[bid]++;
  }
}

void pool_free(void* h, const int32_t* ids, int32_t n) {
  Pool* p = static_cast<Pool*>(h);
  std::vector<int32_t> released;
  released.reserve(n);
  for (int32_t i = 0; i < n; i++) {
    int32_t bid = ids[i];
    if (bid <= 0 || bid >= p->num_blocks || p->ref[bid] <= 0)
      continue;  // bounds + double-free guard
    if (--p->ref[bid] == 0) released.push_back(bid);
  }
  for (auto it = released.rbegin(); it != released.rend(); ++it)
    p->ll_append(*it);
}

int32_t pool_allocate_specific(void* h, int32_t bid) {
  Pool* p = static_cast<Pool*>(h);
  if (bid <= 0 || bid >= p->num_blocks) return 0;
  if (p->ref[bid] != 0 || !p->in_free[bid]) return 0;
  p->ll_remove(bid);
  p->evict_hash(bid);
  p->ref[bid] = 1;
  return 1;
}

void pool_cache(void* h, int32_t bid, uint64_t digest) {
  Pool* p = static_cast<Pool*>(h);
  if (!p->enable_caching || bid <= 0) return;
  if (p->hash_of.count(bid) || p->block_of.count(digest)) return;
  p->hash_of[bid] = digest;
  p->block_of[digest] = bid;
}

int32_t pool_get_cached(void* h, uint64_t digest) {
  Pool* p = static_cast<Pool*>(h);
  if (!p->enable_caching) return -1;
  p->cache_queries++;
  auto it = p->block_of.find(digest);
  if (it == p->block_of.end()) return -1;
  p->cache_hits++;
  return it->second;
}

int32_t pool_num_free(void* h) { return static_cast<Pool*>(h)->num_free; }
int32_t pool_ref(void* h, int32_t bid) {
  Pool* p = static_cast<Pool*>(h);
  if (bid < 0 || bid >= p->num_blocks) return 0;
  return p->ref[bid];
}
int64_t pool_cache_hits(void* h) { return static_cast<Pool*>(h)->cache_hits; }
int64_t pool_cache_queries(void* h) { return static_cast<Pool*>(h)->cache_queries; }
int64_t pool_cached_blocks(void* h) {
  return static_cast<int64_t>(static_cast<Pool*>(h)->block_of.size());
}

// ---------------------------------------------------------------------------
// Batch packing: the per-step ragged -> padded copy loop of the engine
// (_run_group array builds). One C call instead of a Python per-seq loop.
// ---------------------------------------------------------------------------

// seq_tokens: concatenated int64 tokens; seq_offsets[n+1]; positions likewise.
// Outputs are caller-allocated (b, t) / (b,) arrays, pre-zeroed.
void pack_batch(
    const int64_t* seq_tokens, const int32_t* seq_positions,
    const int32_t* seq_offsets, int32_t n_seqs, int32_t t_pad,
    int64_t* out_tokens, int32_t* out_positions, uint8_t* out_valid,
    int32_t* out_last_idx) {
  for (int32_t s = 0; s < n_seqs; s++) {
    const int32_t a = seq_offsets[s], b = seq_offsets[s + 1];
    const int32_t len = b - a;
    int64_t* tok_row = out_tokens + (int64_t)s * t_pad;
    int32_t* pos_row = out_positions + (int64_t)s * t_pad;
    uint8_t* val_row = out_valid + (int64_t)s * t_pad;
    for (int32_t i = 0; i < len; i++) {
      tok_row[i] = seq_tokens[a + i];
      pos_row[i] = seq_positions[a + i];
      val_row[i] = 1;
    }
    out_last_idx[s] = len - 1;
  }
}

}  // extern "C"
