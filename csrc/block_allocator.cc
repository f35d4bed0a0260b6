// Native block allocator core for the paged KV-cache manager.
//
// The role the reference fills with csrc/ native code for its hot paths is
// filled here for the HOST-side hot path: per-step block allocate/free,
// hash-indexed prefix caching and LRU eviction (the semantics of
// vllm/core/block_manager_v1.py CachedBlockAllocator + evictor_v2.py
// LRUEvictor). Eviction uses an ordered set keyed by
// (last_accessed, -num_hashed_tokens, block_number) so evict() is O(log n)
// where the Python implementation scans the whole free table.
//
// Exposed as a minimal C ABI consumed by ctypes
// (neural_magic_vllm_tpu/core/native_allocator.py).
//
// Build: g++ -O2 -shared -fPIC -o libnmv_alloc.so block_allocator.cc

#include <cstdint>
#include <map>
#include <set>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

struct Block {
  int64_t hash = 0;
  int64_t num_hashed_tokens = 0;
  int32_t block_number = -1;
  int32_t ref_count = 0;
  double last_accessed = -1.0;
  bool computed = false;
};

using EvictKey = std::tuple<double, int64_t, int32_t>;

struct CachedAllocator {
  int32_t num_blocks = 0;
  int32_t current_num_blocks = 0;
  int64_t default_hash_ctr = 0;
  std::vector<Block> blocks;                      // by block_number
  std::unordered_map<int64_t, int32_t> cached;    // hash -> block_number
  std::unordered_map<int64_t, int32_t> free_tbl;  // hash -> block_number
  // (last_accessed, -num_hashed_tokens, block_number) -> block_number
  std::map<EvictKey, int32_t> evict_order;

  explicit CachedAllocator(int32_t n) : num_blocks(n) { blocks.reserve(n); }

  EvictKey key_of(const Block& b) const {
    return {b.last_accessed, -b.num_hashed_tokens, b.block_number};
  }

  void evictor_add(int32_t bn) {
    free_tbl[blocks[bn].hash] = bn;
    evict_order[key_of(blocks[bn])] = bn;
  }

  void evictor_remove(int32_t bn) {
    free_tbl.erase(blocks[bn].hash);
    evict_order.erase(key_of(blocks[bn]));
  }

  // returns block_number or -1 (out of memory and nothing evictable)
  int32_t allocate(int64_t hash, int64_t num_hashed_tokens, bool has_hash) {
    if (!has_hash) hash = -(++default_hash_ctr);
    auto ev = free_tbl.find(hash);
    if (ev != free_tbl.end()) {  // resurrect from the evictor
      int32_t bn = ev->second;
      evictor_remove(bn);
      cached[hash] = bn;
      blocks[bn].ref_count += 1;
      return bn;
    }
    auto it = cached.find(hash);
    if (it != cached.end()) {  // prefix-cache hit
      blocks[it->second].ref_count += 1;
      return it->second;
    }
    int32_t bn;
    if (current_num_blocks == num_blocks) {  // evict LRU
      if (evict_order.empty()) return -1;
      bn = evict_order.begin()->second;
      evictor_remove(bn);
      blocks[bn].hash = hash;
      blocks[bn].num_hashed_tokens = num_hashed_tokens;
      blocks[bn].computed = false;
    } else {
      bn = current_num_blocks++;
      blocks.push_back(Block{});
      blocks[bn].block_number = bn;
      blocks[bn].hash = hash;
      blocks[bn].num_hashed_tokens = num_hashed_tokens;
    }
    blocks[bn].ref_count = 1;
    cached[hash] = bn;
    return bn;
  }

  // returns new ref_count or -1 on double free
  int32_t free_block(int32_t bn) {
    Block& b = blocks[bn];
    if (b.ref_count == 0) return -1;
    b.ref_count -= 1;
    if (b.ref_count == 0) {
      cached.erase(b.hash);
      evictor_add(bn);
    }
    return b.ref_count;
  }

  bool contains(int64_t hash) const {
    return cached.count(hash) > 0 || free_tbl.count(hash) > 0;
  }

  int32_t num_free() const {
    return num_blocks - current_num_blocks +
           static_cast<int32_t>(free_tbl.size());
  }

  // promote placeholder hash -> content hash (block must be live)
  bool update_hash(int64_t new_hash, int32_t bn) {
    if (contains(new_hash)) return false;
    Block& b = blocks[bn];
    cached.erase(b.hash);
    b.hash = new_hash;
    cached[new_hash] = bn;
    return true;
  }

  void set_last_accessed(int32_t bn, double ts) {
    Block& b = blocks[bn];
    bool in_evictor = free_tbl.count(b.hash) && free_tbl[b.hash] == bn;
    if (in_evictor) evict_order.erase(key_of(b));
    b.last_accessed = ts;
    if (in_evictor) evict_order[key_of(b)] = bn;
  }
};

}  // namespace

extern "C" {

void* nmv_cached_alloc_new(int32_t num_blocks) {
  return new CachedAllocator(num_blocks);
}

void nmv_cached_alloc_delete(void* h) {
  delete static_cast<CachedAllocator*>(h);
}

int32_t nmv_allocate(void* h, int64_t hash, int64_t num_hashed_tokens,
                     int32_t has_hash) {
  return static_cast<CachedAllocator*>(h)->allocate(hash, num_hashed_tokens,
                                                    has_hash != 0);
}

int32_t nmv_free_block(void* h, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->free_block(bn);
}

int32_t nmv_contains(void* h, int64_t hash) {
  return static_cast<CachedAllocator*>(h)->contains(hash) ? 1 : 0;
}

int32_t nmv_num_free(void* h) {
  return static_cast<CachedAllocator*>(h)->num_free();
}

int32_t nmv_update_hash(void* h, int64_t new_hash, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->update_hash(new_hash, bn) ? 1 : 0;
}

int64_t nmv_get_hash(void* h, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->blocks[bn].hash;
}

int32_t nmv_get_ref_count(void* h, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->blocks[bn].ref_count;
}

void nmv_set_ref_count(void* h, int32_t bn, int32_t v) {
  static_cast<CachedAllocator*>(h)->blocks[bn].ref_count = v;
}

int64_t nmv_get_num_hashed_tokens(void* h, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->blocks[bn].num_hashed_tokens;
}

void nmv_set_num_hashed_tokens(void* h, int32_t bn, int64_t v) {
  static_cast<CachedAllocator*>(h)->blocks[bn].num_hashed_tokens = v;
}

void nmv_set_last_accessed(void* h, int32_t bn, double ts) {
  static_cast<CachedAllocator*>(h)->set_last_accessed(bn, ts);
}

double nmv_get_last_accessed(void* h, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->blocks[bn].last_accessed;
}

void nmv_set_computed(void* h, int32_t bn, int32_t v) {
  static_cast<CachedAllocator*>(h)->blocks[bn].computed = v != 0;
}

int32_t nmv_get_computed(void* h, int32_t bn) {
  return static_cast<CachedAllocator*>(h)->blocks[bn].computed ? 1 : 0;
}

}  // extern "C"
