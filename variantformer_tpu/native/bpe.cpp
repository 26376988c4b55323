// DNA BPE encoder — native core of the framework's tokenizer.
//
// Replaces the reference's Rust `tokenizers` dependency for the hot path:
// greedy lowest-rank-first pair merging over a doubly-linked symbol list with
// a lazy binary heap, operating in token-id space (the Python layer maps the
// HuggingFace-JSON vocabulary/merges to (left_id, right_id) -> result_id
// triples once at load).
//
// C ABI (ctypes-friendly):
//   vfx_bpe_create(n_merges, left[], right[], result[], char_to_id[256])
//   vfx_bpe_encode(handle, seq, n, out_ids, out_starts, out_ends, max_out)
//   vfx_bpe_destroy(handle)

#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct MergeInfo {
  int32_t rank;
  int32_t result;
};

struct Encoder {
  std::unordered_map<uint64_t, MergeInfo> merges;  // (a<<32|b) -> info
  int32_t char_to_id[256];
};

inline uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

struct HeapItem {
  int32_t rank;
  int32_t pos;       // node index of the left element
  int32_t left_id;   // expected symbol ids at push time (lazy validation)
  int32_t right_id;
  bool operator>(const HeapItem& o) const {
    if (rank != o.rank) return rank > o.rank;
    return pos > o.pos;
  }
};

}  // namespace

extern "C" {

void* vfx_bpe_create(int32_t n_merges, const int32_t* left, const int32_t* right,
                     const int32_t* result, const int32_t* char_to_id) {
  auto* enc = new Encoder();
  enc->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int32_t r = 0; r < n_merges; ++r) {
    enc->merges.emplace(pair_key(left[r], right[r]), MergeInfo{r, result[r]});
  }
  std::memcpy(enc->char_to_id, char_to_id, 256 * sizeof(int32_t));
  return enc;
}

void vfx_bpe_destroy(void* handle) { delete static_cast<Encoder*>(handle); }

// Encode one subsequence (all chars must be alphabet members).
// Returns the token count, or -1 on invalid char, or -2 if max_out too small.
int32_t vfx_bpe_encode(void* handle, const char* seq, int32_t n,
                       int32_t* out_ids, int32_t* out_starts,
                       int32_t* out_ends, int32_t max_out) {
  const Encoder* enc = static_cast<const Encoder*>(handle);
  if (n <= 0) return 0;

  std::vector<int32_t> sym(n), start(n), end(n), prev(n), next(n);
  for (int32_t i = 0; i < n; ++i) {
    int32_t id = enc->char_to_id[static_cast<uint8_t>(seq[i])];
    if (id < 0) return -1;
    sym[i] = id;
    start[i] = i;
    end[i] = i + 1;
    prev[i] = i - 1;
    next[i] = (i + 1 < n) ? i + 1 : -1;
  }

  std::priority_queue<HeapItem, std::vector<HeapItem>, std::greater<HeapItem>>
      heap;
  for (int32_t i = 0; i + 1 < n; ++i) {
    auto it = enc->merges.find(pair_key(sym[i], sym[i + 1]));
    if (it != enc->merges.end()) {
      heap.push({it->second.rank, i, sym[i], sym[i + 1]});
    }
  }

  std::vector<uint8_t> alive(n, 1);
  while (!heap.empty()) {
    HeapItem item = heap.top();
    heap.pop();
    int32_t i = item.pos;
    if (!alive[i] || sym[i] != item.left_id) continue;
    int32_t j = next[i];
    if (j < 0 || sym[j] != item.right_id) continue;
    auto it = enc->merges.find(pair_key(sym[i], sym[j]));
    if (it == enc->merges.end() || it->second.rank != item.rank) continue;

    sym[i] = it->second.result;
    end[i] = end[j];
    alive[j] = 0;
    int32_t k = next[j];
    next[i] = k;
    if (k >= 0) {
      prev[k] = i;
      auto nit = enc->merges.find(pair_key(sym[i], sym[k]));
      if (nit != enc->merges.end()) {
        heap.push({nit->second.rank, i, sym[i], sym[k]});
      }
    }
    int32_t p = prev[i];
    if (p >= 0) {
      auto pit = enc->merges.find(pair_key(sym[p], sym[i]));
      if (pit != enc->merges.end()) {
        heap.push({pit->second.rank, p, sym[p], sym[i]});
      }
    }
  }

  int32_t count = 0;
  for (int32_t i = 0; i >= 0; i = next[i]) {
    if (!alive[i]) continue;
    if (count >= max_out) return -2;
    out_ids[count] = sym[i];
    out_starts[count] = start[i];
    out_ends[count] = end[i];
    ++count;
  }
  return count;
}

}  // extern "C"
