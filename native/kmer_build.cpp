// Native k-mer index builder for shotgun_tpu (k <= 31 fast path).
//
// Replaces the host-numpy assembly in shotgun_tpu/index/build.py for the
// common k <= 31 case (u64-packable keys): rolling 2-bit encode with
// N-run skipping, a stable multithreaded LSD radix sort over the packed
// keys, group-boundary detection, CSR postings gather, and the
// deduplicated genome-set table -- all in one pass chain, producing
// byte-identical kmer_words / first_seen / postings to the numpy path
// (set ids are assigned in first-appearance order, a permutation of the
// numpy path's sorted-mask order; set-id numbering is internal and
// observationally irrelevant, see index/build.py KmerIndex docstring).
//
// The reference this replaces is the nested-dict build loop at
// reference kmer.py:135-150 (k-mer -> {record -> positions}); the array
// layout contract is KmerIndex in shotgun_tpu/index/build.py.
//
// Two-call protocol like the parser: stpu_build_index runs the build and
// returns an opaque handle plus output sizes; stpu_build_fetch copies
// into caller-allocated numpy buffers; stpu_build_free releases.

#include <sys/mman.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Allocator backing large buffers with MADV_HUGEPAGE mmaps.  This host's
// first-touch page-fault rate on 4K pages is ~0.08 GB/s (measured) while
// hugepage-advised regions fault at ~1.8 GB/s -- a 20x difference that
// dominates the whole build at multi-Mbp scale, since every buffer here
// is written exactly once.
template <class T>
struct HugeAlloc {
  using value_type = T;
  static constexpr size_t kThreshold = 1 << 20;
  HugeAlloc() = default;
  template <class U>
  HugeAlloc(const HugeAlloc<U>&) {}
  T* allocate(size_t n) {
    size_t bytes = n * sizeof(T);
    if (bytes >= kThreshold) {
      void* p = mmap(nullptr, bytes, PROT_READ | PROT_WRITE,
                     MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
      if (p != MAP_FAILED) {
        madvise(p, bytes, MADV_HUGEPAGE);
        return (T*)p;
      }
    }
    return (T*)std::malloc(bytes);
  }
  void deallocate(T* p, size_t n) {
    size_t bytes = n * sizeof(T);
    if (bytes >= kThreshold)
      munmap(p, bytes);
    else
      std::free(p);
  }
  template <class U>
  bool operator==(const HugeAlloc<U>&) const { return true; }
  template <class U>
  bool operator!=(const HugeAlloc<U>&) const { return false; }
};

template <class T>
using hvec = std::vector<T, HugeAlloc<T>>;

// phase timing to stderr when STPU_BUILD_DEBUG=1
struct PhaseTimer {
  bool on;
  std::chrono::steady_clock::time_point t;
  PhaseTimer() : on(std::getenv("STPU_BUILD_DEBUG") != nullptr) { reset(); }
  void reset() { t = std::chrono::steady_clock::now(); }
  void mark(const char* name) {
    if (!on) return;
    auto now = std::chrono::steady_clock::now();
    std::fprintf(stderr, "[stpu_build] %s: %.3fs\n", name,
                 std::chrono::duration<double>(now - t).count());
    t = now;
  }
};

constexpr int kRadixBits = 16;
constexpr int kRadixSize = 1 << kRadixBits;

// Two-stage state: stage 1 owns the sorted occurrence arrays; stage 2
// streams them straight into caller (numpy) buffers, so no large output
// is ever materialized on this side -- on this host every avoided
// first-touch + memcpy of the ~36 B/posting outputs is the difference
// between ~5 and ~10+ Mbp/s.
struct BuildState {
  int64_t num_kmers = 0;   // U (known after stage 1)
  int64_t num_post = 0;    // P
  int64_t num_records = 0;
  int64_t gbytes = 0;
  hvec<uint64_t> keys;     // sorted
  hvec<uint64_t> recpos;   // rec << 32 | pos, sorted alongside keys
  std::vector<uint8_t> set_masks;  // [S, gbytes] (filled by stage 2)
  std::vector<int32_t> set_sizes;  // [S]
};

// Stable LSD radix sort of (keys, vals) pairs by key, 16-bit digits,
// low digit first, parallel histogram + scatter over `nt` threads.
// Only digits below `used_bits` are sorted (higher bits are zero).
void radix_sort_u64(hvec<uint64_t>& keys, hvec<uint64_t>& vals,
                    int used_bits, int nt) {
  const size_t n = keys.size();
  if (n < 2) return;
  hvec<uint64_t> kbuf(n);
  hvec<uint64_t> vbuf(n);
  uint64_t* ksrc = keys.data();
  uint64_t* vsrc = vals.data();
  uint64_t* kdst = kbuf.data();
  uint64_t* vdst = vbuf.data();

  const int passes = (used_bits + kRadixBits - 1) / kRadixBits;
  // per-thread slice bounds
  std::vector<size_t> cut(nt + 1);
  for (int t = 0; t <= nt; ++t) cut[t] = n * (size_t)t / (size_t)nt;

  for (int pass = 0; pass < passes; ++pass) {
    const int shift = pass * kRadixBits;
    // per-thread histograms
    std::vector<std::vector<uint64_t>> hist(nt,
                                            std::vector<uint64_t>(kRadixSize));
    auto count = [&](int t) {
      auto& h = hist[t];
      for (size_t i = cut[t]; i < cut[t + 1]; ++i)
        ++h[(ksrc[i] >> shift) & (kRadixSize - 1)];
    };
    if (nt > 1) {
      std::vector<std::thread> th;
      for (int t = 0; t < nt; ++t) th.emplace_back(count, t);
      for (auto& x : th) x.join();
    } else {
      count(0);
    }
    // single-bucket pass -> nothing to move
    bool trivial = false;
    {
      uint64_t tot0 = 0;
      uint64_t d0 = (ksrc[0] >> shift) & (kRadixSize - 1);
      for (int t = 0; t < nt; ++t) tot0 += hist[t][d0];
      trivial = (tot0 == (uint64_t)n);
    }
    if (trivial) continue;
    // global exclusive offsets, thread-major within each bucket
    // (stability: thread t's elements of bucket b land after thread t-1's)
    uint64_t run = 0;
    for (int b = 0; b < kRadixSize; ++b) {
      for (int t = 0; t < nt; ++t) {
        uint64_t c = hist[t][b];
        hist[t][b] = run;
        run += c;
      }
    }
    auto scatter = [&](int t) {
      auto& off = hist[t];
      for (size_t i = cut[t]; i < cut[t + 1]; ++i) {
        uint64_t key = ksrc[i];
        uint64_t o = off[(key >> shift) & (kRadixSize - 1)]++;
        kdst[o] = key;
        vdst[o] = vsrc[i];
      }
    };
    if (nt > 1) {
      std::vector<std::thread> th;
      for (int t = 0; t < nt; ++t) th.emplace_back(scatter, t);
      for (auto& x : th) x.join();
    } else {
      scatter(0);
    }
    std::swap(ksrc, kdst);
    std::swap(vsrc, vdst);
  }
  if (ksrc != keys.data()) {
    keys.swap(kbuf);
    vals.swap(vbuf);
  }
}

// Open-addressing dedupe table for set masks (mask bytes -> set id).
struct MaskTable {
  int64_t gbytes;
  std::vector<int32_t> slots;     // sid + 1, 0 = empty
  std::vector<uint64_t> hashes;   // cached hash per slot
  size_t mask_count = 0;
  std::vector<uint8_t>* arena;    // set_masks storage (sid-indexed rows)

  explicit MaskTable(int64_t gb, std::vector<uint8_t>* masks)
      : gbytes(gb), slots(1024, 0), hashes(1024, 0), arena(masks) {}

  static uint64_t hash_bytes(const uint8_t* p, int64_t n) {
    uint64_t h = 1469598103934665603ull;  // FNV-1a
    for (int64_t i = 0; i < n; ++i) {
      h ^= p[i];
      h *= 1099511628211ull;
    }
    return h | 1;  // never 0
  }

  void grow() {
    size_t cap = slots.size() * 2;
    std::vector<int32_t> ns(cap, 0);
    std::vector<uint64_t> nh(cap, 0);
    for (size_t i = 0; i < slots.size(); ++i) {
      if (!slots[i]) continue;
      size_t j = hashes[i] & (cap - 1);
      while (ns[j]) j = (j + 1) & (cap - 1);
      ns[j] = slots[i];
      nh[j] = hashes[i];
    }
    slots.swap(ns);
    hashes.swap(nh);
  }

  // returns sid of mask (inserting if new)
  int32_t intern(const uint8_t* mask) {
    if (mask_count * 10 >= slots.size() * 7) grow();
    uint64_t h = hash_bytes(mask, gbytes);
    size_t cap = slots.size();
    size_t j = h & (cap - 1);
    while (slots[j]) {
      if (hashes[j] == h &&
          std::memcmp(arena->data() + (size_t)(slots[j] - 1) * gbytes, mask,
                      (size_t)gbytes) == 0)
        return slots[j] - 1;
      j = (j + 1) & (cap - 1);
    }
    int32_t sid = (int32_t)mask_count++;
    slots[j] = sid + 1;
    hashes[j] = h;
    arena->insert(arena->end(), mask, mask + gbytes);
    return sid;
  }
};

}  // namespace

// out_sizes (int64[8]): [0]=U [1]=P [2]=gbytes [3..7] reserved.
// Returns nullptr when the input is out of the fast path's domain
// (k > 31, records longer than 2^31, or >= 2^32-1 valid windows) --
// the caller falls back to the numpy assembly (any k).
extern "C" void* stpu_build_stage1(const uint8_t* codes, int64_t n_bases,
                                   const int64_t* offsets, int64_t n_records,
                                   int64_t k, int64_t* out_sizes) {
  if (k < 1 || k > 31) return nullptr;
  if (n_records >= (int64_t)1 << 31) return nullptr;
  for (int64_t r = 0; r < n_records; ++r)
    if (offsets[r + 1] - offsets[r] >= (int64_t)1 << 31) return nullptr;
  (void)n_bases;
  PhaseTimer pt;
  auto* st = new BuildState();
  st->num_records = n_records;
  st->gbytes = n_records > 0 ? (n_records + 7) / 8 : 1;

  // ---- phase 1: occurrence generation (rolling encode, N-run skip) ----
  // reference kmer.py:84-94 extract_kmers_from_genome + the N skip at
  // kmer.py:145; key layout: first base most significant 2-bit group
  // (matches index/build.py rolling_encode_words little-word columns).
  {
    int64_t total = 0;
    for (int64_t r = 0; r < n_records; ++r) {
      int64_t len = offsets[r + 1] - offsets[r];
      if (len >= k) total += len - k + 1;
    }
    st->keys.reserve(total);
    st->recpos.reserve(total);
  }
  const uint64_t mask =
      (k >= 32) ? ~0ull : ((1ull << (2 * (unsigned)k)) - 1ull);
  for (int64_t r = 0; r < n_records; ++r) {
    const uint8_t* p = codes + offsets[r];
    const int64_t len = offsets[r + 1] - offsets[r];
    const uint64_t rbits = (uint64_t)r << 32;
    uint64_t key = 0;
    int64_t run = 0;
    for (int64_t i = 0; i < len; ++i) {
      uint8_t c = p[i];
      if (c >= 4) {  // N (or invalid) breaks every window containing it
        run = 0;
        key = 0;
        continue;
      }
      key = ((key << 2) | c) & mask;
      if (++run >= k) {
        st->keys.push_back(key);
        st->recpos.push_back(rbits | (uint64_t)(uint32_t)(i - k + 1));
      }
    }
  }
  pt.mark("encode");
  const int64_t P = (int64_t)st->keys.size();
  if (P >= (int64_t)UINT32_MAX) {
    delete st;
    return nullptr;
  }
  st->num_post = P;

  if (P) {
    // ---- phase 2: stable radix sort by key, (rec, pos) payload ----
    // Carrying recpos through the scatter (instead of a row index) makes
    // the postings fill a sequential read in stage 2 -- the row-index
    // variant paid one random 8-byte read per posting, the dominant cost
    // at 10 Mbp scale.  first_seen uses recpos directly: (rec << 32 |
    // pos) is order-isomorphic to the scan order (record-major,
    // position-ascending, N-windows never emitted), and only the ORDER
    // of first_seen is observable (KmerIndex.display_order is argsort).
    unsigned hw = std::thread::hardware_concurrency();
    int nt = hw >= 2 && P > (1 << 16) ? 2 : 1;
    radix_sort_u64(st->keys, st->recpos, 2 * (int)k, nt);
    pt.mark("sort");

    // ---- phase 3: count groups (pre-sizes every output exactly) ----
    int64_t U = 0;
    const uint64_t* kk = st->keys.data();
    std::vector<int64_t> part(nt, 0);
    auto countr = [&](int t) {
      int64_t lo = P * (int64_t)t / nt, hi = P * (int64_t)(t + 1) / nt;
      int64_t c = 0;
      for (int64_t i = lo; i < hi; ++i)
        c += (i == 0) || (kk[i] != kk[i - 1]);
      part[t] = c;
    };
    if (nt > 1) {
      std::vector<std::thread> th;
      for (int t = 0; t < nt; ++t) th.emplace_back(countr, t);
      for (auto& x : th) x.join();
    } else {
      countr(0);
    }
    for (int t = 0; t < nt; ++t) U += part[t];
    st->num_kmers = U;
    pt.mark("count");
  }

  out_sizes[0] = st->num_kmers;
  out_sizes[1] = st->num_post;
  out_sizes[2] = st->gbytes;
  return st;
}

// Stage 2: stream the sorted occurrences into the caller's buffers
// (kmer_words [U,2] u32, first_seen [U] i64, post_offsets [U+1] i64,
// post_record [P] i32, post_pos [P] i64, set_id [U] i32) and build the
// set table.  Returns S (number of distinct genome sets).
extern "C" int64_t stpu_build_stage2(void* handle, uint32_t* kmer_words,
                                     int64_t* first_seen,
                                     int64_t* post_offsets,
                                     int32_t* post_record, int64_t* post_pos,
                                     int32_t* set_id) {
  auto* st = (BuildState*)handle;
  PhaseTimer pt;
  const int64_t P = st->num_post;
  const int64_t U = st->num_kmers;
  const int64_t gbytes = st->gbytes;
  if (P == 0) {
    post_offsets[0] = 0;
    return 0;
  }
  st->set_masks.reserve(4096 * gbytes);
  MaskTable table(gbytes, &st->set_masks);
  // singleton sets ({record}) bypass the hash table
  std::vector<int32_t> singleton_sid(
      st->num_records > 0 ? st->num_records : 1, -1);
  std::vector<uint8_t> scratch(gbytes);

  const uint64_t* kk = st->keys.data();
  const uint64_t* rp = st->recpos.data();
  // thread A: postings are a pure elementwise split of sorted recpos
  std::thread postings_thread([&] {
    for (int64_t i = 0; i < P; ++i) {
      uint64_t v = rp[i];
      post_record[i] = (int32_t)(v >> 32);
      post_pos[i] = (int64_t)(uint32_t)v;
    }
  });
  // main thread: group boundaries + set table, reading keys/recpos only
  // (distinct records of a group are adjacent-unique: the stable sort
  // keeps scan order and occurrences are generated record-major)
  int64_t u = 0;
  for (int64_t gstart = 0; gstart < P;) {
    const uint64_t key = kk[gstart];
    int32_t first_rec = (int32_t)(rp[gstart] >> 32);
    bool single = true;
    int64_t i = gstart + 1;
    for (; i < P && kk[i] == key; ++i)
      if ((int32_t)(rp[i] >> 32) != first_rec) single = false;
    const int64_t gend = i;
    kmer_words[2 * u] = (uint32_t)(key & 0xFFFFFFFFu);
    kmer_words[2 * u + 1] = (uint32_t)(key >> 32);
    first_seen[u] = (int64_t)rp[gstart];
    post_offsets[u] = gstart;
    int32_t sid;
    if (single) {
      sid = singleton_sid[first_rec];
      if (sid < 0) {
        std::memset(scratch.data(), 0, (size_t)gbytes);
        scratch[first_rec >> 3] = (uint8_t)(1u << (first_rec & 7));
        sid = table.intern(scratch.data());
        singleton_sid[first_rec] = sid;
        st->set_sizes.push_back(1);
      }
    } else {
      std::memset(scratch.data(), 0, (size_t)gbytes);
      int32_t prev = -1, d = 0;
      for (int64_t j = gstart; j < gend; ++j) {
        int32_t rr = (int32_t)(rp[j] >> 32);
        if (rr != prev) {
          scratch[rr >> 3] |= (uint8_t)(1u << (rr & 7));
          prev = rr;
          ++d;
        }
      }
      size_t before = table.mask_count;
      sid = table.intern(scratch.data());
      if (table.mask_count > before) st->set_sizes.push_back(d);
    }
    set_id[u] = sid;
    ++u;
    gstart = gend;
  }
  postings_thread.join();
  post_offsets[U] = P;
  pt.mark("groups");
  return (int64_t)st->set_sizes.size();
}

extern "C" void stpu_build_fetch_sets(void* handle, uint8_t* set_masks,
                                      int32_t* set_sizes) {
  auto* st = (BuildState*)handle;
  if (!st->set_masks.empty())
    std::memcpy(set_masks, st->set_masks.data(), st->set_masks.size());
  if (!st->set_sizes.empty())
    std::memcpy(set_sizes, st->set_sizes.data(),
                st->set_sizes.size() * sizeof(int32_t));
}

extern "C" void stpu_build_free(void* handle) { delete (BuildState*)handle; }
