// tamp-tpu native engine: table-assisted committer, standalone codec, decoder.
//
// Design (see tamp_tpu/engine/__init__.py): the TPU computes per-position
// match tables (the O(N*W) work); this library runs the O(N) sequential
// greedy commit with the reference encoder's exact semantics — RLE and
// extended-match state machines, lazy matching, flush-drain tail — and packs
// bits at memory speed.  Behavioral spec: BrianPugh/tamp
// tamp/compressor.py:281-447 and tamp/_c_src/tamp/decompressor.c (semantics
// re-implemented, not ported).
//
// Extended-format window divergence: RLE writes at most 8 bytes and
// extended matches never wrap, so the ring can diverge from the pure input
// history the tables were computed against.  The committer tracks deletion
// events and validates each table candidate against the true write history
// (position mapping + residency + ring-linearity); invalid candidates fall
// back to an exact scalar search over the materialized ring.  Before the
// first divergence the tables are used verbatim, preserving byte parity
// with the reference encoder.
//
// Build: g++ -O3 -shared -fPIC (see build.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <utility>

namespace {

// ---- format constants (docs/source/specification.rst) ---------------------
const uint16_t HUFF_CODE[15] = {0x00, 0x03, 0x08, 0x0B, 0x14, 0x24, 0x26, 0x2B,
                                0x4B, 0x54, 0x94, 0x95, 0xAA, 0x27, 0xAB};
const uint8_t HUFF_BITS[15] = {2, 3, 5, 5, 6, 7, 7, 7, 8, 8, 9, 9, 9, 7, 9};
const int RLE_SYM = 12, EXT_SYM = 13, FLUSH_SYM = 14;
const int RLE_TRAIL = 4, EXT_TRAIL = 3;
const int RLE_MAX = 241, RLE_MAX_WIN = 8;
const int LOOKAHEAD = 16;

// Build knob (overridable with -DTAMP_TRI_MIN_WINDOW=<n>, wired through the
// TAMP_TRI_MIN_WINDOW env var by _native/__init__.py; delete libtampnative.so
// to force a rebuild after changing it): smallest window size that maintains
// hashed trigram chains alongside the 2-byte chains.
#ifndef TAMP_TRI_MIN_WINDOW
#define TAMP_TRI_MIN_WINDOW 2048
#endif

uint8_t SYM_TAB[256], LEN_TAB[256];
bool huff_tables_ready = false;
void ensure_huff_tables() {
  if (huff_tables_ready) return;
  std::memset(SYM_TAB, 0xFF, 256);
  for (int sym = 0; sym < 15; sym++) {
    int nb = HUFF_BITS[sym] - 1;
    uint32_t code = HUFF_CODE[sym];
    for (uint32_t j = 0; j < (1u << (8 - nb)); j++) {
      SYM_TAB[(code << (8 - nb)) | j] = (uint8_t)sym;
      LEN_TAB[(code << (8 - nb)) | j] = (uint8_t)nb;
    }
  }
  huff_tables_ready = true;
}

inline int min_pattern_size(int window, int literal) {
  return 2 + (window > (10 + ((literal - 5) << 1)) ? 1 : 0);
}

// ---- xorshift32 dictionary (spec "Dictionary Initialization") -------------
void init_dictionary(uint8_t* buf, int64_t size, int literal) {
  static const uint8_t common[16] = {' ', 'e', 't', 'a', 'o', 'i', 'n', 's',
                                     'h', 'r', 'd', 'l', 'c', 'u', 'm', 'w'};
  static const uint8_t chars8[16] = {' ', 0, '0', 'e', 'i', '>', 't', 'o',
                                     '<', 'a', 'n', 's', '\n', 'r', '/', '.'};
  uint8_t chars[16];
  if (literal <= 6) {
    uint8_t mask = (uint8_t)((1u << literal) - 1);
    for (int i = 0; i < 16; i++) chars[i] = common[i] & mask;
  } else {
    std::memcpy(chars, chars8, 16);
  }
  uint32_t s = 3758097560u;
  int64_t words = size >> 3;
  uint8_t* p = buf;
  for (int64_t i = 0; i < words; i++) {
    s ^= s << 13; s ^= s >> 17; s ^= s << 5;
    uint32_t v = s;
    for (int k = 0; k < 8; k++) { *p++ = chars[v & 0xF]; v >>= 4; }
  }
  if ((size & 7) != 0) std::memset(buf + words * 8, 0, size & 7);
}

// ---- bit writer ------------------------------------------------------------
struct BitWriter {
  uint8_t* out; int64_t cap; int64_t n = 0;
  uint64_t acc = 0; int bits = 0; bool overflow = false;
  BitWriter(uint8_t* o, int64_t c) : out(o), cap(c) {}
  inline void put(uint32_t code, int nbits) {
    acc = (acc << nbits) | (code & ((1u << nbits) - 1));
    bits += nbits;
    if (bits >= 8) {
      int nb = bits >> 3;
      if (__builtin_expect(n + nb > cap, 0)) {  // slow path: per-byte check
        while (bits >= 8) {
          if (n >= cap) { overflow = true; bits = 0; return; }
          out[n++] = (uint8_t)(acc >> (bits - 8));
          bits -= 8;
        }
        return;
      }
      do {
        bits -= 8;
        out[n++] = (uint8_t)(acc >> bits);
      } while (bits >= 8);
    }
  }
  inline void pad() {
    if (bits > 0) {
      if (n >= cap) { overflow = true; return; }
      out[n++] = (uint8_t)(acc << (8 - bits));
      bits = 0;
    }
    acc = 0;
  }
  inline void huff(int sym) { put(HUFF_CODE[sym], HUFF_BITS[sym]); }
  inline void ext_value(int value, int trail) {  // secondary huffman + trail
    int sym = value >> trail;
    put(HUFF_CODE[sym], HUFF_BITS[sym] - 1);
    put(value & ((1 << trail) - 1), trail);
  }
};

// ---- exact linear-buffer search ------------------------------------------
// Semantics: lowest ring index among the maximal-length matches of a prefix
// of target, equal to the reference's growing-prefix search
// (tamp/compressor.py:432-447) but computed in one pass: memchr proposes
// first-byte candidates, each extended with word-at-a-time XOR compare
// (the same idea as the reference's desktop SWAR finder, re-derived).
inline int match_extent(const uint8_t* a, const uint8_t* b, int limit) {
  int k = 0;
  while (limit - k >= 8) {
    uint64_t wa, wb;
    std::memcpy(&wa, a + k, 8);
    std::memcpy(&wb, b + k, 8);
    uint64_t x = wa ^ wb;
    if (x) return k + (__builtin_ctzll(x) >> 3);
    k += 8;
  }
  while (k < limit && a[k] == b[k]) k++;
  return k;
}

struct SearchResult { int idx; int size; };

// ---- committer -------------------------------------------------------------
struct Committer {
  // config
  int W, wmask, wbits, literal, minp, maxpat;
  bool extended, lazy;
  // Split extended matches at the ring end instead of truncating the window
  // write: costs ~one extra token per ring cycle but keeps the true window
  // identical to the model the match tables were computed against.
  bool avoid_divergence = false;
  // Byte-parity table mode (reference-greedy): post-divergence the table
  // candidate only SEEDS the exact chain search instead of being trusted —
  // deletions shift ring content, creating adjacencies the pure-history
  // tables cannot see (a new longer match, or an equal-length match at a
  // lower slot), so trusting a validated candidate or a no-match entry can
  // flip a token vs the reference encoder.  With this flag the output is
  // byte-equal to the reference at every config (the seed only sharpens
  // quick-rejection; chain_search still walks every candidate).
  bool exact_tables = false;
  // input
  const uint8_t* data; int64_t N;
  // tables (may be null -> standalone exact mode)
  const uint8_t* flen = nullptr; const int32_t* fidx = nullptr;
  const uint8_t* plen = nullptr; const int32_t* pidx = nullptr;
  int full_cap = 0;
  // ring
  std::vector<uint8_t> ring; int pos = 0;
  std::vector<uint8_t> scratch;  // reusable copy buffer (avoids per-token alloc)
  // Exact 2-byte chains over the linear ring buffer: chead[pair] -> newest
  // absolute write position whose linear pair equals `pair`; cprev[slot]
  // links to the previous occurrence.  Entries older than wpos - W have
  // expired (their slot was overwritten), which also terminates walks.
  // Pairs starting at slot W-1 are never inserted (the linear buffer ends
  // there; matches cannot wrap), and the single pair that crosses the
  // write head (slot tau-1: newest byte followed by the oldest) is checked
  // explicitly in chain_search.
  std::vector<int32_t> chead, cprev;  // int32 halves the cache footprint
  // Trigram chains (hashed, verified): chead3[h3(tri)] -> newest absolute
  // position whose linear trigram hashes to that bucket.  Any length>=3
  // match starts with a trigram whose start slot is linear (s+2 < W), so
  // the trigram walk is exhaustive for length>=3 candidates; hash
  // collisions are rejected by verifying the first two bytes.  Pair chains
  // remain the exact source for length-2 matches.
  std::vector<int32_t> chead3, cprev3;
  // Trigram chains pay ~2 extra stores per window byte; they win only once
  // the pair chains get long (big windows).  Below the threshold the single
  // exact pair walk is faster end-to-end (measured: w<=10 pair-only wins,
  // w>=12 trigram wins).
  bool use_tri = false;
  static constexpr int H3_BITS = 15;
  static inline uint32_t h3(uint8_t a, uint8_t b, uint8_t c) {
    uint32_t k = ((uint32_t)a << 16) | ((uint32_t)b << 8) | c;
    return (k * 2654435761u) >> (32 - H3_BITS);
  }
  int64_t wpos = 0;                   // (rebased before chains could wrap)
  // Run plan (planned-RLE mode): long input runs (>=9) are RLE'd at fixed
  // positions so their window-write truncations are part of the model the
  // tables were computed against (the "C-hat" history).  khat[t] = number of
  // model-written bytes among input positions < t; plan = (rle_start, end)
  // pairs, sorted; no token may cross an rle_start boundary.
  const uint32_t* khat = nullptr;
  const int64_t* plan = nullptr; int n_plan = 0;
  int plan_i = 0;
  // Planned-mode model stream (dh = data[keep], M = khat[N]): table-less
  // planned searches target THIS stream, not the input — the device
  // planner's tables (ops/plan_ext.py) are model-target, and past a plan
  // boundary the two diverge (the model deletes RLE-region bytes), which
  // can flip the lowest-index-among-maximal tie-break of a boundary-capped
  // match even though every capped prefix is identical.
  const uint8_t* dh = nullptr; int64_t M = 0;
  std::vector<uint8_t> dh_own;
  inline int64_t chat(int64_t p) const {  // input position -> model position
    return khat ? (int64_t)khat[p] : p;
  }
  inline int64_t boundary() const {  // next uncrossable token boundary
    return plan_i < n_plan ? plan[2 * plan_i] : INT64_MAX;
  }

  // divergence bookkeeping: deleted MODEL-coordinate ranges [from, from+count)
  // (dynamic deviations from the model history, e.g. ring-end shortfalls)
  struct DelEvent { int64_t from, count, cum_prev; };
  bool diverged = false;
  std::vector<DelEvent> dels;  // sorted by from; ranges are disjoint
  // state
  int64_t t = 0;
  int rle_count = 0; int64_t rle_start = 0;
  int ext_count = 0; int ext_pos = 0; int64_t ext_start = 0;
  int cached_idx = -1, cached_size = 0;
  BitWriter* bw = nullptr;
  bool excess_bits = false;

  int64_t del_upto(int64_t p) const {  // deleted input positions < p
    if (dels.empty() || p <= dels.front().from) return 0;
    int lo = 0, hi = (int)dels.size();  // last event with from < p
    while (lo < hi) { int mid = (lo + hi) / 2;
      if (dels[mid].from < p) lo = mid + 1; else hi = mid; }
    const DelEvent& e = dels[lo - 1];
    int64_t inside = p - e.from;
    if (inside > e.count) inside = e.count;
    return e.cum_prev + inside;
  }
  void record_deletion(int64_t from, int64_t count) {
    if (!flen) return;  // only table validation reads these (bounds memory
                        // in table-less streaming use)
    int64_t base = dels.empty() ? 0 : dels.back().cum_prev + dels.back().count;
    dels.push_back({from, count, base});
    diverged = true;
  }

  inline uint8_t last_ring_byte() const {
    return ring[pos == 0 ? W - 1 : pos - 1];
  }
  inline void ring_push(uint8_t b) {
    if (pos != 0) {  // index the pair starting at the previous slot
      int key = ((int)ring[pos - 1] << 8) | b;
      cprev[pos - 1] = chead[key];
      chead[key] = (int32_t)(wpos - 1);
      if (use_tri && pos >= 2) {  // trigram starting two slots back
        uint32_t h = h3(ring[pos - 2], ring[pos - 1], b);
        cprev3[pos - 2] = chead3[h];
        chead3[h] = (int32_t)(wpos - 2);
      }
    }
    ring[pos] = b;
    wpos++;
    if (++pos == W) pos = 0;
    if (__builtin_expect(wpos >= 0x7F000000LL, 0)) rebase_chains();
  }

  // Batched ring_push over a contiguous source: identical chain/ring state,
  // but the wrap branch and rebase check leave the inner loop and the pair
  // keys slide over src instead of re-reading the ring.
  void ring_push_run(const uint8_t* src, int n) {
    uint8_t* rg = ring.data();
    int32_t* cp = cprev.data();
    int32_t* ch = chead.data();
    int32_t* cp3 = use_tri ? cprev3.data() : nullptr;
    int32_t* ch3 = use_tri ? chead3.data() : nullptr;
    while (n > 0) {
      int p = pos;
      int seg = (W - p) < n ? (W - p) : n;
      if (p != 0) {  // pair/trigrams crossing into this run
        int key = ((int)rg[p - 1] << 8) | src[0];
        cp[p - 1] = ch[key];
        ch[key] = (int32_t)(wpos - 1);
        if (cp3) {
          if (p >= 2) {
            uint32_t h = h3(rg[p - 2], rg[p - 1], src[0]);
            cp3[p - 2] = ch3[h];
            ch3[h] = (int32_t)(wpos - 2);
          }
          if (seg >= 2) {
            uint32_t h = h3(rg[p - 1], src[0], src[1]);
            cp3[p - 1] = ch3[h];
            ch3[h] = (int32_t)(wpos - 1);
          }
        }
      }
      rg[p] = src[0];
      if (seg >= 2) {
        int key = ((int)src[0] << 8) | src[1];
        cp[p] = ch[key];
        ch[key] = (int32_t)wpos;
        rg[p + 1] = src[1];
      }
      if (cp3) {
        for (int i = 2; i < seg; i++) {
          int key = ((int)src[i - 1] << 8) | src[i];
          cp[p + i - 1] = ch[key];
          ch[key] = (int32_t)(wpos + i - 1);
          uint32_t h = h3(src[i - 2], src[i - 1], src[i]);
          cp3[p + i - 2] = ch3[h];
          ch3[h] = (int32_t)(wpos + i - 2);
          rg[p + i] = src[i];
        }
      } else {
        for (int i = 2; i < seg; i++) {
          int key = ((int)src[i - 1] << 8) | src[i];
          cp[p + i - 1] = ch[key];
          ch[key] = (int32_t)(wpos + i - 1);
          rg[p + i] = src[i];
        }
      }
      wpos += seg;
      pos = p + seg;
      if (pos == W) pos = 0;
      src += seg;
      n -= seg;
    }
    if (__builtin_expect(wpos >= 0x7F000000LL, 0)) rebase_chains();
  }

  // Keep chain entries within int32: subtract a large constant from wpos
  // and every entry (expired entries clamp to -1).  Runs every ~2 GB.
  void rebase_chains() {
    const int64_t delta = 0x40000000LL;
    wpos -= delta;
    for (auto& v : chead) v = (v < delta) ? -1 : (int32_t)(v - delta);
    for (auto& v : cprev) v = (v < delta) ? -1 : (int32_t)(v - delta);
    for (auto& v : chead3) v = (v < delta) ? -1 : (int32_t)(v - delta);
    for (auto& v : cprev3) v = (v < delta) ? -1 : (int32_t)(v - delta);
  }

  void seed_chains() {  // after the dictionary fills ring[0..W)
    chead.assign(65536, -1);
    cprev.assign((size_t)W, -1);
    use_tri = W >= TAMP_TRI_MIN_WINDOW;
    if (use_tri) {
      chead3.assign((size_t)1 << H3_BITS, -1);
      cprev3.assign((size_t)W, -1);
    }
    for (int s = 0; s + 1 < W; s++) {
      int key = ((int)ring[s] << 8) | ring[s + 1];
      cprev[s] = chead[key];
      chead[key] = (int32_t)s;
      if (use_tri && s + 2 < W) {
        uint32_t h = h3(ring[s], ring[s + 1], ring[s + 2]);
        cprev3[s] = chead3[h];
        chead3[h] = (int32_t)s;
      }
    }
    wpos = W;
  }

  // Exact window search via the chains: longest match of a prefix of
  // target, lowest ring slot among ties, slots >= start only — identical
  // results to a left-to-right scan of the linear buffer.
  SearchResult chain_search(const uint8_t* target, int tlen, int cap, int start,
                            int seed_len = 0, int seed_slot = -1) {
    // seed_len/seed_slot: a pre-validated candidate used as the initial
    // lower bound (the table builder's prefix property: a length-L match at
    // slot x implies length L-1 at slot x+1 one position later).  All chain
    // candidates are still walked, so the result — longest match, lowest
    // slot among ties — is identical to the unseeded search, just with far
    // stronger quick-rejection.
    int limit = tlen < cap ? tlen : cap;
    if (limit < minp) return {start, 0};
    int64_t lo = wpos - W;
    int best = minp - 1, best_slot = -1;
    if (seed_len >= minp && seed_len <= limit) {
      best = seed_len;
      best_slot = seed_slot;
    }

    const uint8_t* rg = ring.data();

    if (!use_tri) {
      // Small-window path: one exact pair walk with in-walk extension.
      const int32_t* cp = cprev.data();
      auto consider = [&](int x) {
        int room = W - x;
        bool maybe_tie = best_slot >= 0 && x < best_slot;
        if (!maybe_tie) {
          if (best >= limit || room <= best) return;
          if (rg[x + best] != target[best]) return;  // cannot beat best
        } else {
          if (room < best) return;                        // cannot even tie
          if (rg[x + best - 1] != target[best - 1]) return;  // len < best
        }
        int mx = limit < room ? limit : room;
        int len = 2 + match_extent(rg + x + 2, target + 2, mx - 2);
        if (len > best) {
          best = len;
          best_slot = x;
        } else if (len == best && maybe_tie) {
          best_slot = x;
        }
      };
      int key = ((int)target[0] << 8) | target[1];
      for (int64_t c = chead[key]; c >= lo; c = cp[c & wmask]) {
        int x = (int)(c & wmask);
        if (x >= start) consider(x);
      }
      // The head-crossing pair (never chain-indexed).
      int hx = pos - 1;
      if (hx >= 0 && hx >= start && rg[hx] == target[0] &&
          rg[hx + 1] == target[1])
        consider(hx);
      if (best_slot < 0) return {start, minp - 1};
      return {best_slot, best};
    }

    if (limit >= 3) {
      // Phase 1: matches of length >= 3 via the trigram chains (exhaustive:
      // any len>=3 match's first trigram is linear, so it is chain-indexed
      // or starts adjacent to the write head).  Hash collisions are
      // rejected by verifying the 2-byte prefix; len-2 outcomes are never
      // recorded here (phase 2 owns them).
      const int32_t* cp3 = cprev3.data();
      int best0 = best;
      if (best < 2) best = 2;  // floor: only len>=3 can be recorded
      auto consider3 = [&](int x) {
        int room = W - x;
        bool maybe_tie = best_slot >= 0 && x < best_slot;
        if (!maybe_tie) {
          if (best >= limit || room <= best) return;
          if (rg[x + best] != target[best]) return;  // cannot beat best
        } else {
          if (room < best) return;                        // cannot even tie
          if (rg[x + best - 1] != target[best - 1]) return;  // len < best
        }
        if (rg[x] != target[0] || rg[x + 1] != target[1]) return;  // collision
        int mx = limit < room ? limit : room;
        int len = 2 + match_extent(rg + x + 2, target + 2, mx - 2);
        if (len > best) {
          best = len;
          best_slot = x;
        } else if (len == best && maybe_tie) {
          best_slot = x;
        }
      };
      uint32_t h = h3(target[0], target[1], target[2]);
      for (int64_t c = chead3[h]; c >= lo; c = cp3[c & wmask]) {
        int x = (int)(c & wmask);
        if (x >= start) consider3(x);
      }
      // Trigram starts adjacent to the write head hold newer bytes than
      // their (expired) chain entries recorded: check them explicitly.
      for (int dx = 2; dx >= 1; dx--) {
        int x = pos - dx;
        if (x >= 0 && x >= start) consider3(x);
      }
      if (best >= 3) return {best_slot, best};
      best = best0;  // nothing >= 3 (tie updates to best_slot were valid
                     // pair matches; phase 2 keeps minimizing the slot)
    }

    // Phase 2: the longest match is (at most) 2 — the lowest pair-match
    // slot wins.  Pair chains are exact (no hashing), so no byte compares
    // are needed for chain entries.
    if (minp <= 2) {
      const int32_t* cp = cprev.data();
      int key = ((int)target[0] << 8) | target[1];
      for (int64_t c = chead[key]; c >= lo; c = cp[c & wmask]) {
        int x = (int)(c & wmask);
        if (x >= start && (best_slot < 0 || x < best_slot)) {
          best = 2;
          best_slot = x;
        }
      }
      // The head-crossing pair (never chain-indexed).
      int hx = pos - 1;
      if (hx >= 0 && hx >= start && (best_slot < 0 || hx < best_slot) &&
          rg[hx] == target[0] && rg[hx + 1] == target[1]) {
        best = 2;
        best_slot = hx;
      }
    }

    if (best_slot < 0) return {start, minp - 1};
    return {best_slot, best};
  }
  // snapshot-read size bytes at index (mod wrap), then append at pos (wrap)
  void ring_copy_wrap(int index, int size) {
    uint8_t tmp[16];  // cached lazy matches are <= 15 bytes
    for (int i = 0; i < size; i++) tmp[i] = ring[(index + i) & wmask];
    ring_push_run(tmp, size);
  }
  // extended-match window write: no wrap past ring end
  void ring_selfcopy_ext(int index, int size, int64_t src_input_start) {
    int wr = size < (W - pos) ? size : (W - pos);
    scratch.resize((size_t)wr);
    for (int i = 0; i < wr; i++) scratch[i] = ring[(index + i) & wmask];
    ring_push_run(scratch.data(), wr);
    if (wr < size) record_deletion(chat(src_input_start) + wr, size - wr);
  }

  // Validate a model-table candidate against the true write history.
  // All arithmetic is in model ("C-hat") coordinates: position = number of
  // model-written bytes before it.  Returns the adjusted ring index, or -1
  // if an exact fallback is needed.
  int validate(int64_t tt, int x_model, int len) {
    int64_t ct = chat(tt);
    int tau = (int)(ct & wmask);
    int j = x_model - tau; if (j < 0) j += W;
    if (j + len > W) return -1;          // wrap-glued candidate
    int64_t p_src = ct + j - W;          // may be negative: dictionary bytes
    int64_t d_lo = p_src > 0 ? del_upto(p_src) : 0;
    int64_t d_hi = del_upto(p_src + len > 0 ? p_src + len : 0);
    if (d_hi != d_lo) return -1;         // dynamic deletion inside the range
    int64_t k_s = p_src - d_lo;
    int64_t k_now = t_written();
    if (k_s < k_now - W) return -1;      // expired from the true window
    int slot = (int)(k_s & wmask);
    if (slot + len > W) return -1;       // true ring-linearity
    return slot;
  }
  int64_t t_written() const {
    return chat(t) - (dels.empty() ? 0 : dels.back().cum_prev + dels.back().count);
  }

  // first-search at position tt: tables when exact/valid, else ring search.
  // ``rem`` is the effective look-ahead (already boundary-capped in planned
  // mode).  In reference-parity mode the tables only serve the steady state
  // (rem >= 16); the <16-byte flush drain replays the reference's shrinking
  // search exactly.  In planned mode tables serve every position, capped.
  // Sparse-table hole marker: the device shipped no entry for this
  // position (speculative-walk pull, ops/greedy_predict_pallas.py) — run
  // the exact chain search instead.  Pre-divergence the chain search
  // returns exactly what the table would have (the tables encode the
  // reference search semantics), so byte parity never depends on which
  // positions carry entries.
  static constexpr int SPARSE_NONE = 0xFF;

  SearchResult first_search(int64_t rem) {
    int cap = (int)(rem < full_cap ? rem : full_cap);
    if (flen && (plan ? true : rem >= LOOKAHEAD)) {
      int len = flen[t]; int x = fidx[t];
      if (len == SPARSE_NONE) {
        int tl = (int)(rem < LOOKAHEAD ? rem : LOOKAHEAD);
        return chain_search(data + t, tl, cap, 0);
      }
      if (len > cap) len = cap;
      if (!diverged) return {x, len};
      if (exact_tables) {
        int tl = (int)(rem < LOOKAHEAD ? rem : LOOKAHEAD);
        int slot = (len >= minp) ? validate(t, x, len) : -1;
        if (slot >= 0) return chain_search(data + t, tl, cap, 0, len, slot);
        return chain_search(data + t, tl, cap, 0);
      }
      if (len < minp) return {x, len};  // trust "no match" (coverage loss only)
      int slot = validate(t, x, len);
      if (slot >= 0) return {slot, len};
      int tl = (int)(rem < LOOKAHEAD ? rem : LOOKAHEAD);
      return chain_search(data + t, tl, cap, 0);
    }
    if (plan && dh) {
      // Device-planner semantics (ops/plan_ext.py size1): longest over the
      // MODEL target at full cap, lowest slot among maximal; the boundary
      // cap is applied afterward KEEPING the index.
      int64_t mt = chat(t);
      int tl = (int)((M - mt) < LOOKAHEAD ? (M - mt) : LOOKAHEAD);
      SearchResult r = chain_search(dh + mt, tl, full_cap, 0);
      if (r.size > cap) r.size = cap;
      return r;
    }
    int tl = (int)(rem < LOOKAHEAD ? rem : LOOKAHEAD);
    return chain_search(data + t, tl, cap, 0);
  }

  SearchResult probe_search(int64_t rem) {  // target data[t+1:], current ring
    int cap = 15 < maxpat ? 15 : maxpat;
    if ((int64_t)(rem - 1) < cap) cap = (int)(rem - 1);
    if (plen && (plan ? true : rem >= LOOKAHEAD)) {
      int len = plen[t]; int x = pidx[t];
      if (len == SPARSE_NONE) {
        int tl = (int)((rem - 1) < 15 ? (rem - 1) : 15);
        return chain_search(data + t + 1, tl, cap, 0);
      }
      if (len > cap) len = cap;
      if (!diverged) return {x, len};
      if (exact_tables) {
        int tl = (int)((rem - 1) < 15 ? (rem - 1) : 15);
        int slot = (len >= minp) ? validate(t, x, len) : -1;
        if (slot >= 0)
          return chain_search(data + t + 1, tl, cap, 0, len, slot);
        return chain_search(data + t + 1, tl, cap, 0);
      }
      if (len >= minp) {
        int slot = validate(t, x, len);  // probe slots share the t-basis
        if (slot >= 0) return {slot, len};
      }
      int tl = (int)((rem - 1) < 15 ? (rem - 1) : 15);
      return chain_search(data + t + 1, tl, cap, 0);
    }
    int tl = (int)((rem - 1) < 15 ? (rem - 1) : 15);
    return chain_search(data + t + 1, tl, cap, 0);
  }

  bool emit_literal(uint8_t b) {
    if (literal < 8 && (b >> literal)) { excess_bits = true; return false; }
    bw->put((1u << literal) | b, literal + 1);
    ring_push(b);
    return true;
  }
  void emit_match(int idx, int size) {
    bw->huff(size - minp);
    bw->put((uint32_t)idx, wbits);
    // matched bytes equal the consumed input; write them with wrap
    ring_push_run(data + t, size);
  }
  void emit_match_cached(int idx, int size) {
    bw->huff(size - minp);
    bw->put((uint32_t)idx, wbits);
    ring_copy_wrap(idx, size);
  }
  void emit_rle() {
    int count = rle_count; rle_count = 0;
    uint8_t b = last_ring_byte();
    if (count == 1) { emit_literal(b); return; }
    if (plan) {
      // Planned-mode ring-end policy: the decoder's RLE write truncates at
      // the ring end (never wraps); instead of letting the true ring
      // diverge from the model, split the token there.  Steady-state
      // splits happen in step() (consume-limited, so the remainder is
      // re-evaluated exactly like the device planner's next walk entry);
      // this path only sees accumulated counts (tail/drain), where the
      // remainder stays accumulated.
      int wr0 = count < RLE_MAX_WIN ? count : RLE_MAX_WIN;
      int r = W - pos;
      if (wr0 > r) {
        if (r >= 2) {
          bw->huff(RLE_SYM);
          bw->ext_value(r - 2, RLE_TRAIL);
          uint8_t fill[RLE_MAX_WIN];
          std::memset(fill, b, sizeof fill);
          ring_push_run(fill, r);  // fills exactly to the ring end
          rle_count = count - r;
          rle_start += r;
          return;
        }
        if (!emit_literal(b)) return;  // r == 1: one literal crosses the end
        rle_count = count - 1;
        rle_start += 1;
        return;
      }
    }
    bw->huff(RLE_SYM);
    bw->ext_value(count - 2, RLE_TRAIL);
    int wr = count; if (wr > RLE_MAX_WIN) wr = RLE_MAX_WIN;
    if (wr > W - pos) wr = W - pos;
    uint8_t fill[RLE_MAX_WIN];
    std::memset(fill, b, sizeof fill);
    ring_push_run(fill, wr);
    if (wr < count) record_deletion(chat(rle_start) + wr, count - wr);
  }

  // Planned-run RLE: cover [t, end) with RLE tokens in fixed chunks that the
  // host planner used when building the model history (241 max; never leave
  // a trailing single byte, which would be unencodable).
  void forced_rle(int64_t end) {
    cached_idx = -1;
    uint8_t b = last_ring_byte();
    while (t < end) {
      int64_t remn = end - t;
      int count = remn < RLE_MAX ? (int)remn : RLE_MAX;
      if (remn - count == 1) count--;
      bw->huff(RLE_SYM);
      bw->ext_value(count - 2, RLE_TRAIL);
      // The window write follows the model: khat encodes the planner's
      // kept count per chunk (ring-end aware with the exact model,
      // engine/plan.py build_model_history(window_bits=...); min(8, count)
      // with the legacy keep rule).  Truncation beyond the model's keep is
      // tracked as a deletion (legacy khat only).
      int w_plan = (int)(khat[t + count] - khat[t]);
      int wr = w_plan < (W - pos) ? w_plan : (W - pos);
      uint8_t fill[RLE_MAX_WIN];
      std::memset(fill, b, sizeof fill);
      ring_push_run(fill, wr);
      if (wr < w_plan) record_deletion(chat(t) + wr, w_plan - wr);
      t += count;
    }
  }
  void emit_ext_match() {
    if (avoid_divergence && ext_count > W - pos) {
      int room = W - pos;
      if (room >= minp + 12) {
        // Shorten to exactly fill the ring: full window write, no deletion.
        bw->huff(EXT_SYM);
        bw->ext_value(room - minp - 12, EXT_TRAIL);
        bw->put((uint32_t)ext_pos, wbits);
        ring_selfcopy_ext(ext_pos, room, ext_start);
        t = ext_start + room;  // re-tokenize the unconsumed tail
      } else {
        // Too little room for an extended token: emit a basic match (its
        // window write wraps, so it never truncates).
        int L = ext_count < minp + 11 ? ext_count : minp + 11;
        bw->huff(L - minp);
        bw->put((uint32_t)ext_pos, wbits);
        ring_push_run(data + ext_start, L);
        t = ext_start + L;
      }
      ext_count = 0; ext_pos = 0;
      return;
    }
    bw->huff(EXT_SYM);
    bw->ext_value(ext_count - minp - 12, EXT_TRAIL);
    bw->put((uint32_t)ext_pos, wbits);
    ring_selfcopy_ext(ext_pos, ext_count, ext_start);
    ext_count = 0; ext_pos = 0;
  }

  // Planned-mode extended emit (one-shot, no growth state): the match was
  // found as the TRUE longest (lowest index among maximal, boundary cap
  // applied afterward with the index kept) — the formulation the device
  // planner reproduces from a single max-length table (ops/plan_ext.py).
  // Valid either way: a longer match's prefix is a match at the same index.
  void emit_ext_planned(int idx, int m) {
    if (avoid_divergence && m > W - pos) {
      int room = W - pos;
      if (room >= minp + 12) {
        // Shorten to exactly fill the ring; re-tokenize the tail.
        bw->huff(EXT_SYM);
        bw->ext_value(room - minp - 12, EXT_TRAIL);
        bw->put((uint32_t)idx, wbits);
        ring_selfcopy_ext(idx, room, t);
        t += room;
      } else {
        // Too little room for an extended token: basic match (wrap write).
        int L = m < minp + 11 ? m : minp + 11;
        bw->huff(L - minp);
        bw->put((uint32_t)idx, wbits);
        ring_push_run(data + t, L);
        t += L;
      }
      return;
    }
    bw->huff(EXT_SYM);
    bw->ext_value(m - minp - 12, EXT_TRAIL);
    bw->put((uint32_t)idx, wbits);
    ring_selfcopy_ext(idx, m, t);
    t += m;
  }

  // one reference "poll": consume input until one token (or buffer need)
  void step() {
    int64_t rem = N - t;
    if (rem <= 0) return;

    // --- planned-run boundaries ----------------------------------------
    int64_t B = INT64_MAX;  // no token may extend to or past this position
    if (plan) {
      while (plan_i < n_plan && t >= plan[2 * plan_i + 1]) plan_i++;
      B = boundary();
      // The forced RLE fires only once any pending extended match has been
      // emitted (tokens must stay in stream order).
      if (!ext_count && plan_i < n_plan && t == plan[2 * plan_i]) {
        int64_t end = plan[2 * plan_i + 1];
        plan_i++;
        forced_rle(end);
        return;
      }
      if (B - t < rem) rem = B - t;  // cap the effective look-ahead
    }

    // --- extended-match continuation -----------------------------------
    if (ext_count) {
      cached_idx = -1;
      // The growth target is exactly the input bytes the match reproduces
      // (matches copy the window, the window held those bytes): no ring
      // materialization needed, and appending a byte is free.
      while (t < N) {
        if (plan && t >= B) { emit_ext_match(); return; }
        if (ext_pos + ext_count >= W) { emit_ext_match(); return; }
        const uint8_t* target = data + ext_start;
        // In-place extension: ext_pos is the lowest index >= the search
        // start, so when the current location extends, it IS the search
        // result (reference semantics search from ext_pos,
        // compressor.py:304) — skip the chain walk entirely.
        if (!plan && ring[ext_pos + ext_count] == target[ext_count]) {
          t++;
          ext_count++;
          if (ext_count == maxpat) { emit_ext_match(); return; }
          continue;
        }
        // Relocation search; in planned (non-parity) mode the whole window
        // is searched, which finds strictly more growth opportunities.
        SearchResult r = chain_search(target, ext_count + 1, maxpat,
                                      plan ? 0 : ext_pos);
        if (r.size > ext_count) {
          t++;
          ext_count = r.size; ext_pos = r.idx;
          if (ext_count == maxpat) { emit_ext_match(); return; }
        } else {
          emit_ext_match(); return;
        }
      }
      return;  // drained input while growing
    }

    // --- RLE accumulation / decision -----------------------------------
    if (extended) {
      uint8_t last = last_ring_byte();
      int pend = (int)(rem < LOOKAHEAD ? rem : LOOKAHEAD);
      int avail = 0;
      while (avail < pend && data[t + avail] == last &&
             rle_count + avail < RLE_MAX) avail++;
      int total = rle_count + avail;
      bool ended = (avail < pend) || (total >= RLE_MAX);
      // A run reaching a planned boundary cannot continue: emit it now so no
      // pending rle_count leaks into the forced-RLE region.
      if (plan && t + avail >= B) ended = true;
      if (!ended && total > 0) {
        cached_idx = -1;
        if (rle_count == 0) rle_start = t;
        rle_count = total;
        t += avail;
        return;
      }
      if (total >= 2) {
        bool use_pattern = false;
        if (total == avail && total <= 6) {
          SearchResult r = first_search(rem);
          if (r.size > total) use_pattern = true;
        }
        if (!use_pattern) {
          cached_idx = -1;
          if (rle_count == 0) rle_start = t;
          if (plan && rle_count == 0) {
            // Steady-state ring-end split: consume only up to the ring
            // end so the remainder re-enters the full decision at the
            // next step — exactly the device planner's next walk entry
            // (ops/plan_ext.py).
            int wr0 = total < RLE_MAX_WIN ? total : RLE_MAX_WIN;
            int r = W - pos;
            if (wr0 > r) {
              if (r >= 2) {
                t += r;
                rle_count = r;
                emit_rle();
                return;
              }
              if (!emit_literal(data[t])) return;  // r == 1
              t += 1;
              return;
            }
          }
          t += avail;
          rle_count = total;
          emit_rle();
          return;
        }
        rle_count = 0;
      } else if (total == 1) {
        if (rle_count == 1) { cached_idx = -1; emit_rle(); return; }
        rle_count = 0;
      }
    }

    // --- pattern matching ----------------------------------------------
    int idx, size;
    bool from_cache = false;
    if (lazy && cached_idx >= 0 && (int64_t)cached_size <= rem) {
      idx = cached_idx; size = cached_size; cached_idx = -1; from_cache = true;
    } else {
      cached_idx = -1;
      SearchResult r = first_search(rem);
      idx = r.idx; size = r.size;
    }

    int pend = (int)(rem < LOOKAHEAD ? rem : LOOKAHEAD);
    // Planned-mode lazy is PURE-POSITION (the device planner's exact
    // semantics, ops/plan_ext.py): the deferral fires only in the steady
    // state (rem >= 16, where the cap-15 probe table equals the exact
    // probe search bit-for-bit), and no match is cached — the next
    // position re-decides from fresh tables.  Reference cache semantics
    // (deferred match reused, chains on the cached size) live in
    // non-planned mode, where byte parity with the reference is the
    // contract.
    if (lazy && size >= minp && size <= 8 && pend > size + 2 &&
        (!plan || rem >= LOOKAHEAD)) {
      SearchResult p = probe_search(rem);
      int tau = pos;  // true ring write head == reference window pos
      if (p.size > size && !(p.idx <= tau && tau < p.idx + p.size)) {
        if (!emit_literal(data[t])) return;
        if (!plan) { cached_idx = p.idx; cached_size = p.size; }
        t++;
        return;
      }
    }

    if (size >= minp) {
      if (extended && size > minp + 11) {
        if (plan && !from_cache) {
          // One-shot: longest match over the whole window (lowest index
          // among maximal), then cap at the planned boundary keeping the
          // index.  Replaces the byte-at-a-time growth loop in planned
          // mode (the cached-match entry keeps the growth path: its
          // emit-at-equal-length keeps the cached index, which a
          // max-length table cannot represent).  The target is the MODEL
          // stream (the device lenx table's target, ops/match_ext_mxu):
          // past the boundary the input continues with deleted run bytes
          // the model does not, which can flip the maximal index.
          SearchResult r;
          if (dh) {
            int64_t mt = chat(t);
            int tl = (int)((M - mt) < (int64_t)maxpat ? (M - mt)
                                                      : (int64_t)maxpat);
            r = chain_search(dh + mt, tl, maxpat, 0);
          } else {
            r = chain_search(
                data + t, (int)(N - t < (int64_t)maxpat ? N - t : maxpat),
                maxpat, 0);
          }
          int m = (int)((int64_t)r.size < rem ? (int64_t)r.size : rem);
          emit_ext_planned(r.idx, m);
          return;
        }
        ext_pos = idx; ext_count = size; ext_start = t;
        t += size;
      } else {
        if (from_cache) emit_match_cached(idx, size);
        else emit_match(idx, size);
        t += size;
      }
    } else {
      if (!emit_literal(data[t])) return;
      t++;
    }
  }

  int run(BitWriter& writer) {
    bw = &writer;
    while (true) {
      while (t < N) {
        step();
        if (excess_bits) return -2;
        if (bw->overflow) return -1;
      }
      // flush drain: pending RLE / extended state.  A divergence-avoiding
      // extended emit may hand back unconsumed bytes (t < N): keep going.
      // (A planned-mode ring-end split can leave a remainder: loop.)
      while (extended && rle_count) {
        emit_rle();
        if (excess_bits || bw->overflow) break;
      }
      if (extended && ext_count) emit_ext_match();
      if (excess_bits) return -2;
      if (bw->overflow) return -1;
      if (t >= N) break;
    }
    bw->pad();
    if (bw->overflow) return -1;
    return 0;
  }
};

// ---- streaming handles -----------------------------------------------------
// Incremental compress/decompress with the reference's resumable contract
// (write/flush/reset_dictionary; chunked feed/read with token-atomic
// resume) — the native analogue of the reference's stream API
// (tamp/_c_src/tamp/compressor.h tamp_compressor_* / decompressor.h).

// Progress callback (observability parity with the reference's
// tamp_callback_t, tamp/_c_src/tamp/common.h:184-210): fires periodically
// at token boundaries with cumulative (bytes_in, bytes_out).  Return 0 to
// continue; any nonzero return aborts the in-flight call and is propagated
// verbatim as its return code — use values with |v| >= 100 to avoid
// colliding with the engine's own statuses (0/1/-2..-5).  The stream state
// stays token-atomic across an abort, so the call may simply be reissued.
typedef int (*tampn_cb_t)(void* user, int64_t bytes_in, int64_t bytes_out);

struct StreamComp {
  Committer c;
  std::vector<uint8_t> buf;   // unconsumed + look-ahead input (c.data aims here)
  uint64_t acc = 0;           // persistent bit-writer state (< 8 bits between
  int bits = 0;               // calls except for the queued header)
  bool last_was_flush = false;
  bool dictionary_reset = false;
  bool excess = false;
  tampn_cb_t cb = nullptr;    // optional progress/abort callback
  void* cb_user = nullptr;
  uint32_t cb_ctr = 0;
  int64_t in_total = 0;       // bytes ever accepted by comp_write
  int64_t out_total = 0;      // bytes ever emitted across calls

  void sync_data() {
    c.data = buf.data();
    c.N = (int64_t)buf.size();
  }
  void compact() {
    int64_t keep_from = c.t;
    if (c.rle_count && c.rle_start < keep_from) keep_from = c.rle_start;
    if (c.ext_count && c.ext_start < keep_from) keep_from = c.ext_start;
    if (keep_from > (1 << 20)) {
      buf.erase(buf.begin(), buf.begin() + keep_from);
      c.t -= keep_from;
      c.rle_start -= keep_from;  // only meaningful while active; safe anyway
      c.ext_start -= keep_from;
      sync_data();
    }
  }
  // Run steps while a full look-ahead is available (mid-stream contract:
  // the reference emits tokens only with its 16-byte input buffer full).
  // Fire the progress callback every 256 tokens; nonzero aborts (state is
  // already token-consistent — the caller's save path runs on every rc).
  int poll_cb(int64_t out_now) {
    if (cb && ((++cb_ctr & 255u) == 0))
      return cb(cb_user, in_total - (c.N - c.t), out_total + out_now);
    return 0;
  }
  int run_held(BitWriter& bw) {
    c.bw = &bw;
    sync_data();
    while (c.N - c.t >= LOOKAHEAD) {
      if (bw.n > bw.cap - 64) return 1;  // output nearly full
      c.step();
      if (c.excess_bits) { excess = true; return -2; }
      if (int rc = poll_cb(bw.n)) return rc;
    }
    compact();
    return 0;
  }
  int drain(BitWriter& bw) {  // consume everything (flush semantics)
    c.bw = &bw;
    sync_data();
    while (true) {
      while (c.t < c.N) {
        if (bw.n > bw.cap - 64) return 1;
        c.step();
        if (c.excess_bits) { excess = true; return -2; }
        if (int rc = poll_cb(bw.n)) return rc;
      }
      if (c.extended && c.rle_count) c.emit_rle();
      if (c.extended && c.ext_count) c.emit_ext_match();
      if (c.excess_bits) { excess = true; return -2; }
      if (c.t >= c.N) break;
    }
    c.cached_idx = -1;
    buf.clear();
    c.t = 0;
    sync_data();
    return 0;
  }
};

struct StreamDecomp {
  std::vector<uint8_t> ring;
  std::vector<uint8_t> inbuf;
  std::vector<uint8_t> dict;   // caller-supplied custom dictionary
  std::vector<uint8_t> spill;  // decoded bytes not yet handed to the caller
  size_t spill_off = 0;
  int64_t in_pos = 0;
  uint64_t acc = 0;
  int bits = 0;
  int W = 0, wmask = 0, pos = 0, window = 0, literal = 0, minp = 0;
  bool extended = false, more = false, custom = false;
  bool configured = false, have_first = false;
  bool last_was_flush = false, bad = false;
  uint8_t first_byte = 0;
  tampn_cb_t cb = nullptr;     // optional progress/abort callback
  void* cb_user = nullptr;
  uint32_t cb_ctr = 0;
  int64_t in_base = 0;         // input consumed before the current inbuf
  int64_t out_total = 0;       // bytes ever handed to the caller
};

}  // namespace

extern "C" {

// Initialize a default dictionary buffer (format invariant).
void tampn_init_dictionary(uint8_t* buf, int64_t size, int literal) {
  init_dictionary(buf, size, literal);
}

// Table-assisted or standalone one-shot compression.
// flen/fidx: full-cap table (cap = min(16, max_pattern)); may be null.
// plen/pidx: lazy-probe table; may be null (required if lazy and flen set).
// dict: initialized window buffer (1<<window bytes) or null for default.
// Returns 0 ok, -1 output full, -2 excess bits.
int tampn_compress(const uint8_t* data, int64_t n,
                   const uint8_t* flen, const int32_t* fidx,
                   const uint8_t* plen, const int32_t* pidx,
                   const uint8_t* dict, int window, int literal,
                   int extended, int lazy, int write_header, int custom_dict,
                   int avoid_divergence, int exact_tables,
                   const uint32_t* khat, const int64_t* plan, int n_plan,
                   uint8_t* out, int64_t out_cap, int64_t* out_len) {
  Committer c;
  c.W = 1 << window; c.wmask = c.W - 1; c.wbits = window; c.literal = literal;
  c.minp = min_pattern_size(window, literal);
  c.maxpat = extended ? c.minp + 131 : c.minp + 13;
  c.extended = extended != 0; c.lazy = lazy != 0;
  c.avoid_divergence = avoid_divergence != 0 && extended != 0;
  c.exact_tables = exact_tables != 0;
  c.data = data; c.N = n;
  if (extended) { c.khat = khat; c.plan = plan; c.n_plan = n_plan; }
  if (c.plan && khat) {
    // model stream for planned-mode searches (see Committer::dh)
    c.M = (int64_t)khat[n];
    c.dh_own.resize((size_t)c.M);
    for (int64_t p = 0; p < n; p++)
      if (khat[p + 1] > khat[p]) c.dh_own[khat[p]] = data[p];
    c.dh = c.dh_own.data();
  }
  c.flen = flen; c.fidx = fidx; c.plen = plen; c.pidx = pidx;
  c.full_cap = (LOOKAHEAD < c.maxpat) ? LOOKAHEAD : c.maxpat;
  c.ring.resize(c.W);
  if (dict) std::memcpy(c.ring.data(), dict, (size_t)c.W);
  else init_dictionary(c.ring.data(), c.W, extended ? literal : 8);
  c.seed_chains();

  BitWriter bw(out, out_cap);
  if (write_header) {
    uint32_t h = (uint32_t)(((window - 8) << 5) | ((literal - 5) << 3) |
                            ((custom_dict ? 1 : 0) << 2) |
                            ((extended ? 1 : 0) << 1));
    bw.put(h, 8);
  }
  int rc = c.run(bw);
  *out_len = bw.n;
  return rc;
}

// One-shot decompression of a complete stream (header included).
// dict: caller-supplied custom dictionary (or null).  Returns 0 ok,
// 1 output full (caller should retry with a larger buffer), -3 invalid.
int tampn_decompress(const uint8_t* in, int64_t n, const uint8_t* dict,
                     int64_t dict_len, uint8_t* out, int64_t out_cap,
                     int64_t* out_len) {
  *out_len = 0;
  if (n < 1) return 0;
  uint8_t h = in[0];
  int window = (h >> 5) + 8, literal = ((h >> 3) & 3) + 5;
  bool custom = (h >> 2) & 1, extended = (h >> 1) & 1, more = h & 1;
  int64_t pos_in = 1;
  if (more) {
    if (n < 2) return 0;
    if (in[1] != 0) return -3;
    pos_in = 2;
  }
  int W = 1 << window;
  const int wmask = W - 1;
  if (custom && (!dict || dict_len < W)) return -3;
  int minp = min_pattern_size(window, literal);

  std::vector<uint8_t> ring(W);
  if (custom) std::memcpy(ring.data(), dict, (size_t)W);
  else init_dictionary(ring.data(), W, extended ? literal : 8);
  int pos = 0;

  uint64_t acc = 0; int bits = 0;
  int64_t o = 0;
  bool last_was_flush = false;
  bool eof = false, bad = false;

  auto refill = [&](int need) -> bool {
    while (bits < need) {
      if (pos_in >= n) { eof = true; return false; }
      acc = (acc << 8) | in[pos_in++];
      bits += 8;
    }
    return true;
  };
  auto take = [&](int nb) -> uint32_t {
    uint32_t v = (uint32_t)((acc >> (bits - nb)) & ((1ull << nb) - 1));
    bits -= nb;
    return v;
  };
  ensure_huff_tables();
  auto read_sym = [&]() -> int {
    while (bits < 8 && pos_in < n) { acc = (acc << 8) | in[pos_in++]; bits += 8; }
    if (bits >= 8) {
      uint32_t peek = (uint32_t)(acc >> (bits - 8)) & 0xFF;
      int sym = SYM_TAB[peek];
      if (sym == 0xFF) { bad = true; return -1; }
      bits -= LEN_TAB[peek];
      return sym;
    }
    uint32_t key = 1;  // end-of-input tail: bit-by-bit
    for (int i = 0; i < 8; i++) {
      if (!refill(1)) return -1;
      key = (key << 1) | take(1);
      switch (key) {
        case 0b10: return 0;           case 0b111: return 1;
        case 0b11000: return 2;        case 0b11011: return 3;
        case 0b110100: return 4;       case 0b1100100: return 5;
        case 0b1100110: return 6;      case 0b1101011: return 7;
        case 0b11001011: return 8;     case 0b11010100: return 9;
        case 0b110010100: return 10;   case 0b110010101: return 11;
        case 0b110101010: return 12;   case 0b1100111: return 13;
        case 0b110101011: return 14;
      }
    }
    bad = true;
    return -1;
  };
  auto copy_from_ring = [&](int index, int size) {  // ring -> out at o
    if (index + size <= W) std::memcpy(out + o, ring.data() + index, (size_t)size);
    else for (int i = 0; i < size; i++) out[o + i] = ring[(index + i) & wmask];
  };
  auto window_write = [&](int size) {  // out[o..o+size) -> ring at pos (wraps)
    int wr1 = size < (W - pos) ? size : (W - pos);
    std::memcpy(&ring[pos], out + o, (size_t)wr1);
    if (wr1 < size) {
      std::memcpy(ring.data(), out + o + wr1, (size_t)(size - wr1));
      pos = size - wr1;
    } else {
      pos += wr1; if (pos == W) pos = 0;
    }
  };

  // FAST PATH.  With >=8 input bytes loadable and >=256 output bytes of
  // slack, any single token (<=35 bits read, <=241 bytes written) decodes
  // without per-field refill checks, token-rollback snapshots, or output
  // bounds checks.  One bulk refill per token keeps acc at >=56 bits.
  {
    const int64_t in_guard = n - 8;     // pos_in <= in_guard => 8-byte load ok
    const int64_t out_guard = out_cap - 256;
    const uint32_t lit_mask = (1u << literal) - 1;
    while (pos_in <= in_guard && o <= out_guard) {
      int nb = (63 - bits) >> 3;
      if (nb) {
        uint64_t chunk;
        std::memcpy(&chunk, in + pos_in, 8);
        chunk = __builtin_bswap64(chunk);
        acc = (acc << (nb * 8)) | (chunk >> (64 - nb * 8));
        pos_in += nb;
        bits += nb * 8;
      }
      if ((acc >> (bits - 1)) & 1) {  // literal
        bits -= 1 + literal;
        uint8_t b = (uint8_t)((acc >> bits) & lit_mask);
        last_was_flush = false;
        out[o++] = b;
        ring[pos] = b;
        pos = (pos + 1) & wmask;
        continue;
      }
      bits -= 1;
      uint32_t peek = (uint32_t)(acc >> (bits - 8)) & 0xFF;
      int sym = SYM_TAB[peek];
      if (sym == 0xFF) return -3;
      bits -= LEN_TAB[peek];
      if (sym == FLUSH_SYM) {
        bits &= ~7;  // discard padding to the byte boundary
        if (more && last_was_flush) {  // double-FLUSH dictionary reset
          init_dictionary(ring.data(), W, extended ? literal : 8);
          pos = 0;
        }
        last_was_flush = true;
        continue;
      }
      last_was_flush = false;
      if (extended && sym > 11) {
        peek = (uint32_t)(acc >> (bits - 8)) & 0xFF;
        int s2 = SYM_TAB[peek];
        if (s2 == 0xFF) return -3;
        bits -= LEN_TAB[peek];
        if (sym == RLE_SYM) {
          bits -= RLE_TRAIL;
          int count = (s2 << RLE_TRAIL) +
                      (int)((acc >> bits) & ((1u << RLE_TRAIL) - 1)) + 2;
          uint8_t b = ring[(pos - 1) & wmask];
          std::memset(out + o, b, (size_t)count);
          o += count;
          int wr = count < RLE_MAX_WIN ? count : RLE_MAX_WIN;
          if (wr > W - pos) wr = W - pos;
          std::memset(&ring[pos], b, (size_t)wr);
          pos = (pos + wr) & wmask;
        } else {  // extended match (never wraps the window on write)
          bits -= EXT_TRAIL;
          int size = (s2 << EXT_TRAIL) +
                     (int)((acc >> bits) & ((1u << EXT_TRAIL) - 1)) + minp + 12;
          bits -= window;
          int index = (int)((acc >> bits) & (uint32_t)wmask);
          if (index + size > W) return -4;  // OOB window reference
          std::memcpy(out + o, ring.data() + index, (size_t)size);
          int wr = size < (W - pos) ? size : (W - pos);
          std::memcpy(&ring[pos], out + o, (size_t)wr);
          pos = (pos + wr) & wmask;
          o += size;
        }
      } else {  // basic match, size <= minp+13 <= 16
        int size = sym + minp;
        bits -= window;
        int index = (int)((acc >> bits) & (uint32_t)wmask);
        if (index + size > W) return -4;  // OOB window reference
        if (index + 16 <= W)
          std::memcpy(out + o, ring.data() + index, 16);
        else
          std::memcpy(out + o, ring.data() + index, (size_t)size);
        if (pos + size <= W) {
          std::memcpy(&ring[pos], out + o, (size_t)size);
          pos = (pos + size) & wmask;
        } else {
          for (int i = 0; i < size; i++) {
            ring[pos] = out[o + i];
            pos = (pos + 1) & wmask;
          }
        }
        o += size;
      }
    }
  }

  while (true) {
    if (!refill(1)) break;
    // Token-atomic: snapshot so a partial token at end-of-input rolls back.
    uint64_t s_acc = acc; int s_bits = bits; int64_t s_pos = pos_in;
    bool full = false;

    if (take(1)) {  // literal
      if (refill(literal)) {
        last_was_flush = false;
        uint8_t b = (uint8_t)take(literal);
        if (o >= out_cap) full = true;
        else {
          out[o++] = b;
          ring[pos] = b; if (++pos == W) pos = 0;
          continue;
        }
      }
    } else {
      int sym = read_sym();
      if (bad) return -3;
      if (sym == FLUSH_SYM) {
        bits &= ~7;  // discard padding to the byte boundary
        if (more && last_was_flush) {  // double-FLUSH dictionary reset
          init_dictionary(ring.data(), W, extended ? literal : 8);
          pos = 0;
        }
        last_was_flush = true;
        continue;
      }
      if (sym >= 0) {
        if (extended && sym > 11) {
          int s2 = read_sym();
          if (bad) return -3;
          if (s2 >= 0) {
            if (sym == RLE_SYM) {
              if (refill(RLE_TRAIL)) {
                last_was_flush = false;
                int count = (s2 << RLE_TRAIL) + (int)take(RLE_TRAIL) + 2;
                if (o + count > out_cap) full = true;
                else {
                  uint8_t b = ring[pos == 0 ? W - 1 : pos - 1];
                  std::memset(out + o, b, (size_t)count); o += count;
                  int wr = count < RLE_MAX_WIN ? count : RLE_MAX_WIN;
                  if (wr > W - pos) wr = W - pos;
                  for (int i = 0; i < wr; i++) { ring[pos] = b; if (++pos == W) pos = 0; }
                  continue;
                }
              }
            } else {  // extended match
              if (refill(EXT_TRAIL + window)) {
                last_was_flush = false;
                int size = (s2 << EXT_TRAIL) + (int)take(EXT_TRAIL) + minp + 12;
                int index = (int)take(window);
                if (index + size > W) return -4;  // OOB window reference
                if (o + size > out_cap) full = true;
                else {
                  copy_from_ring(index, size);
                  int wr = size < (W - pos) ? size : (W - pos);
                  std::memcpy(&ring[pos], out + o, (size_t)wr);
                  pos += wr; if (pos == W) pos = 0;
                  o += size;
                  continue;
                }
              }
            }
          }
        } else {  // basic match
          if (refill(window)) {
            last_was_flush = false;
            int size = sym + minp;
            int index = (int)take(window);
            if (index + size > W) return -4;  // OOB window reference
            if (o + size > out_cap) full = true;
            else {
              copy_from_ring(index, size);
              window_write(size);
              o += size;
              continue;
            }
          }
        }
      }
    }
    // partial token (eof) or output full: roll back to the token start
    acc = s_acc; bits = s_bits; pos_in = s_pos;
    *out_len = o;
    return full ? 1 : 0;
  }
  *out_len = o;
  return 0;
}

// ---- streaming compressor --------------------------------------------------
// Statuses: 0 ok, 1 output full (call again with fresh buffer), -2 excess
// bits, -5 invalid use.

static void stream_comp_init_state(StreamComp* s, const uint8_t* dict) {
  Committer& c = s->c;
  c.ring.assign((size_t)c.W, 0);
  if (dict) std::memcpy(c.ring.data(), dict, (size_t)c.W);
  else init_dictionary(c.ring.data(), c.W, c.extended ? c.literal : 8);
  c.pos = 0;
  c.seed_chains();
  c.t = 0; c.rle_count = 0; c.ext_count = 0; c.ext_pos = 0;
  c.cached_idx = -1; c.excess_bits = false;
  s->buf.clear();
  s->c.data = nullptr; s->c.N = 0;
}

void* tampn_comp_new(int window, int literal, int extended, int lazy,
                     const uint8_t* dict, int dictionary_reset, int append) {
  auto* s = new StreamComp();
  Committer& c = s->c;
  c.W = 1 << window; c.wmask = c.W - 1; c.wbits = window; c.literal = literal;
  c.minp = min_pattern_size(window, literal);
  c.maxpat = extended ? c.minp + 131 : c.minp + 13;
  c.extended = extended != 0; c.lazy = lazy != 0;
  c.flen = nullptr; c.fidx = nullptr; c.plen = nullptr; c.pidx = nullptr;
  c.full_cap = (LOOKAHEAD < c.maxpat) ? LOOKAHEAD : c.maxpat;
  s->dictionary_reset = dictionary_reset != 0;
  stream_comp_init_state(s, dict);
  if (append) {
    // An append stream begins with a byte-aligned FLUSH instead of a
    // header; with the prior stream's trailing FLUSH this forms the
    // double-FLUSH dictionary-reset signal (append-without-history).
    s->acc = 0x0ABu << 7;  // 9-bit FLUSH code + zero pad
    s->bits = 16;
    s->last_was_flush = true;
  } else {
    uint32_t h = (uint32_t)(((window - 8) << 5) | ((literal - 5) << 3) |
                            ((dict ? 1 : 0) << 2) | ((extended ? 1 : 0) << 1) |
                            (dictionary_reset ? 1 : 0));
    s->acc = h;
    s->bits = 8;
    if (dictionary_reset) {  // reserved second header byte
      s->acc <<= 8;
      s->bits = 16;
    }
  }
  return s;
}

void tampn_comp_free(void* h) { delete (StreamComp*)h; }

int tampn_comp_write(void* h, const uint8_t* in, int64_t in_len,
                     uint8_t* out, int64_t out_cap, int64_t* written) {
  auto* s = (StreamComp*)h;
  *written = 0;
  if (s->excess) return -2;
  if (in_len > 0) {
    s->buf.insert(s->buf.end(), in, in + in_len);
    s->in_total += in_len;
  }
  BitWriter bw(out, out_cap);
  bw.acc = s->acc; bw.bits = s->bits;
  int64_t emitted_before = bw.bits;
  int rc = s->run_held(bw);
  if (bw.n * 8 + bw.bits != emitted_before) s->last_was_flush = false;
  s->acc = bw.acc; s->bits = bw.bits;
  *written = bw.n;
  s->out_total += bw.n;
  return rc;
}

int tampn_comp_flush(void* h, int write_token, uint8_t* out, int64_t out_cap,
                     int64_t* written) {
  auto* s = (StreamComp*)h;
  *written = 0;
  if (s->excess) return -2;
  BitWriter bw(out, out_cap);
  bw.acc = s->acc; bw.bits = s->bits;
  int64_t emitted_before = bw.n * 8 + bw.bits;
  int rc = s->drain(bw);
  if (rc) {  // output full (or callback abort) mid-drain: save and report
    s->acc = bw.acc; s->bits = bw.bits;
    *written = bw.n;
    s->out_total += bw.n;
    return rc;
  }
  if (bw.n * 8 + bw.bits != emitted_before) s->last_was_flush = false;
  bw.put(0, 0);  // drain any whole bytes (e.g. the queued header)
  bool emit = write_token && !s->last_was_flush;
  bool token_written = false;
  if (emit && (bw.bits > 0 || s->dictionary_reset)) {
    bw.put(0xAB, 9);
    token_written = true;
  }
  bw.pad();
  if (bw.overflow) return 1;
  if (token_written) s->last_was_flush = true;
  s->acc = 0; s->bits = 0;
  *written = bw.n;
  s->out_total += bw.n;
  return 0;
}

int tampn_comp_reset_dictionary(void* h, uint8_t* out, int64_t out_cap,
                                int64_t* written) {
  auto* s = (StreamComp*)h;
  *written = 0;
  if (!s->dictionary_reset) return -5;
  int64_t total = 0;
  for (int i = 0; i < 2; i++) {
    s->last_was_flush = false;  // deliberately bypass suppression
    int64_t w = 0;
    int rc = tampn_comp_flush(h, 1, out + total, out_cap - total, &w);
    total += w;
    if (rc) { *written = total; return rc; }
  }
  stream_comp_init_state(s, nullptr);
  s->last_was_flush = false;
  s->acc = 0; s->bits = 0;
  *written = total;
  return 0;
}

// ---- streaming decompressor ------------------------------------------------

void* tampn_dec_new(const uint8_t* dict, int64_t dict_len) {
  ensure_huff_tables();
  auto* s = new StreamDecomp();
  if (dict && dict_len > 0) s->dict.assign(dict, dict + dict_len);
  return s;
}

void tampn_dec_free(void* h) { delete (StreamDecomp*)h; }

int tampn_dec_feed(void* h, const uint8_t* in, int64_t in_len) {
  auto* s = (StreamDecomp*)h;
  if (in_len > 0) s->inbuf.insert(s->inbuf.end(), in, in + in_len);
  return 0;
}

// Decode as much as fits.  Returns 0 (call again after feeding more input
// if *written < out_cap), -3 invalid stream, -4 OOB reference.
int tampn_dec_read(void* h, uint8_t* out, int64_t out_cap, int64_t* written) {
  auto* s = (StreamDecomp*)h;
  int64_t o = 0;
  *written = 0;
  if (s->bad) return -3;

  // Serve spilled bytes first.
  while (s->spill_off < s->spill.size() && o < out_cap)
    out[o++] = s->spill[s->spill_off++];
  if (s->spill_off >= s->spill.size()) { s->spill.clear(); s->spill_off = 0; }

  const uint8_t* in = s->inbuf.data();
  int64_t n = (int64_t)s->inbuf.size();

  if (!s->configured) {
    if (!s->have_first) {
      if (s->in_pos >= n) { *written = o; return 0; }
      s->first_byte = in[s->in_pos++];
      s->have_first = true;
    }
    uint8_t hb = s->first_byte;
    s->window = (hb >> 5) + 8;
    s->literal = ((hb >> 3) & 3) + 5;
    s->custom = (hb >> 2) & 1;
    s->extended = (hb >> 1) & 1;
    s->more = hb & 1;
    if (s->more) {
      if (s->in_pos >= n) { *written = o; return 0; }
      if (in[s->in_pos++] != 0) { s->bad = true; return -3; }
    }
    s->W = 1 << s->window;
    s->wmask = s->W - 1;
    s->minp = min_pattern_size(s->window, s->literal);
    if (s->custom && (int64_t)s->dict.size() < s->W) { s->bad = true; return -3; }
    s->ring.assign((size_t)s->W, 0);
    if (s->custom) std::memcpy(s->ring.data(), s->dict.data(), (size_t)s->W);
    else init_dictionary(s->ring.data(), s->W, s->extended ? s->literal : 8);
    s->pos = 0;
    s->configured = true;
  }

  uint64_t acc = s->acc;
  int bits = s->bits;
  int64_t pos_in = s->in_pos;
  int pos = s->pos;
  uint8_t* ring = s->ring.data();
  const int W = s->W, wmask = s->wmask, minp = s->minp, literal = s->literal;

  auto refill = [&](int need) -> bool {
    while (bits < need) {
      if (pos_in >= n) return false;
      acc = (acc << 8) | in[pos_in++];
      bits += 8;
    }
    return true;
  };
  auto take = [&](int nb) -> uint32_t {
    uint32_t v = (uint32_t)((acc >> (bits - nb)) & ((1ull << nb) - 1));
    bits -= nb;
    return v;
  };
  bool bad = false;
  auto read_sym = [&]() -> int {
    while (bits < 8 && pos_in < n) { acc = (acc << 8) | in[pos_in++]; bits += 8; }
    if (bits >= 8) {
      uint32_t peek = (uint32_t)(acc >> (bits - 8)) & 0xFF;
      int sym = SYM_TAB[peek];
      if (sym == 0xFF) { bad = true; return -1; }
      bits -= LEN_TAB[peek];
      return sym;
    }
    uint32_t key = 1;
    for (int i = 0; i < 8; i++) {
      if (!refill(1)) return -1;
      key = (key << 1) | take(1);
      for (int sym = 0; sym < 15; sym++)
        if (key == ((1u << (HUFF_BITS[sym] - 1)) | HUFF_CODE[sym])) return sym;
    }
    bad = true;
    return -1;
  };
  // Emit decoded bytes: direct to out, spilling the remainder.
  auto emit = [&](const uint8_t* src, int count) {
    int direct = (int)((out_cap - o) < count ? (out_cap - o) : count);
    if (direct > 0) { std::memcpy(out + o, src, (size_t)direct); o += direct; }
    if (direct < count)
      s->spill.insert(s->spill.end(), src + direct, src + count);
  };
  uint8_t tmp[256];

  // Progress callback: polled every 1024 tokens at a token boundary (the
  // per-token cost when unset is one predicted branch).  A nonzero return
  // aborts; state is saved exactly as on a normal return, so the caller
  // may resume with another read.
  int cb_rc = 0;
  auto poll_cb = [&]() -> bool {
    if (__builtin_expect(s->cb != nullptr, 0) && ((++s->cb_ctr & 1023u) == 0)) {
      cb_rc = s->cb(s->cb_user, s->in_base + pos_in, s->out_total + o);
      return cb_rc != 0;
    }
    return false;
  };

  // FAST PATH (mirrors tampn_decompress): with >=8 loadable input bytes and
  // >=256 output slack no token needs refill checks, rollback snapshots,
  // bounds checks, or the spill buffer.
  if (s->spill.empty()) {
    const int64_t in_guard = n - 8;
    const int64_t out_guard = out_cap - 256;
    const uint32_t lit_mask = (1u << literal) - 1;
    const int window = s->window;
    const bool extended = s->extended, more = s->more;
    bool last_was_flush = s->last_was_flush;
    while (pos_in <= in_guard && o <= out_guard) {
      if (poll_cb()) break;
      int nb = (63 - bits) >> 3;
      if (nb) {
        uint64_t chunk;
        std::memcpy(&chunk, in + pos_in, 8);
        chunk = __builtin_bswap64(chunk);
        acc = (acc << (nb * 8)) | (chunk >> (64 - nb * 8));
        pos_in += nb;
        bits += nb * 8;
      }
      if ((acc >> (bits - 1)) & 1) {  // literal
        bits -= 1 + literal;
        uint8_t b = (uint8_t)((acc >> bits) & lit_mask);
        last_was_flush = false;
        out[o++] = b;
        ring[pos] = b;
        pos = (pos + 1) & wmask;
        continue;
      }
      bits -= 1;
      uint32_t peek = (uint32_t)(acc >> (bits - 8)) & 0xFF;
      int sym = SYM_TAB[peek];
      if (sym == 0xFF) { s->bad = true; return -3; }
      bits -= LEN_TAB[peek];
      if (sym == FLUSH_SYM) {
        bits &= ~7;  // discard padding to the byte boundary
        if (more && last_was_flush) {
          init_dictionary(ring, W, extended ? literal : 8);
          pos = 0;
        }
        last_was_flush = true;
        continue;
      }
      last_was_flush = false;
      if (extended && sym > 11) {
        peek = (uint32_t)(acc >> (bits - 8)) & 0xFF;
        int s2 = SYM_TAB[peek];
        if (s2 == 0xFF) { s->bad = true; return -3; }
        bits -= LEN_TAB[peek];
        if (sym == RLE_SYM) {
          bits -= RLE_TRAIL;
          int count = (s2 << RLE_TRAIL) +
                      (int)((acc >> bits) & ((1u << RLE_TRAIL) - 1)) + 2;
          uint8_t b = ring[(pos - 1) & wmask];
          std::memset(out + o, b, (size_t)count);
          o += count;
          int wr = count < RLE_MAX_WIN ? count : RLE_MAX_WIN;
          if (wr > W - pos) wr = W - pos;
          std::memset(&ring[pos], b, (size_t)wr);
          pos = (pos + wr) & wmask;
        } else {  // extended match (never wraps on window write)
          bits -= EXT_TRAIL;
          int size = (s2 << EXT_TRAIL) +
                     (int)((acc >> bits) & ((1u << EXT_TRAIL) - 1)) + minp + 12;
          bits -= window;
          int index = (int)((acc >> bits) & (uint32_t)wmask);
          if (index + size > W) { s->bad = true; return -4; }
          std::memcpy(out + o, ring + index, (size_t)size);
          int wr = size < (W - pos) ? size : (W - pos);
          std::memcpy(ring + pos, out + o, (size_t)wr);
          pos = (pos + wr) & wmask;
          o += size;
        }
      } else {  // basic match, size <= minp+13 <= 16
        int size = sym + minp;
        bits -= window;
        int index = (int)((acc >> bits) & (uint32_t)wmask);
        if (index + size > W) { s->bad = true; return -4; }
        if (index + 16 <= W)
          std::memcpy(out + o, ring + index, 16);
        else
          std::memcpy(out + o, ring + index, (size_t)size);
        if (pos + size <= W) {
          std::memcpy(ring + pos, out + o, (size_t)size);
          pos = (pos + size) & wmask;
        } else {
          for (int i = 0; i < size; i++) {
            ring[pos] = out[o + i];
            pos = (pos + 1) & wmask;
          }
        }
        o += size;
      }
    }
    s->last_was_flush = last_was_flush;
  }

  while (!cb_rc && s->spill.empty()) {
    if (poll_cb()) break;
    if (!refill(1)) break;
    uint64_t s_acc = acc; int s_bits = bits; int64_t s_pos = pos_in;

    if (take(1)) {  // literal
      if (!refill(literal)) { acc = s_acc; bits = s_bits; pos_in = s_pos; break; }
      uint8_t b = (uint8_t)take(literal);
      s->last_was_flush = false;
      emit(&b, 1);
      ring[pos] = b; if (++pos == W) pos = 0;
      continue;
    }
    int sym = read_sym();
    if (bad) { s->bad = true; return -3; }
    if (sym < 0) { acc = s_acc; bits = s_bits; pos_in = s_pos; break; }
    if (sym == FLUSH_SYM) {
      bits &= ~7;  // discard padding to the byte boundary
      if (s->more && s->last_was_flush) {
        init_dictionary(ring, W, s->extended ? literal : 8);
        pos = 0;
      }
      s->last_was_flush = true;
      continue;
    }
    if (s->extended && sym > 11) {
      int s2 = read_sym();
      if (bad) { s->bad = true; return -3; }
      if (s2 < 0) { acc = s_acc; bits = s_bits; pos_in = s_pos; break; }
      if (sym == RLE_SYM) {
        if (!refill(RLE_TRAIL)) { acc = s_acc; bits = s_bits; pos_in = s_pos; break; }
        s->last_was_flush = false;
        int count = (s2 << RLE_TRAIL) + (int)take(RLE_TRAIL) + 2;
        uint8_t b = ring[pos == 0 ? W - 1 : pos - 1];
        std::memset(tmp, b, (size_t)count);
        emit(tmp, count);
        int wr = count < RLE_MAX_WIN ? count : RLE_MAX_WIN;
        if (wr > W - pos) wr = W - pos;
        for (int i = 0; i < wr; i++) { ring[pos] = b; if (++pos == W) pos = 0; }
        continue;
      }
      // extended match
      if (!refill(EXT_TRAIL + s->window)) { acc = s_acc; bits = s_bits; pos_in = s_pos; break; }
      s->last_was_flush = false;
      int size = (s2 << EXT_TRAIL) + (int)take(EXT_TRAIL) + minp + 12;
      int index = (int)take(s->window);
      if (index + size > W) { s->bad = true; return -4; }
      std::memcpy(tmp, ring + index, (size_t)size);
      int wr = size < (W - pos) ? size : (W - pos);
      std::memcpy(ring + pos, tmp, (size_t)wr);
      pos += wr; if (pos == W) pos = 0;
      emit(tmp, size);
      continue;
    }
    // basic match
    if (!refill(s->window)) { acc = s_acc; bits = s_bits; pos_in = s_pos; break; }
    s->last_was_flush = false;
    int size = sym + minp;
    int index = (int)take(s->window);
    if (index + size > W) { s->bad = true; return -4; }
    std::memcpy(tmp, ring + index, (size_t)size);
    for (int i = 0; i < size; i++) { ring[pos] = tmp[i]; if (++pos == W) pos = 0; }
    emit(tmp, size);
  }

  s->acc = acc; s->bits = bits; s->in_pos = pos_in; s->pos = pos;
  if (s->in_pos > (1 << 20)) {  // compact consumed input
    s->in_base += s->in_pos;
    s->inbuf.erase(s->inbuf.begin(), s->inbuf.begin() + s->in_pos);
    s->in_pos = 0;
  }
  *written = o;
  s->out_total += o;
  return cb_rc;
}

void tampn_comp_set_callback(void* h, tampn_cb_t cb, void* user) {
  auto* s = (StreamComp*)h;
  s->cb = cb; s->cb_user = user; s->cb_ctr = 0;
}

void tampn_dec_set_callback(void* h, tampn_cb_t cb, void* user) {
  auto* s = (StreamDecomp*)h;
  s->cb = cb; s->cb_user = user; s->cb_ctr = 0;
}

// ---- per-position match tables (v1 model) ----------------------------------
// The exact tables the vectorized engines consume (longest match, lowest
// ring slot), computed at chain-search speed: one hash-chain search per
// position against the last-W-bytes window of dict || data[:t] — the v1
// ring model, which is tokenization-independent.  Feeds the optimal parse.
// plen/pidx (nullable): the lazy probe table — target data[t+1:], cap 15,
// against the ring state BEFORE byte t is written (reference probe_search
// semantics; engine/search_np.match_tables compute_probe equivalent).
int tampn_v1_tables(const uint8_t* data, int64_t n, const uint8_t* dict,
                    int window, int literal, int cap, int ext_dict,
                    const uint32_t* khat,
                    uint8_t* flen, int32_t* fidx,
                    uint8_t* plen, int32_t* pidx) {
  Committer c;
  c.W = 1 << window; c.wmask = c.W - 1; c.wbits = window; c.literal = literal;
  c.minp = min_pattern_size(window, literal);
  c.maxpat = cap;
  c.extended = false; c.lazy = false;
  c.data = data; c.N = n;
  c.full_cap = cap;
  c.ring.resize(c.W);
  if (dict) std::memcpy(c.ring.data(), dict, (size_t)c.W);
  // v1 seeds literal=8; extended streams seed with the real literal width
  else init_dictionary(c.ring.data(), c.W, ext_dict ? literal : 8);
  c.seed_chains();
  int prev_len = 0, prev_idx = 0;
  for (int64_t t = 0; t < n; t++) {
    int tl = (int)((n - t) < cap ? (n - t) : cap);
    // prefix-property seed: last position's length-L match at slot x gives
    // a valid length L-1 candidate at slot x+1 — unless the intervening
    // ring write landed inside it
    int seed_len = prev_len - 1, seed_slot = prev_idx + 1;
    if (seed_len >= c.minp) {
      int w_slot = c.pos == 0 ? c.W - 1 : c.pos - 1;  // last written slot
      if (w_slot >= seed_slot && w_slot < seed_slot + seed_len) seed_len = 0;
    } else {
      seed_len = 0;
    }
    SearchResult r = c.chain_search(data + t, tl, cap, 0, seed_len, seed_slot);
    flen[t] = (uint8_t)(r.size < c.minp ? 0 : r.size);
    fidx[t] = r.idx;
    if (plen) {
      int ptl = (int)((n - t - 1) < 15 ? (n - t - 1) : 15);
      if (ptl >= c.minp) {
        SearchResult p = c.chain_search(data + t + 1, ptl, 15, 0);
        plen[t] = (uint8_t)(p.size < c.minp ? 0 : p.size);
        pidx[t] = p.idx;
      } else {
        plen[t] = 0;
        pidx[t] = 0;
      }
    }
    prev_len = r.size >= c.minp ? r.size : 0;
    prev_idx = r.idx;
    // khat: the model write count (planned-RLE truncation) — push only the
    // bytes the decoder will actually write into its window
    if (!khat || khat[t + 1] > khat[t]) c.ring_push(data[t]);
  }
  return 0;
}

// ---- planned-mode prep (device ext pipeline) --------------------------------
// One pass over the input producing everything the device extended encode
// pipeline needs on the host (the semantic reference is engine/plan.py
// plan_runs + build_model_history(window_bits) + pipeline_ext._chunk_counts;
// differential-tested in tests/test_encode_ext_device.py):
//   plans  : (rle_start=s+1, end) int64 pairs for maximal byte runs >= 9
//   khat   : uint32[n+1], kept (window-written) bytes among positions < t
//   dh     : the kept byte stream (model history)
//   rc     : uint8[dh_len], forced-RLE chunk input count (2..241) at each
//            chunk's MODEL start, 0 elsewhere
// Chunk rule (left-greedy): c = min(241, remn), c-- if it would leave a
// single trailing byte; keeps = min(8, c, W - pos) with pos the ring
// position at the chunk's model start (keeps never wrap the ring).
// Returns 0, or -1 if plans_cap is too small (cap n/9+1 always suffices).
int tampn_ext_prep(const uint8_t* data, int64_t n, int window,
                   int64_t* plans, int64_t plans_cap, int64_t* n_plans,
                   uint32_t* khat, uint8_t* dh, uint8_t* rc,
                   int64_t* dh_len) {
  const int W = 1 << window;
  const int64_t MIN_RUN = 9, RLEMAX = 241, RLE_WIN = 8;
  int64_t np_ = 0, k = 0, t = 0;
  khat[0] = 0;
  while (t < n) {
    // find the maximal run starting at t
    const uint8_t b = data[t];
    int64_t e = t + 1;
    while (e < n && data[e] == b) e++;
    if (e - t < MIN_RUN) {
      // ordinary bytes: all kept
      for (int64_t p = t; p < e; p++) {
        dh[k] = data[p];
        rc[k] = 0;
        khat[p + 1] = (uint32_t)++k;
      }
      t = e;
      continue;
    }
    // run >= 9: byte at t is ordinary (the region starts at t+1)
    dh[k] = b;
    rc[k] = 0;
    khat[t + 1] = (uint32_t)++k;
    if (np_ >= plans_cap) return -1;
    plans[2 * np_] = t + 1;
    plans[2 * np_ + 1] = e;
    np_++;
    int64_t p = t + 1;
    while (p < e) {
      int64_t remn = e - p;
      int64_t c = remn < RLEMAX ? remn : RLEMAX;
      if (remn - c == 1) c--;
      int64_t keep = c < RLE_WIN ? c : RLE_WIN;
      int64_t room = W - (k % W);
      if (keep > room) keep = room;  // room >= 1 always: keep >= 1
      int64_t k0 = k;
      rc[k0] = (uint8_t)c;
      for (int64_t j = 0; j < keep; j++) {
        dh[k] = b;
        if (j) rc[k] = 0;
        k++;
      }
      // a chunk keeps its FIRST `keep` input bytes (engine/plan.py
      // _chunk_keep_mask): khat[p+q+1] = k0 + min(q+1, keep)
      for (int64_t q = 0; q < c; q++)
        khat[p + q + 1] = (uint32_t)(k0 + (q + 1 < keep ? q + 1 : keep));
      p += c;
    }
    t = e;
  }
  *n_plans = np_;
  *dh_len = k;
  return 0;
}

// ---- planned-mode tail bits (device ext pipeline) ---------------------------
// Resume the planned extended walk mid-stream and emit the remaining token
// bits — the single source of planned-mode tail semantics (the device
// pipeline's Pallas kernel stops at the last steady position; this entry
// finishes the stream, replacing a Python port of the same walk).
//
// data/n: the full input shard; t_in: resume input position (a walk entry:
// the kernel stops between tokens, possibly at a mid-region forced-RLE
// chunk start); dh/kwr: the model-history byte stream (data[keep]) and the
// resume model position (== khat[t_in]); khat/plan/n_plan: the planner's
// model (engine/plan.py); dict: initialized window (1<<window bytes) or
// null for the default; acc/an: the <=31-bit remainder handed back by the
// commit kernel.  Output: the tail bytes (remainder included, final
// partial byte zero-padded).  Returns 0 ok, -1 output full, -2 excess bits.
int tampn_ext_tail_bits(const uint8_t* data, int64_t n, int64_t t_in,
                        const uint8_t* dh, int64_t kwr,
                        const uint32_t* khat, const int64_t* plan, int n_plan,
                        const uint8_t* dict, int window, int literal, int lazy,
                        uint32_t acc, int an,
                        uint8_t* out, int64_t out_cap, int64_t* out_len) {
  Committer c;
  c.W = 1 << window; c.wmask = c.W - 1; c.wbits = window; c.literal = literal;
  c.minp = min_pattern_size(window, literal);
  c.maxpat = c.minp + 131;
  c.extended = true; c.lazy = lazy != 0;
  c.avoid_divergence = true;  // planned mode: the model never diverges
  c.data = data; c.N = n;
  c.khat = khat; c.plan = plan; c.n_plan = n_plan;
  c.dh = dh; c.M = (int64_t)khat[n];  // model-target searches (Committer::dh)
  c.full_cap = (LOOKAHEAD < c.maxpat) ? LOOKAHEAD : c.maxpat;
  c.ring.resize(c.W);
  if (dict) std::memcpy(c.ring.data(), dict, (size_t)c.W);
  else init_dictionary(c.ring.data(), c.W, literal);
  c.seed_chains();
  // Fast-forward the window state by replaying the tail of the model
  // stream.  K is chosen so the first replayed byte lands at ring slot 0
  // ((kwr - K) % W == 0, model purity puts byte p at slot p % W), the
  // final write head is kwr % W, and every surviving chain entry is one
  // the real walk would also consider (dictionary entries expire iff
  // kwr >= W, replayed entries iff older than the last W).
  int64_t K = kwr <= (int64_t)c.W ? kwr
                                  : (int64_t)c.W + (kwr & (c.W - 1));
  if (K) c.ring_push_run(dh + (kwr - K), (int)K);
  c.t = t_in;
  BitWriter bw(out, out_cap);
  if (an > 0) bw.put(acc, an);
  // A resume inside a forced-RLE region lands on a chunk start (the chunk
  // layout is left-greedy, so re-running it from any chunk boundary yields
  // the original chunks); step() only fires forced_rle at the region
  // start, so emit the region remainder here first.
  while (c.plan_i < n_plan && c.t >= plan[2 * c.plan_i + 1]) c.plan_i++;
  if (c.plan_i < n_plan && c.t > plan[2 * c.plan_i] &&
      c.t < plan[2 * c.plan_i + 1]) {
    int64_t end = plan[2 * c.plan_i + 1];
    c.plan_i++;
    c.bw = &bw;
    c.forced_rle(end);
    if (bw.overflow) { *out_len = bw.n; return -1; }
  }
  int rc = c.run(bw);
  *out_len = bw.n;
  return rc;
}

// ---- optimal (minimum-bit) v1 parse ----------------------------------------
// Dynamic program over the exact per-position match tables: cost[i] = fewest
// payload bits to encode data[i..n).  Valid tokens at i: a literal (iff
// data[i] fits `literal` bits) or a match of any size s in [minp,
// min(flen[i], minp+13)] at offset fidx[i] (a prefix of the longest match is
// itself a match at the same ring slot; v1 window content is
// tokenization-independent, so the tables stay exact under any parse).
// Output: per-token sizes (1 = literal); the caller expands offsets/values.
// Returns 0 ok, -2 excess bits (some byte can neither be a literal nor be
// covered by a match).
int tampn_opt_v1_plan(const uint8_t* data, const uint8_t* flen,
                      const int32_t* fidx, int64_t n, int window, int literal,
                      uint8_t* sizes, int64_t* n_tokens) {
  (void)fidx;
  const int minp = min_pattern_size(window, literal);
  const int maxpat = minp + 13;
  const uint32_t INF = 0x7FFFFFFFu;
  const uint32_t lit_cost = (uint32_t)(1 + literal);
  const int lit_limit = literal == 8 ? 256 : (1 << literal);
  std::vector<uint32_t> cost((size_t)n + 1);
  std::vector<uint8_t> choice((size_t)n);
  cost[(size_t)n] = 0;
  for (int64_t i = n - 1; i >= 0; i--) {
    uint32_t best = INF;
    uint8_t ch = 0;
    if (data[i] < lit_limit && cost[(size_t)i + 1] < INF) {
      best = cost[(size_t)i + 1] + lit_cost;
      ch = 1;
    }
    int cap = flen[i];
    if (cap > maxpat) cap = maxpat;  // search tables cap at 16; v1 caps lower
    for (int s = minp; s <= cap; s++) {
      uint32_t below = cost[(size_t)(i + s)];
      if (below >= INF) continue;
      uint32_t c = below + HUFF_BITS[s - minp] + (uint32_t)window;
      if (c < best) { best = c; ch = (uint8_t)s; }
    }
    if (ch == 0) return -2;  // excess bits with no covering match
    cost[(size_t)i] = best;
    choice[(size_t)i] = ch;
  }
  int64_t t = 0;
  for (int64_t i = 0; i < n;) {
    sizes[t++] = choice[(size_t)i];
    i += choice[(size_t)i];
  }
  *n_tokens = t;
  return 0;
}

// ---- optimal extended parse (no-RLE, divergence-free subset) ---------------
// Token family: literal | basic match (sizes minp..minp+11) | extended
// match (sizes minp+12..minp+131) CAPPED at the ring end (W - i mod W).
// Without RLE and without extended-match write truncation, every token
// writes exactly its bytes, so the window remains the tokenization-
// independent v1 model and the same exact tables stay valid.  Output
// streams carry the extended header and decode in every implementation;
// long runs are covered by self-referential extended matches instead of
// RLE (reference RLE wins a few bits only on multi-hundred-byte runs).
int tampn_opt_ext_plan(const uint8_t* data, const uint8_t* flen,
                       const int32_t* fidx, const uint32_t* khat,
                       const int64_t* runs, int n_runs,
                       int64_t n, int window, int literal,
                       uint8_t* sizes, uint8_t* kinds, int64_t* n_tokens) {
  (void)fidx;
  const int minp = min_pattern_size(window, literal);
  const int W = 1 << window;
  const uint32_t INF = 0x7FFFFFFFu;
  const uint32_t lit_cost = (uint32_t)(1 + literal);
  const int lit_limit = literal == 8 ? 256 : (1 << literal);
  const int max_ext = minp + 131;
  uint8_t ext_cost[120];  // value = size - minp - 12 in [0, 119]; incl window
  for (int v = 0; v < 120; v++)
    ext_cost[v] = (uint8_t)(HUFF_BITS[13] + (HUFF_BITS[v >> 3] - 1) + 3 + window);
  uint8_t rle_cost[240];  // count - 2 in [0, 239]
  for (int v = 0; v < 240; v++)
    rle_cost[v] = (uint8_t)(HUFF_BITS[12] + (HUFF_BITS[v >> 4] - 1) + 4);
  std::vector<uint32_t> cost((size_t)n + 1);
  std::vector<uint8_t> choice((size_t)n);
  std::vector<uint8_t> kind((size_t)n);
  cost[(size_t)n] = 0;
  // runs: n_runs pairs (a, b), sorted ascending, non-overlapping, length
  // >= 2, each a forced-RLE region (caller guarantees data[a-1..b) is one
  // repeated byte and khat models the <=8-byte truncated window writes).
  // An RLE token covers 2..241 bytes; a region splits greedily with a
  // 240+2 fixup when the remainder would be 1.
  auto region_split = [](int64_t rest) -> int {
    return rest >= 243 ? 241 : (rest == 242 ? 240 : (int)rest);
  };
  int ri = n_runs - 1;
  for (int64_t i = n - 1; i >= 0; i--) {
    while (ri >= 0 && runs[2 * ri] > i) ri--;
    if (ri >= 0 && i < runs[2 * ri + 1]) {  // inside forced region [a, b)
      const int64_t a = runs[2 * ri], b = runs[2 * ri + 1];
      if (i != a) {
        cost[(size_t)i] = INF;  // only the region start is a DP node
        continue;
      }
      uint32_t rbits = 0;
      for (int64_t p = a; p < b;) {
        int count = region_split(b - p);
        rbits += rle_cost[count - 2];
        p += count;
      }
      uint32_t below = cost[(size_t)b];
      cost[(size_t)i] = below >= INF ? INF : below + rbits;
      kind[(size_t)i] = 3;  // walk expands the region's RLE tokens
      continue;
    }
    const int64_t next_bound = (ri + 1 < n_runs) ? runs[2 * (ri + 1)] : n;
    const int64_t cap_total = next_bound - i;
    uint32_t best = INF;
    uint8_t ch = 0, kd = 0;
    if (data[i] < lit_limit && cost[(size_t)i + 1] < INF) {
      best = cost[(size_t)i + 1] + lit_cost;
      ch = 1; kd = 0;
    }
    int len = flen[i];
    if (len > cap_total) len = (int)cap_total;
    int capb = len < minp + 11 ? len : minp + 11;
    for (int s = minp; s <= capb; s++) {
      uint32_t below = cost[(size_t)(i + s)];
      if (below >= INF) continue;
      uint32_t c = below + HUFF_BITS[s - minp] + (uint32_t)window;
      if (c < best) { best = c; ch = (uint8_t)s; kd = 1; }
    }
    int cape = len < max_ext ? len : max_ext;
    const int room = W - (int)(khat ? (khat[i] & (uint32_t)(W - 1))
                                    : (i & (W - 1)));
    if (cape > room) cape = room;
    for (int s = minp + 12; s <= cape; s++) {
      uint32_t below = cost[(size_t)(i + s)];
      if (below >= INF) continue;
      uint32_t c = below + ext_cost[s - minp - 12];
      if (c < best) { best = c; ch = (uint8_t)s; kd = 2; }
    }
    if (ch == 0) return -2;
    cost[(size_t)i] = best;
    choice[(size_t)i] = ch;
    kind[(size_t)i] = kd;
  }
  int64_t t = 0;
  int wi = 0;  // walk's run cursor (ascending)
  for (int64_t i = 0; i < n;) {
    if (kind[(size_t)i] == 3) {  // forced region: expand its RLE tokens
      while (wi < n_runs && runs[2 * wi + 1] <= i) wi++;
      const int64_t b = runs[2 * wi + 1];
      while (i < b) {
        int count = region_split(b - i);
        sizes[t] = (uint8_t)count;
        kinds[t] = 3;
        t++;
        i += count;
      }
      continue;
    }
    sizes[t] = choice[(size_t)i];
    kinds[t] = kind[(size_t)i];
    t++;
    i += choice[(size_t)i];
  }
  *n_tokens = t;
  return 0;
}

// Expand a per-position choice plane (from the device min-plus DP,
// ops/opt_parse_ext.py) into the same (sizes, kinds) token stream
// tampn_opt_ext_plan emits: advance by choice outside forced regions,
// expand each region's RLE chunks by the 241/240 split rule inside.
// kinds: 0 literal, 1 basic, 2 extended, 3 RLE.  Returns 0 ok, -1 on a
// stuck choice (device DP error).
int tampn_opt_ext_walk(const uint8_t* choice, int64_t n, int minp,
                       const int64_t* runs, int n_runs,
                       uint8_t* sizes, uint8_t* kinds, int64_t* n_tokens) {
  int wi = 0;
  int64_t t = 0;
  for (int64_t i = 0; i < n;) {
    while (wi < n_runs && runs[2 * wi + 1] <= i) wi++;
    if (wi < n_runs && i >= runs[2 * wi] && i < runs[2 * wi + 1]) {
      const int64_t b = runs[2 * wi + 1];
      while (i < b) {
        int64_t rest = b - i;
        int count = rest >= 243 ? 241 : (rest == 242 ? 240 : (int)rest);
        sizes[t] = (uint8_t)count;
        kinds[t] = 3;
        t++;
        i += count;
      }
      continue;
    }
    int ch = choice[i];
    if (ch < 1) return -1;
    sizes[t] = (uint8_t)ch;
    kinds[t] = ch == 1 ? 0 : (ch <= minp + 11 ? 1 : 2);
    t++;
    i += ch;
  }
  *n_tokens = t;
  return 0;
}

}  // extern "C"
