// Native FASTA parser + 2-bit packer — the host-side hot path.
//
// TPU-native successor of the reference's importSeqs/importSeqsNoNL
// (/root/reference/main.cu:401-545): single pass over the file, emitting a
// flat uint8 base-code stream (A=0,C=1,G=2,T=3; 0xFF for invalid characters
// and as the inter-sequence sentinel — the role the reference's '|'->'\0'
// sentinel plays at main.cu:506,539), per-sequence offsets/lengths, and the
// concatenated header lines. Also implements the 2-bit pack (4 bases/byte)
// + validity bitmask the reference only sketched (utils.h:65-92).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C dna_kmeres_parallel_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <zlib.h>

#include <algorithm>
#include <thread>
#include <vector>

namespace {

int num_threads(int64_t work, int64_t grain) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 1;
  int64_t by_work = work / grain;
  return static_cast<int>(
      std::max<int64_t>(1, std::min<int64_t>(std::min<int64_t>(hw, 16), by_work)));
}

constexpr uint8_t kInvalid = 0xFF;

// ASCII -> base code LUT (case-sensitive, matching the reference's exact
// char compares at kernels.h:136-139: only 'A','C','G','T' match).
struct Lut {
  uint8_t v[256];
  Lut() {
    memset(v, kInvalid, sizeof(v));
    v['A'] = 0;
    v['C'] = 1;
    v['G'] = 2;
    v['T'] = 3;
  }
};
const Lut kLut;

struct Buf {
  uint8_t* data = nullptr;
  int64_t len = 0;
  int64_t cap = 0;
  void reserve(int64_t need) {
    if (len + need <= cap) return;
    int64_t ncap = cap ? cap : 1 << 20;
    while (ncap < len + need) ncap *= 2;
    data = static_cast<uint8_t*>(realloc(data, ncap));
    cap = ncap;
  }
  void push(const uint8_t* src, int64_t n) {
    reserve(n);
    memcpy(data + len, src, n);
    len += n;
  }
  void push1(uint8_t b) {
    reserve(1);
    data[len++] = b;
  }
};

struct I64Buf {
  int64_t* data = nullptr;
  int64_t len = 0;
  int64_t cap = 0;
  void push(int64_t x) {
    if (len == cap) {
      cap = cap ? cap * 2 : 4096;
      data = static_cast<int64_t*>(realloc(data, cap * sizeof(int64_t)));
    }
    data[len++] = x;
  }
};

}  // namespace

extern "C" {

struct KpFasta;
int kp_parse_fasta_range(const char* path, int64_t start, int64_t end,
                         int64_t max_seqs, KpFasta** out);

// Result of a parse; all arrays are malloc'd and freed by kp_free_fasta.
struct KpFasta {
  int64_t n_seqs;
  int64_t stream_len;
  uint8_t* stream;   // flat base codes with one 0xFF sentinel between seqs
  int64_t* offsets;  // [n_seqs + 1] start offset of each sequence in stream
  int64_t* lengths;  // [n_seqs] real sequence length (no sentinel)
  char* ids;         // concatenated NUL-terminated header lines (with '>')
  int64_t ids_len;
  int64_t total_bases;
  int64_t invalid_bases;
};

// Parse a FASTA file into a flat encoded stream.
//   max_seqs <= 0 means unlimited.
// Record semantics = the "modern" parser (fasta.parse_fasta): '>' starts a
// header, sequence is the concatenation of following non-header lines,
// blank lines ignored, trailing CR stripped.
// Returns 0 on success, 1 on open failure, 2 on read failure.
int kp_parse_fasta(const char* path, int64_t max_seqs, KpFasta** out) {
  return kp_parse_fasta_range(path, 0, -1, max_seqs, out);
}

// Byte-range variant for multi-host input sharding: parses only records in
// [start, end) of the file (the caller aligns boundaries to record starts
// via parallel/multihost.split_fasta_byte_ranges; end < 0 means EOF).
//
// Also handles gzip-compressed input (zlib gzread reads plain files
// transparently) and FASTQ (first significant byte '@'; 4-state record
// machine, so '@' at the start of a quality line cannot start a record).
// Byte ranges are rejected on gzip input (ranges are computed on the
// compressed size but gzseek addresses uncompressed offsets): rc 3.
int kp_parse_fasta_range(const char* path, int64_t start, int64_t end,
                         int64_t max_seqs, KpFasta** out) {
  bool is_gz = false;
  {
    FILE* probe = fopen(path, "rb");
    if (!probe) return 1;
    unsigned char magic[2] = {0, 0};
    size_t got = fread(magic, 1, 2, probe);
    fclose(probe);
    is_gz = (got == 2 && magic[0] == 0x1F && magic[1] == 0x8B);
  }
  if (is_gz && (start > 0 || end >= 0)) return 3;
  gzFile f = gzopen(path, "rb");
  if (!f) return 1;
  if (start > 0 && gzseek(f, (z_off_t)start, SEEK_SET) < 0) {
    gzclose(f);
    return 2;
  }
  int64_t remaining = (end < 0) ? INT64_MAX : end - start;

  Buf stream;
  I64Buf offsets;
  I64Buf lengths;
  Buf ids;
  int64_t n_seqs = 0;
  int64_t cur_len = 0;
  int64_t total_bases = 0;
  int64_t invalid_bases = 0;
  bool in_seq = false;
  bool done = false;

  auto end_record = [&]() {
    if (in_seq) {
      lengths.push(cur_len);
      n_seqs++;
      in_seq = false;
      if (max_seqs > 0 && n_seqs >= max_seqs) done = true;
    }
  };

  constexpr int64_t CHUNK = 1 << 20;
  uint8_t* buf = static_cast<uint8_t*>(malloc(CHUNK));
  Buf line;  // line assembly across chunk boundaries

  // Format detection: first significant byte decides FASTA ('>') vs
  // FASTQ ('@'). FASTQ record machine: HDR -> SEQ(+) -> QUAL(length ==
  // sequence length) -> HDR, so quality lines beginning with '@' or '+'
  // never start a record.
  enum { FQ_HDR, FQ_SEQ, FQ_QUAL };
  int fq_state = FQ_HDR;
  int64_t fq_qual_seen = 0;
  int format = 0;  // 0 = undecided, 1 = fasta, 2 = fastq

  auto append_bases = [&](const uint8_t* s, int64_t n) {
    stream.reserve(n);
    uint8_t* dst = stream.data + stream.len;
    for (int64_t i = 0; i < n; i++) {
      uint8_t code = kLut.v[s[i]];
      dst[i] = code;
      invalid_bases += (code == kInvalid);
    }
    stream.len += n;
    cur_len += n;
    total_bases += n;
  };

  auto handle_line = [&](const uint8_t* s, int64_t n) {
    // strip trailing CR
    while (n > 0 && s[n - 1] == '\r') n--;
    if (n == 0) return;
    if (format == 0) format = (s[0] == '@') ? 2 : 1;
    if (format == 2) {
      if (fq_state == FQ_HDR) {
        if (s[0] != '@') return;  // tolerate junk between records
        end_record();
        if (done) return;
        ids.push(s, n);
        ids.push1('\0');
        if (n_seqs > 0 || stream.len > 0) stream.push1(kInvalid);
        offsets.push(stream.len);
        cur_len = 0;
        in_seq = true;
        fq_state = FQ_SEQ;
      } else if (fq_state == FQ_SEQ) {
        if (s[0] == '+') {
          if (cur_len == 0) {
            // Zero-length read (adapter-trimmed): no quality bytes follow,
            // so waiting in QUAL would eat the NEXT record's '@' header.
            end_record();
            fq_state = FQ_HDR;
          } else {
            fq_state = FQ_QUAL;
            fq_qual_seen = 0;
          }
        } else {
          append_bases(s, n);
        }
      } else {  // FQ_QUAL: consume until quality length covers the seq
        fq_qual_seen += n;
        if (fq_qual_seen >= cur_len) {
          end_record();
          fq_state = FQ_HDR;
        }
      }
      return;
    }
    if (s[0] == '>') {
      end_record();
      if (done) return;
      ids.push(s, n);
      ids.push1('\0');
      // sentinel between records (not before the first)
      if (n_seqs > 0 || stream.len > 0) stream.push1(kInvalid);
      offsets.push(stream.len);
      cur_len = 0;
      in_seq = true;
    } else if (in_seq) {
      append_bases(s, n);
    }
  };

  while (!done && remaining > 0) {
    int64_t want = CHUNK < remaining ? CHUNK : remaining;
    int64_t got = static_cast<int64_t>(
        gzread(f, buf, static_cast<unsigned>(want)));
    remaining -= got;
    if (got < 0) {
      gzclose(f);
      free(buf);
      return 2;
    }
    if (got == 0) break;
    int64_t pos = 0;
    while (pos < got && !done) {
      // find newline
      const uint8_t* nl =
          static_cast<const uint8_t*>(memchr(buf + pos, '\n', got - pos));
      if (nl) {
        int64_t n = nl - (buf + pos);
        if (line.len) {
          line.push(buf + pos, n);
          handle_line(line.data, line.len);
          line.len = 0;
        } else {
          handle_line(buf + pos, n);
        }
        pos += n + 1;
      } else {
        line.push(buf + pos, got - pos);
        pos = got;
      }
    }
  }
  if (!done && line.len) {
    handle_line(line.data, line.len);
    line.len = 0;
  }
  end_record();
  gzclose(f);
  free(buf);
  free(line.data);

  offsets.push(stream.len);  // terminal offset (always present, unlike the
                             // reference's EOF-only push at main.cu:523)

  KpFasta* r = static_cast<KpFasta*>(malloc(sizeof(KpFasta)));
  r->n_seqs = n_seqs;
  r->stream_len = stream.len;
  r->stream = stream.data;
  r->offsets = offsets.data;
  r->lengths = lengths.data;
  r->ids = reinterpret_cast<char*>(ids.data);
  r->ids_len = ids.len;
  r->total_bases = total_bases;
  r->invalid_bases = invalid_bases;
  *out = r;
  return 0;
}

void kp_free_fasta(KpFasta* r) {
  if (!r) return;
  free(r->stream);
  free(r->offsets);
  free(r->lengths);
  free(r->ids);
  free(r);
}

// 2-bit pack: base codes -> 4 bases/byte (little-endian within byte) plus a
// validity bitmask (8 bases/byte). Invalid bases pack as 0 with mask bit 0.
// out_data must hold (n+3)/4 bytes, out_mask (n+7)/8 bytes.
//
// SWAR inner loop (8 bases per u64; zero-byte detect for validity, two
// multiply-gathers for the bit packing) — the pack sits on the streaming
// pipeline's prep path, so the scalar version's ~0.6 Gbase/s would
// co-bottleneck a >1 Gbase/s device feed.
static void pack_range(const uint8_t* bases, int64_t i0, int64_t i1,
                       uint8_t* out_data, uint8_t* out_mask) {
  // [i0, i1): i0 % 8 == 0 guaranteed by callers.
  int64_t i = i0;
  const uint64_t lo2 = 0x0303030303030303ULL;
  const uint64_t ones = 0x0101010101010101ULL;
  const uint64_t high = 0x8080808080808080ULL;
  for (; i + 8 <= i1; i += 8) {
    uint64_t x;
    memcpy(&x, bases + i, 8);
    const uint64_t t = x & ~lo2;  // zero byte <=> base code < 4 (valid)
    const uint64_t vhigh = (t - ones) & ~t & high;  // 0x80 at valid bytes
    const uint64_t vmask = (vhigh >> 7) * 0xFF;     // 0xFF at valid bytes
    const uint64_t vals = x & lo2 & vmask;          // invalid packs as 0
    // Gather the 2-bit values of each 4-byte half into one byte:
    // sum(v_i << (2i)) from sum(v_i << (8i)) via multiply 0x01041040.
    const uint32_t ylo = static_cast<uint32_t>(vals);
    const uint32_t yhi = static_cast<uint32_t>(vals >> 32);
    out_data[i >> 2] =
        static_cast<uint8_t>((ylo * 0x01041040u) >> 24);
    out_data[(i >> 2) + 1] =
        static_cast<uint8_t>((yhi * 0x01041040u) >> 24);
    // Gather the 8 validity bits (bit 7 of each byte) into one byte.
    out_mask[i >> 3] = static_cast<uint8_t>(
        ((vhigh >> 7) * 0x0102040810204080ULL) >> 56);
  }
  for (; i < i1; i++) {  // tail
    uint8_t b = bases[i];
    if (b < 4) {
      out_data[i >> 2] |= static_cast<uint8_t>(b << ((i & 3) * 2));
      out_mask[i >> 3] |= static_cast<uint8_t>(1u << (i & 7));
    }
  }
}

void kp_pack_2bit(const uint8_t* bases, int64_t n, uint8_t* out_data,
                  uint8_t* out_mask) {
  int64_t nd = (n + 3) / 4;
  int64_t nm = (n + 7) / 8;
  // Zero only the tail bytes the SWAR loop won't fully overwrite.
  int64_t full = (n / 8) * 8;
  if (full < n) {
    memset(out_data + full / 4, 0, nd - full / 4);
    memset(out_mask + full / 8, 0, nm - full / 8);
  }
  const int nt = num_threads(n, 4 << 20);
  if (nt <= 1) {
    pack_range(bases, 0, n, out_data, out_mask);
    return;
  }
  std::vector<std::thread> ths;
  for (int t = 0; t < nt; t++) {
    int64_t a = ((n * t / nt) / 8) * 8;
    int64_t b = (t == nt - 1) ? n : ((n * (t + 1) / nt) / 8) * 8;
    if (a >= b) continue;
    ths.emplace_back(
        [=] { pack_range(bases, a, b, out_data, out_mask); });
  }
  for (auto& th : ths) th.join();
}

// Unpack (inverse of kp_pack_2bit): out must hold n bytes.
void kp_unpack_2bit(const uint8_t* data, const uint8_t* mask, int64_t n,
                    uint8_t* out) {
  for (int64_t i = 0; i < n; i++) {
    bool ok = (mask[i >> 3] >> (i & 7)) & 1;
    out[i] = ok ? ((data[i >> 2] >> ((i & 3) * 2)) & 3) : kInvalid;
  }
}

}  // extern "C"

extern "C" {

// Dense k-mer count over an encoded stream (0xFF = invalid/sentinel),
// rolling 2-bit codes, k <= 15. The native-speed twin of the NumPy oracle
// (models/oracle.py) for validating device results on GB-scale inputs
// without Python-loop costs. Counts windows starting at [0, n_own).
// out must hold 4^k int64 zeros (caller-allocated).
void kp_count_dense(const uint8_t* stream, int64_t n, int64_t n_own, int k,
                    int canonical, int64_t* out) {
  const uint32_t mask = (k == 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1);
  uint32_t code = 0;
  int run = 0;  // consecutive valid bases ending at i
  if (n_own > n - k + 1) n_own = n - k + 1;
  for (int64_t i = 0; i < n; i++) {
    uint8_t b = stream[i];
    if (b < 4) {
      code = ((code << 2) | b) & mask;
      run++;
    } else {
      run = 0;
    }
    int64_t start = i - k + 1;
    if (run >= k && start < n_own) {
      uint32_t c = code;
      if (canonical) {
        uint32_t rc = 0, t = code;
        for (int j = 0; j < k; j++) {
          rc = (rc << 2) | ((t & 3) ^ 3);
          t >>= 2;
        }
        if (rc < c) c = rc;
      }
      out[c]++;
    }
  }
}

// Compact masked RLE output (device sparse tables) into dense arrays.
// starts: bool mask [n]; returns number of set entries written to
// out_hi/out_lo/out_cnt (caller allocates capacity >= popcount(starts);
// call kp_count_starts first to size them).
int64_t kp_count_starts(const uint8_t* starts, int64_t n) {
  int64_t c = 0;
  for (int64_t i = 0; i < n; i++) c += (starts[i] != 0);
  return c;
}

int64_t kp_compact_rle(const uint32_t* hi, const uint32_t* lo,
                       const int32_t* cnt, const uint8_t* starts, int64_t n,
                       uint64_t* out_code, int64_t* out_cnt) {
  int64_t w = 0;
  for (int64_t i = 0; i < n; i++) {
    if (starts[i]) {
      out_code[w] = (static_cast<uint64_t>(hi[i]) << 32) | lo[i];
      out_cnt[w] = cnt[i];
      w++;
    }
  }
  return w;
}

}  // extern "C"

namespace {

// Combined code at index i for the (hi?, lo) sorted word layout.
inline uint64_t word_code(const void* hi, int hi_width, const uint32_t* lo,
                          int64_t i) {
  if (hi_width == 0) return lo[i];
  if (hi_width == 2)
    return (static_cast<uint64_t>(static_cast<const uint16_t*>(hi)[i]) << 32) |
           lo[i];
  return (static_cast<uint64_t>(static_cast<const uint32_t*>(hi)[i]) << 32) |
         lo[i];
}

// First index whose MAJOR sort word equals the all-ones sentinel (the
// invalid-window tail); the words are sorted ascending so binary search.
int64_t sentinel_begin(const void* hi, int hi_width, const uint32_t* lo,
                       int64_t n) {
  int64_t a = 0, b = n;
  auto is_sent = [&](int64_t i) {
    if (hi_width == 0) return lo[i] == 0xFFFFFFFFu;
    if (hi_width == 2) return static_cast<const uint16_t*>(hi)[i] == 0xFFFFu;
    return static_cast<const uint32_t*>(hi)[i] == 0xFFFFFFFFu;
  };
  while (a < b) {
    int64_t m = a + (b - a) / 2;
    if (is_sent(m))
      b = m;
    else
      a = m + 1;
  }
  return a;
}

// ---------------------------------------------------------------------------
// Loser-tree multiway merge over sorted streams of window codes.
//
// The R-way merge behind kp_compact_rows. A binary std::heap costs
// 2*log2(R) branchy swaps through a 100+ KB array per element (measured
// ~3.5 Melem/s/thread at R=8192); the loser tree costs log2(R) compares on
// an L2-resident array, every stream read is sequential, and runs of equal
// codes inside one stream drain in bulk without touching the tree.
// Templated on the hi-word width so code assembly is branch-free.

struct MergeStream {
  int64_t pos;   // current absolute index into the word arrays
  int64_t stop;  // absolute end of this stream's slice
};

template <int HW>
inline uint64_t code_hw(const void* hi, const uint32_t* lo, int64_t i) {
  if (HW == 0) return lo[i];
  if (HW == 2)
    return (static_cast<uint64_t>(static_cast<const uint16_t*>(hi)[i]) << 32) |
           lo[i];
  return (static_cast<uint64_t>(static_cast<const uint32_t*>(hi)[i]) << 32) |
         lo[i];
}

// One loser-tree core over any stream type. A Stream provides:
//   uint64_t head() const    — current key, UINT64_MAX when exhausted
//   int64_t pop(uint64_t c)  — consume the current run of key c, return
//                              its count contribution, advance
// Valid codes are at most 2*31 bits (< 2^62), so UINT64_MAX marks
// exhaustion unambiguously.
template <class Stream>
int64_t loser_tree_core(std::vector<Stream>& ss, uint64_t* oc, int64_t* on) {
  const int S = static_cast<int>(ss.size());
  if (S == 0) return 0;
  int S2 = 1;
  while (S2 < S) S2 <<= 1;
  std::vector<uint64_t> key(S2, UINT64_MAX);
  for (int s = 0; s < S; s++) key[s] = ss[s].head();
  std::vector<int> ls(S2, 0);  // ls[1..S2-1] = losers; ls[0] = winner
  {
    std::vector<int> win(2 * S2);
    for (int i = 0; i < S2; i++) win[S2 + i] = i;
    for (int node = S2 - 1; node >= 1; node--) {
      int a = win[2 * node], b = win[2 * node + 1];
      int w = (key[a] <= key[b]) ? a : b;
      ls[node] = (w == a) ? b : a;
      win[node] = w;
    }
    ls[0] = win[1];
  }
  int64_t w = -1;
  int wtr = ls[0];
  while (key[wtr] != UINT64_MAX) {
    const uint64_t c = key[wtr];
    const int64_t cnt = ss[wtr].pop(c);
    key[wtr] = ss[wtr].head();
    if (w >= 0 && oc[w] == c) {
      on[w] += cnt;
    } else {
      w++;
      oc[w] = c;
      on[w] = cnt;
    }
    // Replay from this leaf to the root. Branchless mask blends: the
    // compare at each level is a ~50/50 coin flip, and the mispredict
    // penalty (~17 cycles/level measured) dominates a branchy replay.
    int winner = wtr;
    uint64_t kwin = key[wtr];
    for (int node = (S2 + wtr) >> 1; node >= 1; node >>= 1) {
      const int l = ls[node];
      const uint64_t kl = key[l];
      const uint64_t msk = (uint64_t)0 - (uint64_t)(kl < kwin);
      ls[node] = (int)(((uint64_t)winner & msk) | ((uint64_t)l & ~msk));
      winner = (int)(((uint64_t)l & msk) | ((uint64_t)winner & ~msk));
      kwin = (kl & msk) | (kwin & ~msk);
    }
    ls[0] = winner;
    wtr = winner;
  }
  return w + 1;
}

// Stream of raw sorted window codes (duplicates adjacent; each counts 1).
template <int HW>
struct WindowStream {
  const void* hi;
  const uint32_t* lo;
  int64_t pos, stop;
  inline uint64_t head() const {
    return pos < stop ? code_hw<HW>(hi, lo, pos) : UINT64_MAX;
  }
  inline int64_t pop(uint64_t c) {
    int64_t cnt = 0;
    do {  // drain this stream's run of equal codes without tree replays
      cnt++;
      pos++;
    } while (pos < stop && code_hw<HW>(hi, lo, pos) == c);
    if (pos + 16 < stop) __builtin_prefetch(lo + pos + 16);
    return cnt;
  }
};

// Stream of pre-aggregated (code, count) runs (codes unique within one).
struct RunStream {
  const uint64_t* c;
  const int64_t* n;
  int64_t pos, stop;
  inline uint64_t head() const { return pos < stop ? c[pos] : UINT64_MAX; }
  inline int64_t pop(uint64_t) {
    const int64_t cnt = n[pos];
    pos++;
    if (pos + 8 < stop) __builtin_prefetch(c + pos + 8);
    return cnt;
  }
};

// Merge ss (sorted window-code slices) writing sorted-unique (code, count).
template <int HW>
int64_t loser_tree_merge(std::vector<MergeStream>& ss, const void* hi,
                         const uint32_t* lo, uint64_t* oc, int64_t* on) {
  if (ss.size() == 1) {
    // Single stream: plain RLE walk.
    int64_t w = -1;
    for (int64_t i = ss[0].pos; i < ss[0].stop; i++) {
      uint64_t c = code_hw<HW>(hi, lo, i);
      if (w >= 0 && oc[w] == c)
        on[w]++;
      else {
        w++;
        oc[w] = c;
        on[w] = 1;
      }
    }
    return w + 1;
  }
  std::vector<WindowStream<HW>> ws;
  ws.reserve(ss.size());
  for (auto& st : ss) ws.push_back({hi, lo, st.pos, st.stop});
  return loser_tree_core(ws, oc, on);
}

// Hierarchical (two-stage) merge for high fan-in: bundles of <= kGroup
// streams merge through L1-resident trees into scratch (code, count) runs,
// then one tree over the runs. One extra memory pass buys shallow trees
// at both stages — ~2x the flat tree past a few hundred streams.
constexpr int kGroup = 128;
constexpr int kTwoStageMin = 384;

template <int HW>
int64_t merge_two_stage(std::vector<MergeStream>& ss, const void* hi,
                        const uint32_t* lo, uint64_t* oc, int64_t* on) {
  const int64_t S = static_cast<int64_t>(ss.size());
  int64_t in_total = 0;
  for (auto& st : ss) in_total += st.stop - st.pos;
  std::vector<uint64_t> sc_c(in_total);
  std::vector<int64_t> sc_n(in_total);
  std::vector<RunStream> runs;
  runs.reserve((S + kGroup - 1) / kGroup);
  int64_t off = 0;
  for (int64_t g = 0; g < S; g += kGroup) {
    int64_t ge = std::min<int64_t>(g + kGroup, S);
    std::vector<MergeStream> bundle(ss.begin() + g, ss.begin() + ge);
    int64_t cap = 0;
    for (auto& st : bundle) cap += st.stop - st.pos;
    int64_t len =
        loser_tree_merge<HW>(bundle, hi, lo, sc_c.data() + off, sc_n.data() + off);
    runs.push_back({sc_c.data() + off, sc_n.data() + off, 0, len});
    off += cap;
  }
  return loser_tree_core(runs, oc, on);
}

}  // namespace

extern "C" {

// Compact sorted window codes + run-start flags into a (code, count) table.
// Run lengths are implied by consecutive start indices (the device never
// computes them): count(j) = idx(j+1) - idx(j), last run closed by the
// sentinel tail. hi may be NULL (hi_width 0: code = lo; k <= 15), uint16
// (hi_width 2) or uint32 (hi_width 4). Multithreaded two-pass
// (count-prefix-fill). Returns entries written.
int64_t kp_compact_starts(const void* hi, int hi_width, const uint32_t* lo,
                          const uint8_t* starts, int64_t n,
                          uint64_t* out_code, int64_t* out_cnt) {
  const int64_t end = sentinel_begin(hi, hi_width, lo, n);
  if (end == 0) return 0;
  const int nt = num_threads(end, 1 << 20);
  std::vector<int64_t> range_begin(nt + 1);
  for (int t = 0; t <= nt; t++) range_begin[t] = end * t / nt;
  std::vector<int64_t> nstarts(nt, 0);

  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++)
      ths.emplace_back([&, t] {
        int64_t c = 0;
        for (int64_t i = range_begin[t]; i < range_begin[t + 1]; i++)
          c += (starts[i] != 0);
        nstarts[t] = c;
      });
    for (auto& th : ths) th.join();
  }
  std::vector<int64_t> out_off(nt + 1, 0);
  for (int t = 0; t < nt; t++) out_off[t + 1] = out_off[t] + nstarts[t];

  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++)
      ths.emplace_back([&, t] {
        int64_t w = out_off[t];
        int64_t prev = -1;  // index of the last start seen in this range
        for (int64_t i = range_begin[t]; i < range_begin[t + 1]; i++) {
          if (!starts[i]) continue;
          if (prev >= 0) out_cnt[w - 1] = i - prev;
          out_code[w] = word_code(hi, hi_width, lo, i);
          prev = i;
          w++;
        }
        if (prev >= 0) {
          // Close the range's last run: next start at/after the range end
          // (runs can span range boundaries), else the sentinel tail.
          int64_t nxt = range_begin[t + 1];
          while (nxt < end && !starts[nxt]) nxt++;
          out_cnt[w - 1] = nxt - prev;
        }
      });
    for (auto& th : ths) th.join();
  }
  return out_off[nt];
}

// Number of distinct codes before the sentinel tail (sizes the output of
// kp_compact_sorted).
int64_t kp_count_distinct(const void* hi, int hi_width, const uint32_t* lo,
                          int64_t n) {
  const int64_t end = sentinel_begin(hi, hi_width, lo, n);
  if (end == 0) return 0;
  const int nt = num_threads(end, 1 << 20);
  std::vector<int64_t> counts(nt, 0);
  std::vector<std::thread> ths;
  for (int t = 0; t < nt; t++)
    ths.emplace_back([&, t] {
      int64_t a = end * t / nt, b = end * (t + 1) / nt;
      int64_t c = 0;
      for (int64_t i = a; i < b; i++)
        c += (i == 0 || word_code(hi, hi_width, lo, i) !=
                            word_code(hi, hi_width, lo, i - 1));
      counts[t] = c;
    });
  for (auto& th : ths) th.join();
  int64_t total = 0;
  for (int64_t c : counts) total += c;
  return total;
}

// Compact sorted window codes into a (code, count) table with NO
// device-side run-start flags: run boundaries are neighbor compares of the
// codes this pass walks anyway (saves a device pass and 1 B/window of
// D2H). Same word layout as kp_compact_starts. Multithreaded two-pass.
int64_t kp_compact_sorted(const void* hi, int hi_width, const uint32_t* lo,
                          int64_t n, uint64_t* out_code, int64_t* out_cnt) {
  const int64_t end = sentinel_begin(hi, hi_width, lo, n);
  if (end == 0) return 0;
  const int nt = num_threads(end, 1 << 20);
  std::vector<int64_t> range_begin(nt + 1);
  for (int t = 0; t <= nt; t++) range_begin[t] = end * t / nt;
  std::vector<int64_t> nstarts(nt, 0);

  auto is_start = [&](int64_t i) {
    return i == 0 || word_code(hi, hi_width, lo, i) !=
                         word_code(hi, hi_width, lo, i - 1);
  };

  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++)
      ths.emplace_back([&, t] {
        int64_t c = 0;
        for (int64_t i = range_begin[t]; i < range_begin[t + 1]; i++)
          c += is_start(i);
        nstarts[t] = c;
      });
    for (auto& th : ths) th.join();
  }
  std::vector<int64_t> out_off(nt + 1, 0);
  for (int t = 0; t < nt; t++) out_off[t + 1] = out_off[t] + nstarts[t];

  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++)
      ths.emplace_back([&, t] {
        int64_t w = out_off[t];
        int64_t prev = -1;
        for (int64_t i = range_begin[t]; i < range_begin[t + 1]; i++) {
          if (!is_start(i)) continue;
          if (prev >= 0) out_cnt[w - 1] = i - prev;
          out_code[w] = word_code(hi, hi_width, lo, i);
          prev = i;
          w++;
        }
        if (prev >= 0) {
          int64_t nxt = range_begin[t + 1];
          while (nxt < end && !is_start(nxt)) nxt++;
          out_cnt[w - 1] = nxt - prev;
        }
      });
    for (auto& th : ths) th.join();
  }
  return out_off[nt];
}

// Sum of per-row valid prefixes for the [rows, m] row-sorted word layout
// (each row ascending with an all-ones-sentinel tail). Sizes the output of
// kp_compact_rows: distinct codes <= valid windows.
int64_t kp_rows_valid(const void* hi, int hi_width, const uint32_t* lo,
                      int64_t rows, int64_t m) {
  int64_t total = 0;
  for (int64_t r = 0; r < rows; r++) {
    const void* h =
        hi == nullptr
            ? nullptr
            : static_cast<const void*>(static_cast<const uint8_t*>(hi) +
                                       r * m * hi_width);
    total += sentinel_begin(h, hi_width, lo + r * m, m);
  }
  return total;
}

// Merge-compact R independently sorted rows of window codes into ONE
// sorted-unique (code, count) table in a single pass.
//
// This is the host half of the row-sorted sparse path: the device sorts
// [R, m] rows independently (XLA sort cost scales ~log^2(row length), so R
// rows are ~3x cheaper than one flat sort at R=4096/N=16M — see
// scripts/rowsort_probe.py), and this function does the R-way merge the
// device skipped. Multithreaded by sampled code-range partition; each
// partition runs a binary-heap multiway merge over its row slices,
// accumulating duplicate codes at the output cursor (rows carry raw
// windows, so each element contributes count 1).
//
// Layout matches the device output: row r = lo[r*m .. r*m+m), optional hi
// words parallel (hi_width 0 / 2 / 4), each row ascending with the
// all-ones sentinel marking its invalid tail. out arrays must hold
// kp_rows_valid(...) entries. Returns entries written.
int64_t kp_compact_rows(const void* hi, int hi_width, const uint32_t* lo,
                        int64_t rows, int64_t m, uint64_t* out_code,
                        int64_t* out_cnt) {
  // Per-row valid ends (absolute indices into the flat arrays).
  std::vector<int64_t> row_beg(rows), row_end(rows);
  int64_t total = 0;
  for (int64_t r = 0; r < rows; r++) {
    const void* h =
        hi == nullptr
            ? nullptr
            : static_cast<const void*>(static_cast<const uint8_t*>(hi) +
                                       r * m * hi_width);
    row_beg[r] = r * m;
    row_end[r] = r * m + sentinel_begin(h, hi_width, lo + r * m, m);
    total += row_end[r] - row_beg[r];
  }
  if (total == 0) return 0;
  const int nt = num_threads(total, 1 << 20);

  auto code_at = [&](int64_t i) { return word_code(hi, hi_width, lo, i); };

  // Sampled pivots across rows (rows are sorted, striding samples the
  // distribution; robust to skew).
  std::vector<uint64_t> samples;
  samples.reserve(static_cast<size_t>(rows) * 8 + 8);
  for (int64_t r = 0; r < rows; r++) {
    int64_t n = row_end[r] - row_beg[r];
    int64_t step = std::max<int64_t>(1, n / 8);
    for (int64_t j = 0; j < n; j += step) samples.push_back(code_at(row_beg[r] + j));
  }
  std::sort(samples.begin(), samples.end());
  std::vector<uint64_t> pivot(nt + 1);
  pivot[0] = 0;
  pivot[nt] = UINT64_MAX;
  for (int t = 1; t < nt; t++) pivot[t] = samples[samples.size() * t / nt];

  // Per (partition, row) slice starts via binary search on the code.
  std::vector<std::vector<int64_t>> cut(nt + 1, std::vector<int64_t>(rows));
  for (int64_t r = 0; r < rows; r++) {
    cut[0][r] = row_beg[r];
    cut[nt][r] = row_end[r];
    for (int t = 1; t < nt; t++) {
      int64_t a = row_beg[r], b = row_end[r];
      while (a < b) {
        int64_t mid = a + (b - a) / 2;
        if (code_at(mid) < pivot[t])
          a = mid + 1;
        else
          b = mid;
      }
      cut[t][r] = a;
    }
  }
  std::vector<int64_t> part_cap(nt + 1, 0);
  for (int t = 0; t < nt; t++) {
    int64_t c = 0;
    for (int64_t r = 0; r < rows; r++) c += cut[t + 1][r] - cut[t][r];
    part_cap[t + 1] = part_cap[t] + c;
  }

  std::vector<int64_t> part_len(nt, 0);
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++)
      ths.emplace_back([&, t] {
        uint64_t* oc = out_code + part_cap[t];
        int64_t* on = out_cnt + part_cap[t];
        std::vector<MergeStream> ss;
        ss.reserve(rows);
        for (int64_t r = 0; r < rows; r++)
          if (cut[t][r] < cut[t + 1][r])
            ss.push_back({cut[t][r], cut[t + 1][r]});
        const bool two_stage = ss.size() >= kTwoStageMin;
        if (hi_width == 0)
          part_len[t] = two_stage ? merge_two_stage<0>(ss, hi, lo, oc, on)
                                  : loser_tree_merge<0>(ss, hi, lo, oc, on);
        else if (hi_width == 2)
          part_len[t] = two_stage ? merge_two_stage<2>(ss, hi, lo, oc, on)
                                  : loser_tree_merge<2>(ss, hi, lo, oc, on);
        else
          part_len[t] = two_stage ? merge_two_stage<4>(ss, hi, lo, oc, on)
                                  : loser_tree_merge<4>(ss, hi, lo, oc, on);
      });
    for (auto& th : ths) th.join();
  }

  int64_t w = part_len.empty() ? 0 : part_len[0];
  for (int t = 1; t < nt; t++) {
    if (part_cap[t] != w) {
      memmove(out_code + w, out_code + part_cap[t],
              part_len[t] * sizeof(uint64_t));
      memmove(out_cnt + w, out_cnt + part_cap[t],
              part_len[t] * sizeof(int64_t));
    }
    w += part_len[t];
  }
  return w;
}

// Merge m sorted (codes u64 ascending-unique, counts i64) tables into one,
// summing counts of equal codes. out arrays must hold sum(lens) entries.
// Multithreaded by code-range partition (pivots sampled from the inputs so
// skewed distributions still balance); each partition is an independent
// linear-time heap merge, then partitions are compacted contiguously.
// Returns the merged length.
int64_t kp_merge_tables(int64_t m, const uint64_t* const* codes,
                        const int64_t* const* cnts, const int64_t* lens,
                        uint64_t* out_code, int64_t* out_cnt) {
  int64_t total = 0;
  for (int64_t i = 0; i < m; i++) total += lens[i];
  if (total == 0) return 0;
  const int nt = num_threads(total, 1 << 20);

  // Sample pivots across all tables (tables are sorted, so striding each
  // one samples its distribution).
  std::vector<uint64_t> samples;
  samples.reserve(1024);
  for (int64_t i = 0; i < m; i++) {
    int64_t step = std::max<int64_t>(1, lens[i] / 64);
    for (int64_t j = 0; j < lens[i]; j += step) samples.push_back(codes[i][j]);
  }
  std::sort(samples.begin(), samples.end());
  std::vector<uint64_t> pivot(nt + 1);
  pivot[0] = 0;
  pivot[nt] = UINT64_MAX;
  for (int t = 1; t < nt; t++)
    pivot[t] = samples[samples.size() * t / nt];

  // Per (partition, table) input ranges; partition p takes codes in
  // [pivot[p], pivot[p+1]) — last partition inclusive of UINT64_MAX.
  std::vector<std::vector<int64_t>> lo_idx(nt + 1, std::vector<int64_t>(m));
  for (int64_t i = 0; i < m; i++) {
    lo_idx[0][i] = 0;
    lo_idx[nt][i] = lens[i];
    for (int t = 1; t < nt; t++)
      lo_idx[t][i] = std::lower_bound(codes[i], codes[i] + lens[i], pivot[t]) -
                     codes[i];
  }
  std::vector<int64_t> part_cap(nt + 1, 0);  // input sizes = output caps
  for (int t = 0; t < nt; t++) {
    int64_t c = 0;
    for (int64_t i = 0; i < m; i++) c += lo_idx[t + 1][i] - lo_idx[t][i];
    part_cap[t + 1] = part_cap[t] + c;
  }

  std::vector<int64_t> part_len(nt, 0);
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++)
      ths.emplace_back([&, t] {
        uint64_t* oc = out_code + part_cap[t];
        int64_t* on = out_cnt + part_cap[t];
        // Tables with a non-empty slice of this partition.
        std::vector<int64_t> act;
        for (int64_t i = 0; i < m; i++)
          if (lo_idx[t][i] < lo_idx[t + 1][i]) act.push_back(i);

        if (act.empty()) {
          part_len[t] = 0;
          return;
        }
        if (act.size() == 1) {
          // Inputs are sorted-unique already: straight copy.
          int64_t i = act[0], a = lo_idx[t][i], n = lo_idx[t + 1][i] - a;
          memcpy(oc, codes[i] + a, n * sizeof(uint64_t));
          memcpy(on, cnts[i] + a, n * sizeof(int64_t));
          part_len[t] = n;
          return;
        }
        if (act.size() == 2) {
          // The dominant shape (the MergeLadder merges pairs): a tight
          // two-pointer merge, ~10x the heap loop's throughput.
          int64_t i0 = act[0], i1 = act[1];
          const uint64_t* c0 = codes[i0];
          const uint64_t* c1 = codes[i1];
          const int64_t* n0 = cnts[i0];
          const int64_t* n1 = cnts[i1];
          int64_t a = lo_idx[t][i0], ae = lo_idx[t + 1][i0];
          int64_t b = lo_idx[t][i1], be = lo_idx[t + 1][i1];
          int64_t w = 0;
          while (a < ae && b < be) {
            uint64_t ca = c0[a], cb = c1[b];
            if (ca < cb) {
              oc[w] = ca;
              on[w++] = n0[a++];
            } else if (cb < ca) {
              oc[w] = cb;
              on[w++] = n1[b++];
            } else {
              oc[w] = ca;
              on[w++] = n0[a++] + n1[b++];
            }
          }
          if (a < ae) {
            memcpy(oc + w, c0 + a, (ae - a) * sizeof(uint64_t));
            memcpy(on + w, n0 + a, (ae - a) * sizeof(int64_t));
            w += ae - a;
          }
          if (b < be) {
            memcpy(oc + w, c1 + b, (be - b) * sizeof(uint64_t));
            memcpy(on + w, n1 + b, (be - b) * sizeof(int64_t));
            w += be - b;
          }
          part_len[t] = w;
          return;
        }

        // General shape: binary heap of table heads.
        struct Head {
          uint64_t code;
          int64_t tab;
        };
        std::vector<int64_t> pos(m), stop(m);
        std::vector<Head> heap;
        heap.reserve(act.size());
        for (int64_t i : act) {
          pos[i] = lo_idx[t][i];
          stop[i] = lo_idx[t + 1][i];
          heap.push_back({codes[i][pos[i]], i});
        }
        auto cmp = [](const Head& a, const Head& b) { return a.code > b.code; };
        std::make_heap(heap.begin(), heap.end(), cmp);
        int64_t w = -1;
        while (!heap.empty()) {
          std::pop_heap(heap.begin(), heap.end(), cmp);
          Head h = heap.back();
          heap.pop_back();
          if (w >= 0 && oc[w] == h.code) {
            on[w] += cnts[h.tab][pos[h.tab]];
          } else {
            w++;
            oc[w] = h.code;
            on[w] = cnts[h.tab][pos[h.tab]];
          }
          if (++pos[h.tab] < stop[h.tab]) {
            heap.push_back({codes[h.tab][pos[h.tab]], h.tab});
            std::push_heap(heap.begin(), heap.end(), cmp);
          }
        }
        part_len[t] = w + 1;
      });
    for (auto& th : ths) th.join();
  }

  // Compact partitions to be contiguous (they were written at conservative
  // input-size offsets; merged lengths can only be smaller).
  int64_t w = part_len.empty() ? 0 : part_len[0];
  for (int t = 1; t < nt; t++) {
    if (part_cap[t] != w) {
      memmove(out_code + w, out_code + part_cap[t],
              part_len[t] * sizeof(uint64_t));
      memmove(out_cnt + w, out_cnt + part_cap[t],
              part_len[t] * sizeof(int64_t));
    }
    w += part_len[t];
  }
  return w;
}

}  // extern "C"
