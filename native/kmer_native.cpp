// Native host-side kernels for the TPU k-mer analysis framework.
//
// The reference implements its host hot loops in C++/SIMD: the per-base read
// packing (src/packed_reads.cpp:90-126), the SSE2 mismatch counter
// (src/merge_reads.cpp:195-248) and the overlap merge scan
// (src/merge_reads.cpp:477-652).  These are their TPU-host equivalents,
// exposed through a plain C ABI consumed via ctypes (no pybind11 in the
// image).  The Python implementations in io/ remain as the reference
// semantics and the fallback when this library is not built.
//
// Build: g++ -O3 -shared -fPIC -o libkmer_native.so kmer_native.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

// phred error probabilities, identical values to src/merge_reads.cpp:74-82
const double Q2PERROR[] = {
    1.0,       0.7943,    0.6309,    0.5012,    0.3981,    0.3162,    0.2512,
    0.1995,    0.1585,    0.1259,    0.1,       0.07943,   0.06310,   0.05012,
    0.03981,   0.03162,   0.02512,   0.01995,   0.01585,   0.01259,   0.01,
    0.007943,  0.006310,  0.005012,  0.003981,  0.003162,  0.002512,  0.001995,
    0.001585,  0.001259,  0.001,     0.0007943, 0.0006310, 0.0005012, 0.0003981,
    0.0003162, 0.0002512, 0.0001995, 0.0001585, 0.0001259, 0.0001,    7.943e-05,
    6.310e-05, 5.012e-05, 3.981e-05, 3.162e-05, 2.512e-05, 1.995e-05, 1.585e-05,
    1.259e-05, 1e-05,     7.943e-06, 6.310e-06, 5.012e-06, 3.981e-06, 3.162e-06,
    2.512e-06, 1.995e-06, 1.585e-06, 1.259e-06, 1e-06,     7.943e-07, 6.310e-07,
    5.012e-07, 3.981e-07, 3.1622e-07, 2.512e-07, 1.995e-07, 1.585e-07, 1.259e-07,
    1e-07,     7.943e-08, 6.310e-08, 5.012e-08, 3.981e-08, 3.1622e-08, 2.512e-08,
    1.995e-08, 1.585e-08, 1.259e-08, 1e-08,
};
const int Q2P_SIZE = sizeof(Q2PERROR) / sizeof(*Q2PERROR);

// base -> code LUT: ACGT=0..3, N/IUPAC=4, invalid=255
// (mirrors PackedRead's switch, src/packed_reads.cpp:99-123)
struct CodeLut {
  uint8_t t[256];
  CodeLut() {
    memset(t, 255, sizeof(t));
    const char* bases = "ACGT";
    for (int i = 0; i < 4; i++) {
      t[(uint8_t)bases[i]] = i;
      t[(uint8_t)(bases[i] + 32)] = i;
    }
    const char* iupac = "NURYKMSWBDHV";
    for (const char* p = iupac; *p; p++) {
      t[(uint8_t)*p] = 4;
      t[(uint8_t)(*p + 32)] = 4;
    }
  }
};
const CodeLut CODE_LUT;

}  // namespace

extern "C" {

// 64-bit-chunked byte mismatch counter with early exit — the
// fast_count_mismatches equivalent (src/merge_reads.cpp:195-248).
int32_t knat_count_mismatches(const char* a, const char* b, int32_t len, int32_t maxm) {
  int32_t mism = 0;
  int32_t i = 0;
  for (; i + 8 <= len; i += 8) {
    uint64_t x, y;
    memcpy(&x, a + i, 8);
    memcpy(&y, b + i, 8);
    if (x != y) {
      for (int j = 0; j < 8; j++) mism += (a[i + j] != b[i + j]);
      if (mism > maxm) return mism;
    }
  }
  for (; i < len; i++) mism += (a[i] != b[i]);
  return mism;
}

// Batch read encoding: concatenated sequence/quality bytes with per-read
// offsets -> [n_reads, max_len] code + bad-quality planes.
// Returns the index of the first read containing an illegal character, or -1.
int32_t knat_encode_reads(const uint8_t* seq_bytes, const uint8_t* qual_bytes,
                          const int64_t* offsets, int32_t n_reads, int32_t max_len,
                          int32_t qual_thresh, uint8_t* codes, uint8_t* badq,
                          int32_t* lengths) {
  for (int32_t r = 0; r < n_reads; r++) {
    int64_t lo = offsets[r], hi = offsets[r + 1];
    int32_t len = (int32_t)std::min<int64_t>(hi - lo, max_len);
    lengths[r] = len;
    uint8_t* crow = codes + (int64_t)r * max_len;
    uint8_t* brow = badq + (int64_t)r * max_len;
    for (int32_t i = 0; i < len; i++) {
      uint8_t c = CODE_LUT.t[seq_bytes[lo + i]];
      if (c == 255) return r;
      crow[i] = c;
      brow[i] = qual_bytes[lo + i] < (uint8_t)qual_thresh;
    }
    for (int32_t i = len; i < max_len; i++) {
      crow[i] = 4;
      brow[i] = 0;
    }
  }
  return -1;
}

// Overlap merge scan for N-free pairs — semantics of the reference loop at
// src/merge_reads.cpp:477-585 restricted to sequences without N (the Python
// side falls back to its exact scalar path when N is present).
// Returns best_i >= 0 on an unambiguous accepted overlap, -1 for none,
// -2 for ambiguous (caller increments its ambiguity counter).
int32_t knat_merge_scan(const char* seq1, const uint8_t* q1, int32_t len1,
                        const char* rc2, const uint8_t* rq2, int32_t len2,
                        int32_t qual_offset) {
  const int32_t MIN_OVERLAP = 12, EXTRA_TEST_OVERLAP = 2, MAX_MISMATCHES = 3;
  const int32_t EXTRA_MM_PER_1000 = 150;
  const double MAX_PERROR = 0.025;
  int32_t len = std::min(len1, len2);
  int32_t start_i = (len == len1) ? 0 : len1 - len;
  const char* a0 = seq1 + start_i;
  const uint8_t* qa0 = q1 + start_i;

  int32_t best_i = -1, found_i = -1;
  for (int32_t i = 0; i < len - MIN_OVERLAP + EXTRA_TEST_OVERLAP; i++) {
    int32_t overlap = len - i;
    int32_t this_max_mm = MAX_MISMATCHES + (EXTRA_MM_PER_1000 * overlap) / 1000;
    int32_t error_max_mm = this_max_mm * 4 / 3 + 1;
    int32_t mism = knat_count_mismatches(a0 + i, rc2, overlap, error_max_mm);
    if (mism > error_max_mm) continue;
    int32_t matches = overlap - mism;
    double perror = 0.0;
    for (int32_t j = 0; j < overlap; j++) {
      if (a0[i + j] != rc2[j]) {
        int32_t d = (int32_t)qa0[i + j] - (int32_t)rq2[j];
        if (d < 0) d = -d;
        perror += (d <= 2) ? 0.5 : Q2PERROR[d < Q2P_SIZE ? d : Q2P_SIZE - 1];
      }
    }
    int32_t match_thres = overlap - this_max_mm;
    if (match_thres < MIN_OVERLAP) match_thres = MIN_OVERLAP;
    if (matches >= match_thres && mism <= this_max_mm && perror / overlap <= MAX_PERROR) {
      if (best_i < 0 && found_i < 0) {
        best_i = i;
      } else {
        return -2;  // ambiguous
      }
    } else if (mism <= error_max_mm && perror / overlap <= MAX_PERROR * 4 / 3) {
      found_i = i;
      if (best_i >= 0) return -2;
    }
  }
  return best_i;
}

// Reverse complement with IUPAC->N (semantics of revcomp, src/utils.cpp:98-129).
// Returns 0, or 1 if an illegal character was seen.
namespace {
struct CompLut {
  char comp[256];
  CompLut() {
    memset(comp, 0, sizeof(comp));
    const char* from = "ACGTacgtNnURYKMSWBDHVurykmswbdhv";
    const char* to = "TGCATGCANNNNNNNNNNNNNNNNNNNNNNNN";
    for (int i = 0; from[i]; i++) comp[(uint8_t)from[i]] = to[i];
  }
};
}  // namespace

int32_t knat_revcomp(const char* seq, int32_t len, char* out) {
  // magic-static init: thread-safe under the OpenMP merge chunk loop
  static const CompLut lut;
  const char* comp = lut.comp;
  for (int32_t i = 0; i < len; i++) {
    char c = comp[(uint8_t)seq[len - 1 - i]];
    if (!c) return 1;
    out[i] = c;
  }
  return 0;
}

// Overlap-merge finishing: base picking + quality boost/discount
// (src/merge_reads.cpp:587-648).  Writes the merged read into out_seq/out_quals
// (caller-sized to start_i + len1... full merged length) and returns its length.
int32_t knat_finish_merge(const char* seq1, const char* q1, int32_t len1,
                          const char* rc2, const char* rq2, int32_t len2,
                          int32_t best_i, int32_t start_i, int32_t qual_offset,
                          char* out_seq, char* out_quals) {
  int32_t len = len1 < len2 ? len1 : len2;
  int32_t overlap = len - best_i;
  int32_t max_match_qual = 41 + qual_offset;
  memcpy(out_seq, seq1, len1);
  memcpy(out_quals, q1, len1);
  for (int32_t j = 0; j < overlap; j++) {
    int32_t p = start_i + best_i + j;
    if (out_seq[p] == rc2[j]) {
      int32_t nq = (int32_t)(uint8_t)out_quals[p] + (uint8_t)rq2[j] - qual_offset;
      out_quals[p] = (char)(nq > max_match_qual ? max_match_qual : nq);
    } else {
      int32_t nq;
      if ((uint8_t)out_quals[p] < (uint8_t)rq2[j]) {
        nq = (uint8_t)rq2[j] - (uint8_t)out_quals[p] + qual_offset;
        out_seq[p] = rc2[j];
      } else {
        nq = (uint8_t)out_quals[p] - (uint8_t)rq2[j] + qual_offset;
      }
      out_quals[p] = (char)(nq > 2 + qual_offset ? nq : 2 + qual_offset);
    }
  }
  int32_t head = start_i + best_i + overlap;  // == len1
  int32_t tail = len2 - overlap;
  memcpy(out_seq + head, rc2 + overlap, tail);
  memcpy(out_quals + head, rq2 + overlap, tail);
  return head + tail;
}

// Whole-pair merge in one call: revcomp mate 2, quality-validate, scan, and
// finish.  Returns merged length > 0, 0 = no merge, -2 = ambiguous,
// -3 = invalid quality (caller raises), -4 = N present (caller runs the exact
// scalar path which mutates qualities mid-scan, merge_reads.cpp:516-530).
int32_t knat_merge_pair(const char* seq1, const char* q1, int32_t len1,
                        const char* seq2, const char* q2, int32_t len2,
                        int32_t qual_offset, char* out_seq, char* out_quals) {
  if (len1 > 65535 || len2 > 65535) return -4;
  static thread_local char rc2_buf[65536], rq2_buf[65536];
  // Any non-ACGT (N or other IUPAC codes — revcomp maps those to N too)
  // takes the exact scalar path; screening only 'N' would let revcomp'd
  // IUPAC-born Ns slip through the N-free scan.
  auto is_acgt = [](char c) {
    return c == 'A' || c == 'C' || c == 'G' || c == 'T' ||
           c == 'a' || c == 'c' || c == 'g' || c == 't';
  };
  for (int32_t i = 0; i < len1; i++)
    if (!is_acgt(seq1[i])) return -4;
  for (int32_t i = 0; i < len2; i++)
    if (!is_acgt(seq2[i])) return -4;
  if (knat_revcomp(seq2, len2, rc2_buf)) return -4;
  for (int32_t i = 0; i < len2; i++) rq2_buf[i] = q2[len2 - 1 - i];
  for (int32_t i = 0; i < len1; i++) {
    int32_t qv = (uint8_t)q1[i] - qual_offset;
    if (qv < 0 || qv >= Q2P_SIZE) return -3;
  }
  for (int32_t i = 0; i < len2; i++) {
    int32_t qv = (uint8_t)rq2_buf[i] - qual_offset;
    if (qv < 0 || qv >= Q2P_SIZE) return -3;
  }
  int32_t best_i = knat_merge_scan(seq1, (const uint8_t*)q1, len1, rc2_buf,
                                   (const uint8_t*)rq2_buf, len2, qual_offset);
  // knat_merge_scan takes qualities relative to 0; ours carry the offset —
  // only DIFFERENCES are consumed there, so the offset cancels.
  if (best_i == -2) return -2;
  if (best_i < 0) return 0;
  int32_t len = len1 < len2 ? len1 : len2;
  int32_t start_i = (len == len1) ? 0 : len1 - len;
  return knat_finish_merge(seq1, q1, len1, rc2_buf, rq2_buf, len2, best_i,
                           start_i, qual_offset, out_seq, out_quals);
}

// Whole-CHUNK merge: one library call for n_pairs pairs (amortizes the
// ctypes boundary; the ingest hot loop, src/merge_reads.cpp:250-771 runs
// per-rank over its block).  Inputs are concatenated strings with int64
// offset arrays (off[i]..off[i+1]).  Per pair: statuses[i] = merged length
// (>0), 0 no merge, -2 ambiguous, -3 invalid quality, -4 needs the exact
// scalar path.  Merged output for pair i is written at out_seq+oout[i]
// (caller sizes oout so len1+len2 fits).
void knat_merge_chunk(const char* seqs1, const char* quals1, const int64_t* off1,
                      const char* seqs2, const char* quals2, const int64_t* off2,
                      int32_t n_pairs, int32_t qual_offset,
                      char* out_seq, char* out_quals, const int64_t* oout,
                      int32_t* statuses) {
  // Pairs are independent (disjoint oout output ranges, thread_local scratch
  // in knat_merge_pair, magic-static LUTs) — parallelize across host cores
  // when built with -fopenmp (the reference runs this loop rank-parallel,
  // src/merge_reads.cpp:250-771; here one process owns all local cores).
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 256)
#endif
  for (int32_t i = 0; i < n_pairs; i++) {
    int32_t len1 = (int32_t)(off1[i + 1] - off1[i]);
    int32_t len2 = (int32_t)(off2[i + 1] - off2[i]);
    statuses[i] = knat_merge_pair(seqs1 + off1[i], quals1 + off1[i], len1,
                                  seqs2 + off2[i], quals2 + off2[i], len2,
                                  qual_offset, out_seq + oout[i],
                                  out_quals + oout[i]);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Adapter trimming (native fast path for io/adapters.py).
//
// The reference trims with a 17-mer adapter index + striped Smith-Waterman
// (src/adapters.cpp:48-258, src/ssw/).  io/adapters.py is the semantics
// spec; this is a behavior-exact transcription of its SSW-path trim loop
// (index hit -> affine-gap Gotoh DP -> best-identity candidate), built for
// the full 537-adapter DB where Python DP (~8 ms/candidate) and big-dict
// string lookups dominate ingest.

#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct AdapterIndex {
  int32_t k = 17;
  int32_t match = 1, mismatch = 1, gap_open = 1, gap_ext = 1;
  std::vector<std::string> seqs;  // fwd + revcomp interleaved, like Python
  // hot index: pure-ACGT keys packed 2 bits/base into a u64, open-addressing
  // flat table (one cache line per probe; an unordered_map<string,...> of
  // the full 537-adapter DB costs ~0.5 us per LOOKUP in pointer chases).
  // Values live in one flat pairs array addressed by (offset, len).
  std::vector<uint64_t> flat_keys;   // EMPTY = ~0ull
  std::vector<int32_t> flat_off, flat_len;
  std::vector<std::pair<int32_t, int32_t>> pairs;
  uint64_t mask = 0;  // table size - 1 (pow2)
  // cold fallback: keys containing IUPAC letters (e.g. Y) stay string-keyed;
  // probed only when the read kmer itself has a non-ACGT char (rare)
  std::unordered_map<std::string, std::vector<std::pair<int32_t, int32_t>>> cold;
};

const uint64_t FLAT_EMPTY = ~0ull;

inline uint64_t mix64(uint64_t x) {  // splitmix64 finalizer
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

// base -> 2-bit code for the index key space; -1 for non-ACGT
inline int code_acgt(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
  }
  return -1;
}

// io/adapters.py revcomp: _COMP maps ACGT; everything else (incl. IUPAC) -> N
std::string py_revcomp(const std::string& s) {
  std::string out(s.rbegin(), s.rend());
  for (auto& c : out) {
    switch (c) {
      case 'A': c = 'T'; break;
      case 'C': c = 'G'; break;
      case 'G': c = 'C'; break;
      case 'T': c = 'A'; break;
      default: c = 'N';
    }
  }
  return out;
}

// exact transcription of io/adapters.py:_smith_waterman (affine Gotoh with
// alignment-start tracking; same iteration order and tie-breaks)
void sw_align(const char* ref, int32_t n, const char* query, int32_t m,
              int32_t match, int32_t mismatch, int32_t gap_open,
              int32_t gap_ext, int32_t* best_score_out, int32_t* best_begin_out) {
  const int32_t NEG = -1000000;
  thread_local std::vector<int32_t> bufH, bufE, bufHs, bufEs, bufpH, bufpE,
      bufpHs, bufpEs;
  bufH.assign(n + 1, 0);
  bufE.assign(n + 1, NEG);
  bufHs.resize(n + 1);
  for (int32_t i = 0; i <= n; i++) bufHs[i] = i - 1;
  bufEs.assign(n + 1, 0);
  int32_t best_score = 0, best_begin = 0;
  for (int32_t j = 1; j <= m; j++) {
    char qc = query[j - 1];
    bufpH.swap(bufH);
    bufpHs.swap(bufHs);
    bufpE.swap(bufE);
    bufpEs.swap(bufEs);
    bufH.assign(n + 1, 0);
    bufHs.assign(n + 1, -1);
    bufE.assign(n + 1, NEG);
    bufEs.assign(n + 1, 0);
    int32_t f_run = NEG, f_start = 0;
    for (int32_t i = 1; i <= n; i++) {
      int32_t eo = bufpH[i] - gap_open, ee = bufpE[i] - gap_ext;
      bufE[i] = eo >= ee ? eo : ee;
      bufEs[i] = eo >= ee ? bufpHs[i] : bufpEs[i];
      int32_t fo = bufH[i - 1] - gap_open, fe = f_run - gap_ext;
      f_start = fo >= fe ? bufHs[i - 1] : f_start;
      f_run = fo >= fe ? fo : fe;
      int32_t h = bufpH[i - 1] + (ref[i - 1] == qc ? match : -mismatch);
      int32_t s = bufpHs[i - 1];
      if (bufE[i] > h) { h = bufE[i]; s = bufEs[i]; }
      if (f_run > h) { h = f_run; s = f_start; }
      if (h <= 0) { h = 0; s = i - 1; }
      bufH[i] = h;
      bufHs[i] = s;
      if (h > best_score) { best_score = h; best_begin = s + 1; }
    }
  }
  *best_score_out = best_score;
  *best_begin_out = best_begin;
}

}  // namespace

extern "C" {

// Build the adapter index: seqs_concat/offsets hold the (already uppercased,
// >= k long) adapter sequences from load_adapter_fasta; each is indexed
// forward AND revcomp'd, kmers with N -> G (src/adapters.cpp:110-132 via
// io/adapters.py:_build_index).  Returns an opaque handle.
void* knat_adapters_build(const char* seqs_concat, const int64_t* offsets,
                          int32_t n_seqs, int32_t k, int32_t match,
                          int32_t mismatch, int32_t gap_open, int32_t gap_ext) {
  auto* ai = new AdapterIndex();
  ai->k = k;
  ai->match = match;
  ai->mismatch = mismatch;
  ai->gap_open = gap_open;
  ai->gap_ext = gap_ext;
  std::unordered_map<uint64_t, std::vector<std::pair<int32_t, int32_t>>> hot;
  for (int32_t s = 0; s < n_seqs; s++) {
    const std::string fwd(seqs_concat + offsets[s],
                          (size_t)(offsets[s + 1] - offsets[s]));
    const std::string rc = py_revcomp(fwd);
    const std::string* both[2] = {&fwd, &rc};
    for (const std::string* sp : both) {
      int32_t idx = (int32_t)ai->seqs.size();
      ai->seqs.push_back(*sp);
      std::string kmer;
      for (int32_t j = 0; j + k <= (int32_t)sp->size(); j++) {
        kmer.assign(*sp, j, k);
        uint64_t code = 0;
        bool pure = true;
        for (auto& c : kmer) {
          if (c == 'N') c = 'G';
          int b = code_acgt(c);
          if (b < 0) pure = false;
          code = (code << 2) | (uint64_t)(b & 3);
        }
        if (pure && k <= 31)  // 2k+2 bits must stay clear of FLAT_EMPTY
          hot[code].emplace_back(idx, j);
        else
          ai->cold[kmer].emplace_back(idx, j);
      }
    }
  }
  size_t cap = 64;
  while (cap < hot.size() * 2) cap <<= 1;
  ai->mask = cap - 1;
  ai->flat_keys.assign(cap, FLAT_EMPTY);
  ai->flat_off.assign(cap, 0);
  ai->flat_len.assign(cap, 0);
  for (const auto& [code, vec] : hot) {
    size_t slot = mix64(code) & ai->mask;
    while (ai->flat_keys[slot] != FLAT_EMPTY) slot = (slot + 1) & ai->mask;
    ai->flat_keys[slot] = code;
    ai->flat_off[slot] = (int32_t)ai->pairs.size();
    ai->flat_len[slot] = (int32_t)vec.size();
    ai->pairs.insert(ai->pairs.end(), vec.begin(), vec.end());
  }
  return ai;
}

void knat_adapters_free(void* handle) { delete (AdapterIndex*)handle; }

// Format a kmers-<k>.txt.gz dump chunk: one "KMER count L R\n" line per
// record (dump format contract, src/kcount/kmer_dht.cpp:273-297), straight
// from the 2-bit code plane — the Python per-record join/f-string loop costs
// minutes at the 25M-record scale.  codes is [n, k] row-major with values
// 0..3; counts uint32; left/right single chars.  out must hold at least
// n * (k + 14) bytes; returns bytes written.
int64_t knat_format_dump(const uint8_t* codes, int64_t n, int32_t k,
                         const uint32_t* counts, const char* left,
                         const char* right, char* out) {
  static const char BASES[4] = {'A', 'C', 'G', 'T'};
  // per-row byte width: k + ' ' + digits + ' L R\n'
  std::vector<int64_t> offs((size_t)n + 1);
  offs[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    uint32_t c = counts[i];
    int d = c >= 1000000000u ? 10 : c >= 100000000u ? 9 : c >= 10000000u ? 8
            : c >= 1000000u ? 7 : c >= 100000u ? 6 : c >= 10000u ? 5
            : c >= 1000u ? 4 : c >= 100u ? 3 : c >= 10u ? 2 : 1;
    offs[i + 1] = offs[i] + k + d + 6;
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; i++) {
    char* p = out + offs[i];
    const uint8_t* row = codes + i * k;
    for (int32_t j = 0; j < k; j++) *p++ = BASES[row[j] & 3];
    *p++ = ' ';
    char dbuf[12];
    int d = 0;
    uint32_t c = counts[i];
    do {
      dbuf[d++] = (char)('0' + c % 10);
      c /= 10;
    } while (c);
    while (d) *p++ = dbuf[--d];
    *p++ = ' ';
    *p++ = left[i];
    *p++ = ' ';
    *p++ = right[i];
    *p++ = '\n';
  }
  return offs[n];
}

// SSW-path trim scan (io/adapters.py Adapters.trim with use_ssw=True):
// returns the trim position (0 = remove whole read after the <12 rule,
// applied by the caller) when best identity >= 0.5, else -1.
int32_t knat_adapters_trim(void* handle, const char* seq, int32_t len) {
  const AdapterIndex& ai = *(const AdapterIndex*)handle;
  const int32_t kk = ai.k;
  if (ai.seqs.empty() || len < kk) return -1;
  // up = seq.upper().replace("N", "G")  (get_kmers maps N->G)
  thread_local std::string up;
  up.assign(seq, (size_t)len);
  for (auto& c : up) {
    if (c >= 'a' && c <= 'z') c -= 32;
    if (c == 'N') c = 'G';
  }
  // per-position 2-bit codes of `up` (-1 = non-ACGT), computed once
  thread_local std::vector<int8_t> codes;
  codes.resize(len);
  for (int32_t i = 0; i < len; i++) codes[i] = (int8_t)code_acgt(up[i]);
  double best_identity = 0.0;
  int32_t best_trim_pos = len;
  bool found = false;
  thread_local std::vector<uint8_t> tried;
  tried.assign(ai.seqs.size(), 0);
  thread_local std::string kmer;
  for (int32_t i = 0; i + kk <= len && !found; i += 4) {
    const std::pair<int32_t, int32_t>* hits = nullptr;
    int32_t n_hits = 0;
    uint64_t code = 0;
    bool pure = kk <= 31;
    for (int32_t j = 0; j < kk; j++) {
      int8_t b = codes[i + j];
      if (b < 0) pure = false;
      code = (code << 2) | (uint64_t)(b & 3);
    }
    if (pure) {
      size_t slot = mix64(code) & ai.mask;
      while (ai.flat_keys[slot] != FLAT_EMPTY) {
        if (ai.flat_keys[slot] == code) {
          hits = ai.pairs.data() + ai.flat_off[slot];
          n_hits = ai.flat_len[slot];
          break;
        }
        slot = (slot + 1) & ai.mask;
      }
    } else {
      kmer.assign(up, (size_t)i, (size_t)kk);
      auto it = ai.cold.find(kmer);
      if (it != ai.cold.end()) {
        hits = it->second.data();
        n_hits = (int32_t)it->second.size();
      }
    }
    if (!hits) continue;
    for (int32_t h = 0; h < n_hits; h++) {
      const auto& [adapter_index, kmer_offset] = hits[h];
      if (tried[adapter_index]) continue;
      tried[adapter_index] = 1;
      const std::string& adapter_seq = ai.seqs[adapter_index];
      int32_t a_start = kmer_offset - i - 2;
      if (a_start < 0) a_start = 0;
      int32_t a_end = a_start + len + 2;
      if (a_end > (int32_t)adapter_seq.size()) a_end = (int32_t)adapter_seq.size();
      int32_t score, ref_begin;
      sw_align(seq, len, adapter_seq.data() + a_start, a_end - a_start,
               ai.match, ai.mismatch, ai.gap_open, ai.gap_ext,
               &score, &ref_begin);
      int32_t max_match_len = (int32_t)adapter_seq.size();
      if (len - ref_begin < max_match_len) max_match_len = len - ref_begin;
      if (max_match_len > 0) {
        double identity = (double)score / ai.match / max_match_len;
        if (identity >= best_identity) {
          best_identity = identity;
          best_trim_pos = ref_begin;
          if (identity > 0.97) found = true;
        }
      }
      break;  // only the first untried adapter per k-mer hit
    }
  }
  if (best_identity >= 0.5) return best_trim_pos;
  return -1;
}

}  // extern "C"
