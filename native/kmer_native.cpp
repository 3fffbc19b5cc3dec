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
