// ngsld_native — host-side native runtime for ngsld-tpu.
//
// The device path is JAX/XLA/Pallas; this library covers the host-side
// bottlenecks the reference implements in C++ (gzip GL parsing,
// read_data.cpp:13-116, and the printf-based TSV emission,
// ngsLD.cpp:314-351): a gz text/binary genotype-likelihood reader and a
// bulk row formatter. Semantics are identical to ngsld_tpu.strict (itself
// byte-exact against the reference): same tokenizer rules, same libm
// normalization, same "%f" output contract.
//
// Exposed as a plain C ABI for ctypes. Original code, written for this
// project.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

namespace {

constexpr double kNegInfSentinel = -1e15;  // strict._NEG_INF_SENTINEL
constexpr int kNGeno = 3;

void set_err(char* err, long errlen, const char* msg) {
  if (err && errlen > 0) {
    std::snprintf(err, (size_t)errlen, "%s", msg);
  }
}

// log-softmax of a 3-vector in place (post_prob semantics: stable
// max-shift logsum, sequential order; mirrors strict.post_prob3)
inline void post_prob3(double* g) {
  double m = g[0];
  if (g[1] >= m) m = g[1];
  if (g[2] >= m) m = g[2];
  double norm;
  if (m == -INFINITY) {
    norm = -INFINITY;
  } else {
    double s = std::exp(g[0] - m);
    s += std::exp(g[1] - m);
    s += std::exp(g[2] - m);
    norm = std::log(s) + m;
  }
  g[0] -= norm;
  g[1] -= norm;
  g[2] -= norm;
}

inline double log_or_sentinel(double v, bool clamp) {
  // C log(): 0 -> -inf, negative -> NaN. clamp=-inf->-1e15 only on the
  // binary-input path (conv_space semantics).
  double r;
  if (v > 0.0) r = std::log(v);
  else if (v == 0.0) r = -INFINITY;
  else r = NAN;
  if (clamp && r == -INFINITY) r = kNegInfSentinel;
  return r;
}

// strtod token that must consume the whole token (split() drops partial
// parses); returns true and writes *out when fully numeric.
inline bool strtod_full(const char* tok, size_t len, double* out) {
  if (len == 0) return false;
  // tokens are NUL-terminated slices prepared by the caller
  char* end = nullptr;
  double v = std::strtod(tok, &end);
  if (end != tok + len) return false;
  *out = v;
  return true;
}

}  // namespace

extern "C" {

// Read a gz (or plain) TEXT genotype/GL file.
//   in_probs: 3 numeric cols per individual; else 1 genotype col in
//             {-1,0,1,2}
//   in_logscale: probs already log-scaled
// out: n_sites * n_ind * 3 doubles, log-scale normalized.
// Returns 0 on success, nonzero with err filled otherwise.
int ngsld_read_geno_text(const char* path, int in_probs, int in_logscale,
                         int64_t n_ind, int64_t n_sites, double* out,
                         char* err, long errlen) {
  gzFile fh = gzopen(path, "r");
  if (!fh) {
    set_err(err, errlen, "cannot open GENO file!");
    return 1;
  }
  gzbuffer(fh, 1 << 20);

  const int64_t n_geno = in_probs ? kNGeno : 1;
  const int64_t need = n_ind * n_geno;
  const double log_third = std::log(1.0 / kNGeno);

  size_t cap = 1 << 20;
  char* buf = (char*)std::malloc(cap);
  double* fields = (double*)std::malloc(sizeof(double) * (need + 4096));
  int64_t fields_cap = need + 4096;

  int64_t s = 0;
  int rc = 0;
  while (s < n_sites) {
    // read one full line (grow buffer on demand)
    size_t len = 0;
    bool got = false;
    while (true) {
      if (len + 2 >= cap) {
        cap *= 2;
        buf = (char*)std::realloc(buf, cap);
      }
      if (gzgets(fh, buf + len, (int)(cap - len)) == nullptr) break;
      got = true;
      len += std::strlen(buf + len);
      if (len > 0 && buf[len - 1] == '\n') break;
    }
    if (!got) {
      set_err(err, errlen,
              "GENO file at premature EOF. Check GENO file and number of sites!");
      rc = 2;
      goto done;
    }
    // chomp: remove ONE trailing \n or \r
    if (len > 0 && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) {
      buf[--len] = '\0';
    }
    if (len == 0) {
      // empty line consumes a site slot, left at the raw -1e15 init
      for (int64_t i = 0; i < n_ind * kNGeno; i++)
        out[(s * n_ind * kNGeno) + i] = kNegInfSentinel;
      s++;
      continue;
    }
    // tokenize on space/tab runs; keep fully-numeric tokens only
    int64_t nf = 0;
    {
      char* p = buf;
      while (*p) {
        while (*p == ' ' || *p == '\t') p++;
        if (!*p) break;
        char* tok = p;
        while (*p && *p != ' ' && *p != '\t') p++;
        size_t tlen = (size_t)(p - tok);
        char saved = *p;
        *p = '\0';
        double v;
        if (strtod_full(tok, tlen, &v)) {
          if (nf >= fields_cap) {
            fields_cap *= 2;
            fields = (double*)std::realloc(fields, sizeof(double) * fields_cap);
          }
          fields[nf++] = v;
        }
        *p = saved;
        if (saved) p++;
      }
    }
    if (nf == 0 || (s == 0 && nf < need)) {
      std::fprintf(stderr, "> Header found! Skipping line...\n");
      continue;
    }
    if (nf < need) {
      set_err(err, errlen, "wrong GENO file format. Less fields than expected!");
      rc = 3;
      goto done;
    }
    {
      const double* ptr = fields + (nf - need);
      for (int64_t i = 0; i < n_ind; i++) {
        double* g = out + (s * n_ind + i) * kNGeno;
        if (in_probs) {
          for (int k = 0; k < kNGeno; k++) {
            double v = ptr[i * kNGeno + k];
            g[k] = in_logscale ? v : log_or_sentinel(v, /*clamp=*/false);
          }
        } else {
          int64_t gc = (int64_t)ptr[i];  // C double->int truncation
          if (gc >= 0) {
            if (gc > 2) {
              set_err(err, errlen,
                      "wrong GENO file format. Genotypes must be coded as {-1,0,1,2} !");
              rc = 4;
              goto done;
            }
            g[0] = g[1] = g[2] = kNegInfSentinel;
            g[gc] = 0.0;  // log(1)
          } else {
            g[0] = g[1] = g[2] = log_third;
          }
        }
        post_prob3(g);
      }
    }
    s++;
  }
  // EOF check
  {
    char c;
    if (gzread(fh, &c, 1) == 1) {
      set_err(err, errlen,
              "GENO file not at EOF. Check GENO file and number of sites!");
      rc = 5;
    }
  }
done:
  std::free(buf);
  std::free(fields);
  gzclose(fh);
  return rc;
}

// Binary doubles reader (site-major triplets); always in_probs.
int ngsld_read_geno_bin(const char* path, int in_logscale, int64_t n_ind,
                        int64_t n_sites, double* out, char* err, long errlen) {
  gzFile fh = gzopen(path, "rb");
  if (!fh) {
    set_err(err, errlen, "cannot open GENO file!");
    return 1;
  }
  gzbuffer(fh, 1 << 20);
  const int64_t total_bytes = n_sites * n_ind * kNGeno * 8;
  int64_t got = 0;
  while (got < total_bytes) {
    int64_t want = total_bytes - got;
    if (want > (1 << 24)) want = 1 << 24;
    int n = gzread(fh, (char*)out + got, (unsigned)want);
    if (n <= 0) {
      set_err(err, errlen,
              "GENO file at premature EOF. Check GENO file and number of sites!");
      gzclose(fh);
      return 2;
    }
    got += n;
  }
  char c;
  if (gzread(fh, &c, 1) == 1) {
    set_err(err, errlen,
            "GENO file not at EOF. Check GENO file and number of sites!");
    gzclose(fh);
    return 5;
  }
  gzclose(fh);
  for (int64_t si = 0; si < n_sites * n_ind; si++) {
    double* g = out + si * kNGeno;
    if (!in_logscale) {
      g[0] = log_or_sentinel(g[0], true);
      g[1] = log_or_sentinel(g[1], true);
      g[2] = log_or_sentinel(g[2], true);
    }
    post_prob3(g);
    if (std::isnan(g[0]) || std::isnan(g[1]) || std::isnan(g[2])) {
      set_err(err, errlen, "NaN found! Is the file format correct?");
      return 6;
    }
  }
  return 0;
}

// Positions reader: read_file + read_dist + label pass
// (gen_func.cpp:233-282, read_data.cpp:165-218, ngsLD.cpp:119-132).
// Skips blank/'#' lines, then `header_skip` more; per line: TSV fields
// (count must be constant, >= 2), col2 position via C strtod/strtoul
// (prefix semantics), adjacent distances with +inf at contig changes.
// Labels (line with first tab -> ':', NUL-terminated) are packed into
// `labels` with offsets in label_off.
// Returns 0 ok; -2 labels_cap too small (caller grows + retries);
// 1 open, 2 too few lines, 3 field count, 4 format, 5 zero/non-numeric
// position, 6 invalid distance.
int ngsld_read_pos(const char* path, int64_t header_skip, int64_t n_sites,
                   double* pos_dist, char* labels, int64_t labels_cap,
                   int64_t* label_off, int64_t* labels_len, char* err,
                   long errlen) {
  gzFile fh = gzopen(path, "r");
  if (!fh) {
    set_err(err, errlen, "cannot open POS file!");
    return 1;
  }
  gzbuffer(fh, 1 << 20);

  size_t cap = 1 << 16;
  char* buf = (char*)std::malloc(cap);
  char* prev_chr = nullptr;
  size_t prev_chr_cap = 0, prev_chr_len = 0;
  bool have_prev = false;
  unsigned long prev_pos = 0;
  int64_t n_fields = -1;
  int64_t skipped = 0, s = 0, lab_w = 0;
  int rc = 0;

  while (s < n_sites) {
    size_t len = 0;
    bool got = false;
    while (true) {
      if (len + 2 >= cap) {
        cap *= 2;
        buf = (char*)std::realloc(buf, cap);
      }
      if (gzgets(fh, buf + len, (int)(cap - len)) == nullptr) break;
      got = true;
      len += std::strlen(buf + len);
      if (len > 0 && buf[len - 1] == '\n') break;
    }
    if (!got) {
      set_err(err, errlen, "could not read specified number of lines!");
      rc = 2;
      goto done;
    }
    if (len > 0 && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) {
      buf[--len] = '\0';
    }
    if (len == 0 || buf[0] == '#') continue;  // read_file skip rules
    if (skipped < header_skip) {
      skipped++;
      continue;
    }
    // field count = tabs + 1 (split keeps empties); first-field extent
    int64_t nf = 1;
    size_t chr_len = len;
    const char* col2 = nullptr;
    for (size_t i = 0; i < len; i++) {
      if (buf[i] == '\t') {
        if (nf == 1) {
          chr_len = i;
          col2 = buf + i + 1;
        }
        nf++;
      }
    }
    if (n_fields < 0) {
      n_fields = nf;
      if (n_fields < 2) {
        set_err(err, errlen, "wrong POS file format!");
        rc = 4;
        goto done;
      }
    } else if (nf != n_fields) {
      set_err(err, errlen, "invalid number of fields in file!");
      rc = 3;
      goto done;
    }
    {
      // strtod stops at the field's closing tab: C prefix semantics, as
      // the reference applies them (read_data.cpp:188,199)
      double p2 = std::strtod(col2, nullptr);
      if (p2 == 0.0) {
        set_err(err, errlen, "non-numeric/zero position found "
                             "(headered POS file? use --posH)");
        rc = 5;
        goto done;
      }
      bool same = have_prev && prev_chr_len == chr_len &&
                  std::memcmp(prev_chr, buf, chr_len) == 0;
      if (!have_prev) {
        same = true;  // first site: prev_chr adopts this contig
      }
      if (same) {
        double d = p2 - (double)prev_pos;
        if (d < 1.0) {
          set_err(err, errlen, "invalid distance between adjacent sites!");
          rc = 6;
          goto done;
        }
        pos_dist[s] = d;
      } else {
        pos_dist[s] = INFINITY;
      }
      if (chr_len + 1 > prev_chr_cap) {
        prev_chr_cap = (chr_len + 1) * 2;
        prev_chr = (char*)std::realloc(prev_chr, prev_chr_cap);
      }
      std::memcpy(prev_chr, buf, chr_len);
      prev_chr_len = chr_len;
      have_prev = true;
      prev_pos = std::strtoul(col2, nullptr, 0);
    }
    // label: line with first tab -> ':'
    if (lab_w + (int64_t)len + 1 > labels_cap) {
      rc = -2;
      goto done;
    }
    label_off[s] = lab_w;
    std::memcpy(labels + lab_w, buf, len);
    if (chr_len < len) labels[lab_w + chr_len] = ':';
    lab_w += (int64_t)len;
    labels[lab_w++] = '\0';
    s++;
  }
  *labels_len = lab_w;
done:
  std::free(buf);
  std::free(prev_chr);
  gzclose(fh);
  return rc;
}

// Bulk TSV row formatter: the printf contract of ngsLD.cpp:314-351.
//   labels: concatenated NUL-terminated label strings; label_off[i] offsets
//   s1/s2: per-row indices into labels
//   cols: dist, r2p, D, Dp, r2 always; extended adds n_used(maf..chi2 etc.)
// Writes at most out_cap bytes into out; returns bytes written, or -1 if
// the buffer is too small (caller grows and retries).
int64_t ngsld_format_rows(int64_t n_rows, const char* labels,
                          const int64_t* label_off, const int64_t* s1,
                          const int64_t* s2, const double* dist,
                          const double* r2p, const double* D,
                          const double* Dp, const double* r2, int extend,
                          const int32_t* n_used, const double* maf1,
                          const double* maf2, const double* hap,  // 4*n
                          const double* hmaf1, const double* hmaf2,
                          const float* chi2, const int32_t* n_iter,
                          char* out, int64_t out_cap) {
  int64_t w = 0;
  for (int64_t j = 0; j < n_rows; j++) {
    if (out_cap - w < 1024) return -1;
    int n = std::snprintf(out + w, (size_t)(out_cap - w),
                          "%s\t%s\t%.0f\t%f\t%f\t%f\t%f",
                          labels + label_off[s1[j]], labels + label_off[s2[j]],
                          dist[j], r2p[j], D[j], Dp[j], r2[j]);
    if (n < 0 || n >= out_cap - w) return -1;
    w += n;
    if (extend) {
      n = std::snprintf(out + w, (size_t)(out_cap - w),
                        "\t%lld\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%lld",
                        (long long)n_used[j], maf1[j], maf2[j], hap[4 * j],
                        hap[4 * j + 1], hap[4 * j + 2], hap[4 * j + 3],
                        hmaf1[j], hmaf2[j], (double)chi2[j], 0.0,
                        (long long)n_iter[j]);
      if (n < 0 || n >= out_cap - w) return -1;
      w += n;
    }
    if (out_cap - w < 2) return -1;
    out[w++] = '\n';
  }
  return w;
}

}  // extern "C"
