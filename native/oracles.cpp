// Native host-side oracle/validation library.
//
// The reference computes every oracle in C++ (std::copy_if / std::sort /
// std::accumulate / dense aggregation / seq_join — see the Validation
// column of SURVEY.md §2.3). The Python harness calls these through ctypes
// (dwarf_bench_tpu/native.py) so oracle computation and result validation
// stay native-speed at benchmark sizes (the O(n) hash-join oracles in pure
// Python are minutes at 2^24 rows); a numpy/python fallback exists for
// environments without a C++ toolchain.
//
// Build: make -C native   (→ native/liboracles.so)

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <unordered_map>
#include <vector>

extern "C" {

// std::sort oracle (reference: sort/radix.cpp:8-13). In-place.
void oracle_sort_i32(int32_t *data, int64_t n) { std::sort(data, data + n); }

// copy_if(x < threshold) oracle (reference: scan/scan.cpp:12-17).
// Returns number of selected elements written to out.
int64_t oracle_filter_lt_i32(const int32_t *src, int64_t n, int32_t threshold,
                             int32_t *out) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (src[i] < threshold) out[k++] = src[i];
  }
  return k;
}

// std::accumulate-on-int oracle (reference: reduce/reduce.cpp:10-22).
int32_t oracle_reduce_i32(const int32_t *src, int64_t n) {
  int32_t acc = 0;
  for (int64_t i = 0; i < n; ++i) acc += src[i];  // wraps like the C++ int
  return acc;
}

// Dense group-by sum oracle (reference: groupby/groupby.cpp:8-19),
// uint32 wraparound accumulation.
void oracle_groupby_sum_u32(const uint32_t *keys, const uint32_t *vals,
                            int64_t n, uint32_t *out, int64_t groups) {
  std::memset(out, 0, sizeof(uint32_t) * groups);
  for (int64_t i = 0; i < n; ++i) out[keys[i]] += vals[i];
}

// Total matching pairs between two key columns (hash-based seq_join count).
int64_t oracle_join_count(const uint32_t *a, int64_t na, const uint32_t *b,
                          int64_t nb) {
  std::unordered_map<uint32_t, int64_t> ca;
  ca.reserve(na * 2);
  for (int64_t i = 0; i < na; ++i) ++ca[a[i]];
  int64_t total = 0;
  for (int64_t j = 0; j < nb; ++j) {
    auto it = ca.find(b[j]);
    if (it != ca.end()) total += it->second;
  }
  return total;
}

// Validate a CSR one-to-many join result against the id-set oracle
// (reference: join/join_omnisci.cpp:15-45): for every B row, the set of A
// row ids in id_buffer[pos : pos+cnt] must equal {i : a_keys[i] == b_keys[j]}.
// Returns the number of mismatching B rows (0 == valid).
int64_t oracle_validate_csr_join(const uint32_t *a_keys, int64_t na,
                                 const uint32_t *b_keys, int64_t nb,
                                 const int32_t *pos, const int32_t *cnt,
                                 const uint32_t *id_buffer, int64_t id_len) {
  // key -> sorted vector of A row ids
  std::unordered_map<uint32_t, std::vector<uint32_t>> index;
  index.reserve(na * 2);
  for (int64_t i = 0; i < na; ++i)
    index[a_keys[i]].push_back(static_cast<uint32_t>(i));

  int64_t bad = 0;
  std::vector<uint32_t> got;
  for (int64_t j = 0; j < nb; ++j) {
    auto it = index.find(b_keys[j]);
    int64_t c = cnt[j];
    if (it == index.end()) {
      if (c != 0) ++bad;
      continue;
    }
    const auto &exp = it->second;
    if (c != static_cast<int64_t>(exp.size()) || pos[j] < 0 ||
        pos[j] + c > id_len) {
      ++bad;
      continue;
    }
    got.assign(id_buffer + pos[j], id_buffer + pos[j] + c);
    std::sort(got.begin(), got.end());
    if (!std::equal(got.begin(), got.end(), exp.begin())) ++bad;
  }
  return bad;
}

// seq_join oracle (reference: join/join_helpers/join_helpers.hpp:86-125):
// emit all (key, a_val, b_val) triples, sorted, for order-insensitive
// comparison. Caller passes a capacity; returns the triple count (or -1 if
// capacity insufficient). Rows are written as three parallel columns.
int64_t oracle_seq_join(const uint32_t *ak, const uint32_t *av, int64_t na,
                        const uint32_t *bk, const uint32_t *bv, int64_t nb,
                        uint32_t *out_k, uint32_t *out_av, uint32_t *out_bv,
                        int64_t capacity) {
  std::unordered_map<uint32_t, std::vector<int64_t>> bidx;
  bidx.reserve(nb * 2);
  for (int64_t j = 0; j < nb; ++j) bidx[bk[j]].push_back(j);
  std::vector<std::array<uint32_t, 3>> rows;
  for (int64_t i = 0; i < na; ++i) {
    auto it = bidx.find(ak[i]);
    if (it == bidx.end()) continue;
    for (int64_t j : it->second)
      rows.push_back({ak[i], av[i], bv[j]});
  }
  if (static_cast<int64_t>(rows.size()) > capacity) return -1;
  std::sort(rows.begin(), rows.end());
  for (size_t r = 0; r < rows.size(); ++r) {
    out_k[r] = rows[r][0];
    out_av[r] = rows[r][1];
    out_bv[r] = rows[r][2];
  }
  return static_cast<int64_t>(rows.size());
}

}  // extern "C"
