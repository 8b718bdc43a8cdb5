// Measured CPU denominator for BASELINE_CPU.json (round-3: replace the
// estimated cpu_arroy_qps/build figures with numbers measured on the
// recorded host hardware).
//
// An honest, independent C++ implementation of the reference's
// algorithm class (Annoy-family RP-forest — the same structure arroy
// implements; reference: src/writer.rs:487-629 build, src/reader.rs:317-401
// query).  This is NOT a translation of the reference's Rust: it is the
// textbook algorithm, written for CPU speed (contiguous node arrays,
// -O3 -march=native auto-vectorized dots) so the denominator it
// produces is a fair performance-class representative:
//
//   * build: recursive two-means hyperplane splits, 0.95 imbalance
//     guard with retries and a random-hyperplane fallback, leaves of
//     at most `split_after` items
//   * query: global best-first priority queue over hyperplane margins,
//     collect >= search_k candidates, dedup, exact re-score, top-k
//
// Usage:
//   cpu_baseline <corpus.npy> <queries.npy> <metric> <n_trees>
//                <split_after> <count> <sk1,sk2,...> <out_prefix>
//
// Emits one JSON line per phase on stdout:
//   {"phase":"build","seconds":S,"n_trees":T,"nodes":N}
//   {"phase":"query","search_k":K,"qps":Q,"out":"<prefix>_K.i32"}
// The .i32 files are row-major int32 [n_queries, count] neighbor ids
// (-1 padded) for the Python driver to score against a brute oracle.
//
// Single-threaded by design: this host has one core, and ann-benchmarks
// (the public yardstick BASELINE_CPU.json cites) also measures
// single-thread query throughput.  Multi-core scaling stays a
// documented multiplier in BASELINE_CPU.json.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <random>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- npy io
struct Matrix {
  std::vector<float> data;
  int64_t rows = 0, cols = 0;
  const float* row(int64_t i) const { return data.data() + i * cols; }
};

Matrix load_npy(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "open %s failed\n", path); std::exit(1); }
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fprintf(stderr, "%s: not a .npy file\n", path); std::exit(1);
  }
  uint32_t hlen = 0;
  if (magic[6] == 1) { uint16_t h; std::fread(&h, 2, 1, f); hlen = h; }
  else { std::fread(&hlen, 4, 1, f); }
  std::string hdr(hlen, 0);
  std::fread(hdr.data(), 1, hlen, f);
  if (hdr.find("'<f4'") == std::string::npos ||
      hdr.find("'fortran_order': False") == std::string::npos) {
    std::fprintf(stderr, "%s: need C-order <f4\n", path); std::exit(1);
  }
  auto p = hdr.find("'shape': (");
  int64_t r = 0, c = 0;
  if (std::sscanf(hdr.c_str() + p, "'shape': (%ld, %ld", &r, &c) != 2) {
    std::fprintf(stderr, "%s: need 2-d shape\n", path); std::exit(1);
  }
  Matrix m;
  m.rows = r; m.cols = c;
  m.data.resize(size_t(r) * c);
  if (std::fread(m.data.data(), 4, m.data.size(), f) != m.data.size()) {
    std::fprintf(stderr, "%s: short read\n", path); std::exit(1);
  }
  std::fclose(f);
  return m;
}

// ------------------------------------------------------------- distances
inline float dot(const float* a, const float* b, int64_t d) {
  float s = 0.f;
  for (int64_t i = 0; i < d; ++i) s += a[i] * b[i];
  return s;
}

inline float sqdist(const float* a, const float* b, int64_t d) {
  float s = 0.f;
  for (int64_t i = 0; i < d; ++i) { float t = a[i] - b[i]; s += t * t; }
  return s;
}

// ------------------------------------------------------------ the forest
// Node layout (SoA): split nodes carry a hyperplane row in `normals` and
// an offset; leaves carry [beg, end) into `leaf_items`.
struct Forest {
  int64_t dims = 0;
  std::vector<float> normals;        // [n_splits, dims]
  std::vector<float> offsets;        // [n_splits]
  std::vector<int32_t> left, right;  // [n_nodes] child ids, or -1
  std::vector<int32_t> plane;        // [n_nodes] split row, -1 for leaf
  std::vector<int32_t> leaf_beg, leaf_end;  // [n_nodes]
  std::vector<int32_t> leaf_items;   // all trees' leaf members
  std::vector<int32_t> roots;
};

struct Builder {
  const Matrix& x;
  bool cosine;
  int split_after;
  std::mt19937_64 rng;
  Forest f;
  int64_t fallbacks = 0, splits = 0;

  // two-means in the Annoy/arroy style: two random seeds, 200 online
  // assign-and-update steps over random members, hyperplane = c0 - c1
  // (reference: src/distance/*::create_split two_means, 200 iterations)
  bool make_plane(const std::vector<int32_t>& ids, std::vector<float>& nrm,
                  float& off) {
    const int64_t d = x.cols;
    if (ids.size() < 2) return false;
    std::uniform_int_distribution<size_t> pick(0, ids.size() - 1);
    size_t i = pick(rng), j = pick(rng);
    if (j == i) j = (j + 1) % ids.size();
    std::vector<float> c0(x.row(ids[i]), x.row(ids[i]) + d);
    std::vector<float> c1(x.row(ids[j]), x.row(ids[j]) + d);
    float n0 = 1.f, n1 = 1.f;
    for (int it = 0; it < 200; ++it) {
      const float* v = x.row(ids[pick(rng)]);
      // size-weighted assignment (d_i = n_i * dist) — the balancing
      // term Annoy/arroy's two_means uses; without it one centroid
      // absorbs everything and >half the splits trip the 0.95 guard
      float d0, d1;
      if (cosine) {
        float m0 = std::sqrt(dot(c0.data(), c0.data(), d)) + 1e-30f;
        float m1 = std::sqrt(dot(c1.data(), c1.data(), d)) + 1e-30f;
        d0 = n0 * (1.f - dot(c0.data(), v, d) / m0);
        d1 = n1 * (1.f - dot(c1.data(), v, d) / m1);
      } else {
        d0 = n0 * sqdist(c0.data(), v, d);
        d1 = n1 * sqdist(c1.data(), v, d);
      }
      if (d0 < d1) {
        for (int64_t t = 0; t < d; ++t) c0[t] = (c0[t] * n0 + v[t]) / (n0 + 1);
        n0 += 1;
      } else {
        for (int64_t t = 0; t < d; ++t) c1[t] = (c1[t] * n1 + v[t]) / (n1 + 1);
        n1 += 1;
      }
    }
    nrm.resize(d);
    float nn = 0.f;
    for (int64_t t = 0; t < d; ++t) { nrm[t] = c0[t] - c1[t]; nn += nrm[t] * nrm[t]; }
    nn = std::sqrt(nn);
    if (nn < 1e-12f) return false;
    for (int64_t t = 0; t < d; ++t) nrm[t] /= nn;
    if (cosine) off = 0.f;
    else {
      off = 0.f;
      for (int64_t t = 0; t < d; ++t) off += nrm[t] * 0.5f * (c0[t] + c1[t]);
    }
    return true;
  }

  int32_t build_node(std::vector<int32_t>& ids) {
    if ((int)ids.size() <= split_after) {
      int32_t nid = (int32_t)f.plane.size();
      f.plane.push_back(-1);
      f.left.push_back(-1); f.right.push_back(-1);
      f.leaf_beg.push_back((int32_t)f.leaf_items.size());
      f.leaf_items.insert(f.leaf_items.end(), ids.begin(), ids.end());
      f.leaf_end.push_back((int32_t)f.leaf_items.size());
      return nid;
    }
    const int64_t d = x.cols;
    std::vector<float> nrm;
    float off = 0.f;
    std::vector<int32_t> l, r;
    bool ok = false;
    for (int attempt = 0; attempt < 3 && !ok; ++attempt) {
      if (!make_plane(ids, nrm, off)) continue;
      l.clear(); r.clear();
      for (int32_t id : ids) {
        float m = dot(nrm.data(), x.row(id), d) - off;
        (m >= 0 ? r : l).push_back(id);
      }
      // the reference's 0.95 imbalance guard (src/writer.rs:850-870)
      double frac = double(std::max(l.size(), r.size())) / ids.size();
      ok = frac < 0.95;
    }
    splits++;
    if (!ok) {
      fallbacks++;
      // consistent random-hyperplane fallback: gaussian direction,
      // offset = median margin (build partition and query greedy use
      // the SAME stored plane, unlike a shuffle split)
      std::normal_distribution<float> g;
      nrm.resize(d);
      float nn = 0.f;
      for (int64_t t = 0; t < d; ++t) { nrm[t] = g(rng); nn += nrm[t] * nrm[t]; }
      nn = std::sqrt(nn) + 1e-30f;
      for (int64_t t = 0; t < d; ++t) nrm[t] /= nn;
      std::vector<float> ms(ids.size());
      for (size_t t = 0; t < ids.size(); ++t)
        ms[t] = dot(nrm.data(), x.row(ids[t]), d);
      std::nth_element(ms.begin(), ms.begin() + ms.size() / 2, ms.end());
      off = ms[ms.size() / 2];
      l.clear(); r.clear();
      for (int32_t id : ids) {
        float m = dot(nrm.data(), x.row(id), d) - off;
        (m >= 0 ? r : l).push_back(id);
      }
      if (l.empty() || r.empty()) {  // duplicate-heavy degenerate set
        size_t h = ids.size() / 2;
        l.assign(ids.begin(), ids.begin() + h);
        r.assign(ids.begin() + h, ids.end());
      }
    }
    int32_t row = (int32_t)f.offsets.size();
    f.normals.insert(f.normals.end(), nrm.begin(), nrm.end());
    f.offsets.push_back(off);
    int32_t nid = (int32_t)f.plane.size();
    f.plane.push_back(row);
    f.left.push_back(-1); f.right.push_back(-1);
    f.leaf_beg.push_back(-1); f.leaf_end.push_back(-1);
    ids.clear(); ids.shrink_to_fit();
    int32_t lc = build_node(l);
    int32_t rc = build_node(r);
    f.left[nid] = lc; f.right[nid] = rc;
    return nid;
  }
};

// best-first traversal, Annoy-style bounded priorities
// (reference: src/reader.rs:317-401)
void query_one(const Forest& f, const Matrix& x, const float* q, bool cosine,
               int search_k, int count, std::vector<int32_t>& out,
               std::vector<int32_t>& cand, std::vector<float>& dist) {
  const int64_t d = f.dims;
  cand.clear();
  using Entry = std::pair<float, int32_t>;
  std::priority_queue<Entry> pq;
  for (int32_t r : f.roots) pq.push({std::numeric_limits<float>::infinity(), r});
  while (!pq.empty() && (int)cand.size() < search_k) {
    auto [p, nid] = pq.top();
    pq.pop();
    int32_t plane = f.plane[nid];
    if (plane < 0) {
      for (int32_t i = f.leaf_beg[nid]; i < f.leaf_end[nid]; ++i)
        cand.push_back(f.leaf_items[i]);
    } else {
      float m = dot(&f.normals[size_t(plane) * d], q, d) - f.offsets[plane];
      pq.push({std::min(p, +m), f.right[nid]});
      pq.push({std::min(p, -m), f.left[nid]});
    }
  }
  std::sort(cand.begin(), cand.end());
  cand.erase(std::unique(cand.begin(), cand.end()), cand.end());
  dist.resize(cand.size());
  for (size_t i = 0; i < cand.size(); ++i) {
    const float* v = x.row(cand[i]);
    dist[i] = cosine ? -dot(q, v, d) : sqdist(q, v, d);
  }
  int k = std::min<int>(count, (int)cand.size());
  std::vector<int32_t> idx(cand.size());
  for (size_t i = 0; i < idx.size(); ++i) idx[i] = (int32_t)i;
  std::partial_sort(idx.begin(), idx.begin() + k, idx.end(),
                    [&](int32_t a, int32_t b) { return dist[a] < dist[b]; });
  out.assign(count, -1);
  for (int i = 0; i < k; ++i) out[i] = cand[idx[i]];
}

// ------------------------------------------------------------------ HNSW
// Single-thread HNSW competitor arm (the role of the reference's
// compare_with_hnsw example, which races arroy against the
// instant-distance HNSW crate — examples/compare_with_hnsw.rs:12-15,
// 44-49).  Textbook Malkov-Yashunin: geometric level assignment,
// greedy descent through upper layers, ef-bounded beam at layer 0,
// closest-M neighbor selection (no pruning heuristic — baseline-grade,
// like the simple crates the reference raced).  The `sks` CLI values
// are interpreted as query-time `ef`.
struct HNSW {
  const Matrix& x;
  bool cosine;
  int64_t d;
  int M, Mmax0, efc;
  double mult;
  std::mt19937_64 rng;
  // links[node][level] = neighbor ids
  std::vector<std::vector<std::vector<int32_t>>> links;
  std::vector<int> level;
  int32_t ep = -1;
  int maxlevel = -1;

  HNSW(const Matrix& x_, bool cos, int m, int ef_construction)
      : x(x_), cosine(cos), d(x_.cols), M(m), Mmax0(2 * m),
        efc(ef_construction), mult(1.0 / std::log(double(m))),
        rng(42) {}

  float dist(const float* q, int32_t b) const {
    const float* v = x.row(b);
    return cosine ? -dot(q, v, d) : sqdist(q, v, d);
  }

  // ef-bounded best-first beam on one layer; returns (dist, id) sorted asc
  void search_layer(const float* q, int32_t entry, float dentry, int lc,
                    int ef, std::vector<std::pair<float, int32_t>>& out,
                    std::vector<uint8_t>& seen,
                    std::vector<int32_t>& touched) const {
    using E = std::pair<float, int32_t>;
    std::priority_queue<E, std::vector<E>, std::greater<E>> cand;  // min
    std::priority_queue<E> best;                                    // max
    cand.push({dentry, entry});
    best.push({dentry, entry});
    seen[entry] = 1;
    touched.push_back(entry);
    while (!cand.empty()) {
      auto [dc, c] = cand.top();
      if (dc > best.top().first && (int)best.size() >= ef) break;
      cand.pop();
      for (int32_t nb : links[c][lc]) {
        if (seen[nb]) continue;
        seen[nb] = 1;
        touched.push_back(nb);
        float dn = dist(q, nb);
        if ((int)best.size() < ef || dn < best.top().first) {
          cand.push({dn, nb});
          best.push({dn, nb});
          if ((int)best.size() > ef) best.pop();
        }
      }
    }
    out.resize(best.size());
    for (size_t i = out.size(); i-- > 0;) { out[i] = best.top(); best.pop(); }
    for (int32_t t : touched) seen[t] = 0;
    touched.clear();
  }

  void insert(int32_t id, std::vector<uint8_t>& seen,
              std::vector<int32_t>& touched) {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    int l = (int)(-std::log(std::max(u(rng), 1e-12)) * mult);
    links[id].assign(l + 1, {});
    level[id] = l;
    if (ep < 0) { ep = id; maxlevel = l; return; }
    const float* q = x.row(id);
    int32_t cur = ep;
    float dcur = dist(q, cur);
    for (int lc = maxlevel; lc > l; --lc) {  // greedy descent
      bool moved = true;
      while (moved) {
        moved = false;
        for (int32_t nb : links[cur][lc]) {
          float dn = dist(q, nb);
          if (dn < dcur) { dcur = dn; cur = nb; moved = true; }
        }
      }
    }
    std::vector<std::pair<float, int32_t>> w;
    std::vector<int32_t> sel;
    for (int lc = std::min(l, maxlevel); lc >= 0; --lc) {
      search_layer(q, cur, dcur, lc, efc, w, seen, touched);
      int mmax = lc == 0 ? Mmax0 : M;
      // SELECT-NEIGHBORS heuristic (Malkov-Yashunin alg. 4): keep a
      // candidate only if it is closer to q than to every already-kept
      // neighbor — spreads edges across directions instead of packing
      // them into one cluster
      sel.clear();
      for (auto& [dc, cnd] : w) {
        if ((int)sel.size() >= M) break;
        bool ok = true;
        const float* cv = x.row(cnd);
        for (int32_t s : sel)
          if (dist(cv, s) < dc) { ok = false; break; }
        if (ok) sel.push_back(cnd);
      }
      for (int32_t nb : sel) {
        links[id][lc].push_back(nb);
        auto& back = links[nb][lc];
        back.push_back(id);
        if ((int)back.size() > mmax) {  // shrink: keep the closest mmax
          const float* v = x.row(nb);
          std::partial_sort(
              back.begin(), back.begin() + mmax, back.end(),
              [&](int32_t a, int32_t b2) { return dist(v, a) < dist(v, b2); });
          back.resize(mmax);
        }
      }
      cur = w[0].second;
      dcur = w[0].first;
    }
    if (l > maxlevel) { maxlevel = l; ep = id; }
  }

  void query(const float* q, int ef, int count, std::vector<int32_t>& out,
             std::vector<uint8_t>& seen, std::vector<int32_t>& touched) const {
    out.assign(count, -1);
    if (ep < 0) return;
    int32_t cur = ep;
    float dcur = dist(q, cur);
    for (int lc = maxlevel; lc > 0; --lc) {
      bool moved = true;
      while (moved) {
        moved = false;
        for (int32_t nb : links[cur][lc]) {
          float dn = dist(q, nb);
          if (dn < dcur) { dcur = dn; cur = nb; moved = true; }
        }
      }
    }
    std::vector<std::pair<float, int32_t>> w;
    search_layer(q, cur, dcur, 0, std::max(ef, count), w, seen, touched);
    int k = std::min<int>(count, (int)w.size());
    for (int i = 0; i < k; ++i) out[i] = w[i].second;
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc != 9) {
    std::fprintf(stderr,
                 "usage: %s corpus.npy queries.npy metric[:hnsw] n_trees "
                 "split_after count sk1,sk2,... out_prefix\n", argv[0]);
    return 2;
  }
  Matrix x = load_npy(argv[1]);
  Matrix q = load_npy(argv[2]);
  std::string metric_arg = argv[3];
  bool hnsw_mode = false;
  size_t colon = metric_arg.find(":hnsw");
  if (colon != std::string::npos) {  // e.g. "euclidean:hnsw"
    hnsw_mode = true;
    metric_arg = metric_arg.substr(0, colon);
  }
  bool cosine = metric_arg == "cosine";
  int n_trees = std::atoi(argv[4]);
  int split_after = std::atoi(argv[5]);
  int count = std::atoi(argv[6]);
  std::vector<int> sks;
  for (char* t = std::strtok(argv[7], ","); t; t = std::strtok(nullptr, ","))
    sks.push_back(std::atoi(t));
  std::string prefix = argv[8];

  if (cosine) {  // normalize once; dot == cosine order
    for (int64_t i = 0; i < x.rows; ++i) {
      float* r = x.data.data() + i * x.cols;
      float n = std::sqrt(dot(r, r, x.cols)) + 1e-30f;
      for (int64_t t = 0; t < x.cols; ++t) r[t] /= n;
    }
    for (int64_t i = 0; i < q.rows; ++i) {
      float* r = q.data.data() + i * q.cols;
      float n = std::sqrt(dot(r, r, q.cols)) + 1e-30f;
      for (int64_t t = 0; t < q.cols; ++t) r[t] /= n;
    }
  }

  if (hnsw_mode) {
    // n_trees arg = M (graph degree); split_after arg = ef_construction;
    // sks = query-time ef values
    HNSW h(x, cosine, n_trees > 0 ? n_trees : 16,
           split_after > 0 ? split_after : 100);
    h.links.resize(x.rows);
    h.level.assign(x.rows, 0);
    std::vector<uint8_t> seen(x.rows, 0);
    std::vector<int32_t> touched;
    auto th0 = std::chrono::steady_clock::now();
    for (int64_t i = 0; i < x.rows; ++i) h.insert((int32_t)i, seen, touched);
    double hb =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - th0)
            .count();
    std::printf("{\"phase\":\"build\",\"algo\":\"hnsw\",\"seconds\":%.2f,"
                "\"M\":%d,\"efc\":%d}\n", hb, h.M, h.efc);
    std::fflush(stdout);
    std::vector<int32_t> out;
    for (int ef : sks) {
      std::vector<int32_t> all(size_t(q.rows) * count, -1);
      auto t1 = std::chrono::steady_clock::now();
      for (int64_t i = 0; i < q.rows; ++i) {
        h.query(q.row(i), ef, count, out, seen, touched);
        std::copy(out.begin(), out.end(), all.begin() + i * count);
      }
      double qs =
          std::chrono::duration<double>(std::chrono::steady_clock::now() - t1)
              .count();
      std::string path = prefix + "_hnsw_" + std::to_string(ef) + ".i32";
      FILE* fo = std::fopen(path.c_str(), "wb");
      std::fwrite(all.data(), 4, all.size(), fo);
      std::fclose(fo);
      std::printf("{\"phase\":\"query\",\"algo\":\"hnsw\",\"ef\":%d,"
                  "\"qps\":%.1f,\"out\":\"%s\"}\n", ef, q.rows / qs,
                  path.c_str());
      std::fflush(stdout);
    }
    return 0;
  }

  Builder b{x, cosine, split_after, std::mt19937_64(42), {}};
  b.f.dims = x.cols;
  auto t0 = std::chrono::steady_clock::now();
  for (int t = 0; t < n_trees; ++t) {
    std::vector<int32_t> ids(x.rows);
    for (int64_t i = 0; i < x.rows; ++i) ids[i] = (int32_t)i;
    b.f.roots.push_back(b.build_node(ids));
  }
  double build_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  std::printf("{\"phase\":\"build\",\"seconds\":%.2f,\"n_trees\":%d,"
              "\"nodes\":%zu,\"splits\":%ld,\"fallbacks\":%ld}\n",
              build_s, n_trees, b.f.plane.size(), b.splits, b.fallbacks);
  std::fflush(stdout);

  std::vector<int32_t> out, cand;
  std::vector<float> dist;
  for (int sk : sks) {
    std::vector<int32_t> all(size_t(q.rows) * count, -1);
    auto t1 = std::chrono::steady_clock::now();
    for (int64_t i = 0; i < q.rows; ++i) {
      query_one(b.f, x, q.row(i), cosine, sk, count, out, cand, dist);
      std::copy(out.begin(), out.end(), all.begin() + i * count);
    }
    double qs =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t1)
            .count();
    std::string path = prefix + "_" + std::to_string(sk) + ".i32";
    FILE* fo = std::fopen(path.c_str(), "wb");
    std::fwrite(all.data(), 4, all.size(), fo);
    std::fclose(fo);
    std::printf("{\"phase\":\"query\",\"search_k\":%d,\"qps\":%.1f,"
                "\"out\":\"%s\"}\n", sk, q.rows / qs, path.c_str());
    std::fflush(stdout);
  }
  return 0;
}
