// anorag_native: host-side runtime kernels for anorag-tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-side hot loops that feed it:
//   * corpus tokenization + vocabulary construction,
//   * BM25 postings building with precomputed Okapi weights
//     (the index-build path of anorag_tpu/ops/bm25.py — identical math:
//      idf = ln((N - df + 0.5)/(df + 0.5) + 1),
//      w   = idf * tf*(k1+1)/(tf + k1*(1 - b + b*len/avgdl)) ),
//   * Levenshtein ratio for fuzzy entity matching,
//   * path-aware ranker graph ops (k-hop expansion + simple-path BFS edge
//     contribution counts over the per-query entity graph — the reference's
//     LightweightGraph.find_paths/k_hop_expansion hot loop,
//     /root/reference/retrieval/path_aware_ranker.py:77-246).
//
//   * HNSW graph index (build + search) for the small-batch / huge-corpus
//     regime where a batched MXU scan doesn't pay (the reference exposes
//     FAISS IndexHNSW via index_type: HNSW,
//     /root/reference/vector_store/vector_index.py:77-107).
//
// C ABI only (loaded via ctypes). Build: make -C native
#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Posting {
  int32_t doc;
  float weight;
};

struct BM25Handle {
  std::vector<int64_t> term_offsets;  // V+1
  std::vector<int32_t> doc_ids;       // nnz
  std::vector<float> weights;         // nnz
  std::vector<float> idf;             // V
  std::string vocab_blob;             // null-separated terms, id order
  int64_t n_docs = 0;
};

inline bool is_word(unsigned char c) {
  // mirror python \w for ASCII (alnum + underscore); keep non-ASCII bytes
  return std::isalnum(c) || c == '_' || c >= 0x80;
}

// Lowercased word tokens of one document appended to `out`.
void tokenize(const char* text, int64_t len, std::vector<std::string>& out) {
  std::string cur;
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = text[i];
    if (is_word(c)) {
      cur.push_back(static_cast<char>(std::tolower(c)));
    } else if (!cur.empty()) {
      out.push_back(cur);
      cur.clear();
    }
  }
  if (!cur.empty()) out.push_back(cur);
}

// ---------------------------------------------------------------- HNSW
// Hierarchical Navigable Small World graph (Malkov & Yashunin 2016) over
// inner-product similarity (rows are L2-normalized upstream, so IP ==
// cosine). Fresh implementation; no FAISS/hnswlib code.
//
// Build is multi-threaded with per-node adjacency locks (neighbor lists
// are copied under the node's lock before scanning). Level assignment is
// a per-node hash of the seed, so the LEVEL structure is deterministic
// regardless of thread interleaving; link sets above the single-thread
// regime (n > PARALLEL_MIN) can vary run-to-run without affecting the
// recall contract.
struct VisitScratch {
  std::vector<uint32_t> tag;
  uint32_t epoch = 0;
};

struct HNSW {
  int64_t n = 0, d = 0;
  int32_t M = 16, Mmax0 = 32, efC = 200;
  double mult = 0.0;               // level multiplier 1/ln(M)
  int32_t entry = -1, max_level = -1;
  uint64_t seed = 0;
  std::vector<float> data;                              // (n, d) row-major
  std::vector<int32_t> node_level;                      // per node
  // links[v] holds node_level[v]+1 per-level neighbor lists
  std::vector<std::vector<std::vector<int32_t>>> links;
  std::unique_ptr<std::mutex[]> node_locks;
  std::mutex global_lock;                               // entry/max_level
  bool building = false;                                // lock adjacency reads

  static constexpr int64_t PARALLEL_MIN = 20000;

  float sim(const float* a, const float* b) const {
    float s = 0.f;
    for (int64_t i = 0; i < d; ++i) s += a[i] * b[i];
    return s;
  }
  const float* row(int32_t v) const { return data.data() + int64_t(v) * d; }

  void neighbors_of(int32_t v, int32_t lvl, std::vector<int32_t>& out) const {
    if (building) {
      std::lock_guard<std::mutex> g(node_locks[v]);
      out = lvl < static_cast<int32_t>(links[v].size()) ? links[v][lvl]
                                                        : std::vector<int32_t>{};
    } else {
      out = lvl < static_cast<int32_t>(links[v].size()) ? links[v][lvl]
                                                        : std::vector<int32_t>{};
    }
  }

  // Beam search within one level: returns up to `ef` best (sim, node),
  // unsorted. `eps` are entry points.
  void search_layer(const float* q, const std::vector<int32_t>& eps,
                    int32_t ef, int32_t lvl, VisitScratch& vs,
                    std::vector<std::pair<float, int32_t>>& out) const {
    if (vs.tag.size() != static_cast<size_t>(n)) vs.tag.assign(n, 0u);
    if (++vs.epoch == 0) {  // tag wraparound: reset all
      std::fill(vs.tag.begin(), vs.tag.end(), 0u);
      vs.epoch = 1;
    }
    // candidates: max-heap by sim; results: min-heap by sim
    std::priority_queue<std::pair<float, int32_t>> cand;
    std::priority_queue<std::pair<float, int32_t>,
                        std::vector<std::pair<float, int32_t>>,
                        std::greater<>> res;
    for (int32_t e : eps) {
      if (vs.tag[e] == vs.epoch) continue;
      vs.tag[e] = vs.epoch;
      const float s = sim(q, row(e));
      cand.emplace(s, e);
      res.emplace(s, e);
      if (static_cast<int32_t>(res.size()) > ef) res.pop();
    }
    std::vector<int32_t> nbrs;
    while (!cand.empty()) {
      auto [cs, cv] = cand.top();
      cand.pop();
      if (!res.empty() && cs < res.top().first &&
          static_cast<int32_t>(res.size()) >= ef)
        break;
      neighbors_of(cv, lvl, nbrs);
      for (int32_t u : nbrs) {
        if (vs.tag[u] == vs.epoch) continue;
        vs.tag[u] = vs.epoch;
        const float s = sim(q, row(u));
        if (static_cast<int32_t>(res.size()) < ef || s > res.top().first) {
          cand.emplace(s, u);
          res.emplace(s, u);
          if (static_cast<int32_t>(res.size()) > ef) res.pop();
        }
      }
    }
    out.clear();
    out.reserve(res.size());
    while (!res.empty()) {
      out.push_back(res.top());
      res.pop();
    }
  }

  // Neighbor selection heuristic (alg. 4): keep a candidate only if it is
  // closer to q than to every already-kept neighbor — spreads directions
  // instead of clustering all M links on one side.
  void select_neighbors(const float* q,
                        std::vector<std::pair<float, int32_t>>& cands,
                        int32_t m, std::vector<int32_t>& out) const {
    std::sort(cands.begin(), cands.end(),
              [](auto& a, auto& b) { return a.first > b.first; });
    out.clear();
    for (auto& [s, v] : cands) {
      if (static_cast<int32_t>(out.size()) >= m) break;
      bool good = true;
      for (int32_t u : out)
        if (sim(row(v), row(u)) > s) { good = false; break; }
      if (good) out.push_back(v);
    }
    // backfill with nearest pruned ones if the heuristic kept too few
    for (auto& [s, v] : cands) {
      if (static_cast<int32_t>(out.size()) >= m) break;
      if (std::find(out.begin(), out.end(), v) == out.end()) out.push_back(v);
    }
  }

  // Deterministic per-node level: hash of (seed, v), independent of the
  // order threads reach v.
  int32_t level_for(int32_t v) const {
    uint64_t x = seed ^ (static_cast<uint64_t>(v) * 0x9E3779B97F4A7C15ULL);
    x ^= x >> 33; x *= 0xFF51AFD7ED558CCDULL;
    x ^= x >> 33; x *= 0xC4CEB9FE1A85EC53ULL;
    x ^= x >> 33;
    const double u = std::max((x >> 11) * 0x1.0p-53, 1e-12);
    return static_cast<int32_t>(-std::log(u) * mult);
  }

  void insert(int32_t v, VisitScratch& vs) {
    const int32_t lvl = node_level[v];
    int32_t cur_entry, cur_max;
    {
      std::lock_guard<std::mutex> g(global_lock);
      if (entry < 0) {
        entry = v;
        max_level = lvl;
        return;
      }
      cur_entry = entry;
      cur_max = max_level;
    }
    const float* q = row(v);
    std::vector<int32_t> eps = {cur_entry};
    std::vector<std::pair<float, int32_t>> w;
    // greedy descent through levels above lvl
    for (int32_t l = cur_max; l > lvl; --l) {
      search_layer(q, eps, 1, l, vs, w);
      if (!w.empty()) {
        eps = {std::max_element(w.begin(), w.end())->second};
      }
    }
    // connect at each level from min(lvl, cur_max) down to 0
    for (int32_t l = std::min(lvl, cur_max); l >= 0; --l) {
      search_layer(q, eps, efC, l, vs, w);
      const int32_t mmax = l == 0 ? Mmax0 : M;
      std::vector<int32_t> sel;
      select_neighbors(q, w, M, sel);
      {
        std::lock_guard<std::mutex> g(node_locks[v]);
        links[v][l] = sel;
      }
      for (int32_t u : sel) {
        std::lock_guard<std::mutex> g(node_locks[u]);
        if (l >= static_cast<int32_t>(links[u].size())) continue;
        auto& lu = links[u][l];
        lu.push_back(v);
        if (static_cast<int32_t>(lu.size()) > mmax) {
          // re-select u's neighbors with the heuristic
          std::vector<std::pair<float, int32_t>> cu;
          cu.reserve(lu.size());
          for (int32_t x : lu) cu.emplace_back(sim(row(u), row(x)), x);
          std::vector<int32_t> su;
          select_neighbors(row(u), cu, mmax, su);
          lu = su;
        }
      }
      eps.clear();
      for (auto& [s, x] : w) eps.push_back(x);
    }
    if (lvl > cur_max) {
      std::lock_guard<std::mutex> g(global_lock);
      if (lvl > max_level) {
        max_level = lvl;
        entry = v;
      }
    }
  }

  void build(const float* emb) {
    data.assign(emb, emb + n * d);
    node_level.resize(n);
    links.resize(n);
    node_locks.reset(new std::mutex[n]);
    for (int64_t v = 0; v < n; ++v) {
      node_level[v] = level_for(static_cast<int32_t>(v));
      links[v].assign(node_level[v] + 1, {});
    }
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = n >= PARALLEL_MIN && hw > 1
                        ? static_cast<int>(std::min<unsigned>(hw, 16))
                        : 1;
    if (n_threads == 1) {
      VisitScratch vs;
      for (int64_t v = 0; v < n; ++v) insert(static_cast<int32_t>(v), vs);
      return;
    }
    building = true;
    // node 0 first so every thread has an entry point
    {
      VisitScratch vs;
      insert(0, vs);
    }
    std::atomic<int64_t> next(1);
    auto worker = [&]() {
      VisitScratch vs;
      for (;;) {
        const int64_t v = next.fetch_add(1);
        if (v >= n) break;
        insert(static_cast<int32_t>(v), vs);
      }
    };
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    building = false;
  }

  void search(const float* q, int32_t k, int32_t ef, VisitScratch& vs,
              float* out_scores, int32_t* out_idx) const {
    if (entry < 0) {
      for (int32_t i = 0; i < k; ++i) {
        out_scores[i] = -1e30f;
        out_idx[i] = -1;
      }
      return;
    }
    std::vector<int32_t> eps = {entry};
    std::vector<std::pair<float, int32_t>> w;
    for (int32_t l = max_level; l > 0; --l) {
      search_layer(q, eps, 1, l, vs, w);
      if (!w.empty()) eps = {std::max_element(w.begin(), w.end())->second};
    }
    search_layer(q, eps, std::max(ef, k), 0, vs, w);
    std::sort(w.begin(), w.end(), [](auto& a, auto& b) { return a.first > b.first; });
    for (int32_t i = 0; i < k; ++i) {
      if (i < static_cast<int32_t>(w.size())) {
        out_scores[i] = w[i].first;
        out_idx[i] = w[i].second;
      } else {
        out_scores[i] = -1e30f;
        out_idx[i] = -1;
      }
    }
  }
};

}  // namespace

extern "C" {

// Build an HNSW graph over n d-dim rows (inner-product similarity; callers
// normalize rows for cosine). Multi-threaded above HNSW::PARALLEL_MIN rows
// (level structure stays seed-deterministic; exact link sets may vary with
// thread interleaving there); strictly deterministic below it.
void* anorag_hnsw_build(const float* emb, int64_t n, int64_t d, int32_t m,
                        int32_t ef_construction, uint64_t seed) {
  auto* h = new HNSW();
  h->n = n;
  h->d = d;
  h->M = std::max(2, m);
  h->Mmax0 = 2 * h->M;
  h->efC = std::max(ef_construction, h->M);
  h->mult = 1.0 / std::log(static_cast<double>(h->M));
  h->seed = seed;
  h->build(emb);
  return h;
}

void anorag_hnsw_search(void* handle, const float* queries, int64_t nq,
                        int32_t k, int32_t ef_search, float* out_scores,
                        int32_t* out_idx) {
  auto* h = static_cast<HNSW*>(handle);
  unsigned hw = std::thread::hardware_concurrency();
  if (nq >= 8 && hw > 1) {
    const int n_threads = static_cast<int>(
        std::min<int64_t>(std::min<unsigned>(hw, 16), nq));
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
      VisitScratch vs;
      for (;;) {
        const int64_t qi = next.fetch_add(1);
        if (qi >= nq) break;
        h->search(queries + qi * h->d, k, ef_search, vs, out_scores + qi * k,
                  out_idx + qi * k);
      }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return;
  }
  VisitScratch vs;
  for (int64_t qi = 0; qi < nq; ++qi)
    h->search(queries + qi * h->d, k, ef_search, vs, out_scores + qi * k,
              out_idx + qi * k);
}

int64_t anorag_hnsw_size(void* handle) {
  return static_cast<HNSW*>(handle)->n;
}

// ---- graph serialization: the parallel build's link sets vary with thread
// interleaving, so persistence must save the adjacency lists, not rebuild
// from embeddings (rebuild is only bit-identical in the single-thread
// regime). Layout: per node 0..n-1, per level 0..node_level[v]:
// [count, neighbor...] concatenated into one int32 blob.

int64_t anorag_hnsw_links_size(void* handle) {
  auto* h = static_cast<HNSW*>(handle);
  int64_t total = 0;
  for (int64_t v = 0; v < h->n; ++v)
    for (auto& lvl : h->links[v]) total += 1 + static_cast<int64_t>(lvl.size());
  return total;
}

// meta: [n, d, M, Mmax0, efC, entry, max_level, seed] (8 x int64)
void anorag_hnsw_export(void* handle, int64_t* meta, int32_t* node_level,
                        int32_t* links_blob) {
  auto* h = static_cast<HNSW*>(handle);
  meta[0] = h->n; meta[1] = h->d; meta[2] = h->M; meta[3] = h->Mmax0;
  meta[4] = h->efC; meta[5] = h->entry; meta[6] = h->max_level;
  meta[7] = static_cast<int64_t>(h->seed);
  int64_t off = 0;
  for (int64_t v = 0; v < h->n; ++v) {
    node_level[v] = h->node_level[v];
    for (auto& lvl : h->links[v]) {
      links_blob[off++] = static_cast<int32_t>(lvl.size());
      for (int32_t u : lvl) links_blob[off++] = u;
    }
  }
}

void* anorag_hnsw_import(const float* emb, const int64_t* meta,
                         const int32_t* node_level, const int32_t* links_blob,
                         int64_t blob_len) {
  auto* h = new HNSW();
  h->n = meta[0]; h->d = meta[1];
  h->M = static_cast<int32_t>(meta[2]);
  h->Mmax0 = static_cast<int32_t>(meta[3]);
  h->efC = static_cast<int32_t>(meta[4]);
  h->entry = static_cast<int32_t>(meta[5]);
  h->max_level = static_cast<int32_t>(meta[6]);
  h->seed = static_cast<uint64_t>(meta[7]);
  h->mult = 1.0 / std::log(static_cast<double>(h->M));
  h->data.assign(emb, emb + h->n * h->d);
  h->node_level.assign(node_level, node_level + h->n);
  h->links.resize(h->n);
  h->node_locks.reset(new std::mutex[h->n]);
  int64_t off = 0;
  for (int64_t v = 0; v < h->n; ++v) {
    h->links[v].resize(h->node_level[v] + 1);
    for (auto& lvl : h->links[v]) {
      if (off >= blob_len) { delete h; return nullptr; }
      const int32_t cnt = links_blob[off++];
      if (off + cnt > blob_len) { delete h; return nullptr; }
      lvl.assign(links_blob + off, links_blob + off + cnt);
      off += cnt;
    }
  }
  return h;
}

void anorag_hnsw_free(void* handle) { delete static_cast<HNSW*>(handle); }

}  // extern "C"

extern "C" {

// Build BM25 postings from a concatenated corpus.
//  corpus:      all documents' text back to back (UTF-8)
//  doc_offsets: n_docs+1 byte offsets into corpus
// Returns an opaque handle (free with anorag_bm25_free).
void* anorag_bm25_build(const char* corpus, const int64_t* doc_offsets,
                        int64_t n_docs, double k1, double b) {
  auto* h = new BM25Handle();
  h->n_docs = n_docs;

  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::vector<std::pair<int32_t, int32_t>>> doc_tf(n_docs);  // (term, tf)
  std::vector<int32_t> doc_len(n_docs, 0);
  double total_len = 0.0;

  std::vector<std::string> toks;
  std::unordered_map<int32_t, int32_t> counts;
  for (int64_t d = 0; d < n_docs; ++d) {
    toks.clear();
    counts.clear();
    tokenize(corpus + doc_offsets[d], doc_offsets[d + 1] - doc_offsets[d], toks);
    doc_len[d] = static_cast<int32_t>(toks.size());
    total_len += toks.size();
    for (auto& t : toks) {
      auto it = vocab.find(t);
      int32_t id;
      if (it == vocab.end()) {
        id = static_cast<int32_t>(vocab.size());
        vocab.emplace(t, id);
      } else {
        id = it->second;
      }
      counts[id]++;
    }
    doc_tf[d].assign(counts.begin(), counts.end());
  }

  const int64_t V = static_cast<int64_t>(vocab.size());
  std::vector<int64_t> df(V, 0);
  for (auto& row : doc_tf)
    for (auto& [t, tf] : row) df[t]++;

  h->idf.resize(V);
  for (int64_t t = 0; t < V; ++t)
    h->idf[t] = static_cast<float>(
        std::log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0));

  h->term_offsets.assign(V + 1, 0);
  for (int64_t t = 0; t < V; ++t) h->term_offsets[t + 1] = h->term_offsets[t] + df[t];
  const int64_t nnz = h->term_offsets[V];
  h->doc_ids.resize(nnz);
  h->weights.resize(nnz);

  const double avgdl = n_docs ? total_len / n_docs : 0.0;
  std::vector<int64_t> cursor(h->term_offsets.begin(), h->term_offsets.end() - 1);
  for (int64_t d = 0; d < n_docs; ++d) {
    const double denom_base =
        avgdl > 0 ? k1 * (1.0 - b + b * (doc_len[d] / avgdl)) : k1;
    for (auto& [t, tf] : doc_tf[d]) {
      const int64_t pos = cursor[t]++;
      h->doc_ids[pos] = static_cast<int32_t>(d);
      h->weights[pos] =
          static_cast<float>(h->idf[t] * (tf * (k1 + 1.0)) / (tf + denom_base));
    }
  }

  // vocab blob in id order
  std::vector<const std::string*> by_id(V);
  for (auto& [term, id] : vocab) by_id[id] = &term;
  for (int64_t t = 0; t < V; ++t) {
    h->vocab_blob.append(*by_id[t]);
    h->vocab_blob.push_back('\0');
  }
  return h;
}

int64_t anorag_bm25_vocab_size(void* handle) {
  return static_cast<int64_t>(static_cast<BM25Handle*>(handle)->idf.size());
}
int64_t anorag_bm25_nnz(void* handle) {
  return static_cast<int64_t>(static_cast<BM25Handle*>(handle)->doc_ids.size());
}
int64_t anorag_bm25_vocab_blob_size(void* handle) {
  return static_cast<int64_t>(static_cast<BM25Handle*>(handle)->vocab_blob.size());
}

// Copy the built arrays out into caller-allocated buffers.
void anorag_bm25_export(void* handle, int64_t* term_offsets, int32_t* doc_ids,
                        float* weights, float* idf, char* vocab_blob) {
  auto* h = static_cast<BM25Handle*>(handle);
  std::memcpy(term_offsets, h->term_offsets.data(),
              h->term_offsets.size() * sizeof(int64_t));
  std::memcpy(doc_ids, h->doc_ids.data(), h->doc_ids.size() * sizeof(int32_t));
  std::memcpy(weights, h->weights.data(), h->weights.size() * sizeof(float));
  std::memcpy(idf, h->idf.data(), h->idf.size() * sizeof(float));
  std::memcpy(vocab_blob, h->vocab_blob.data(), h->vocab_blob.size());
}

void anorag_bm25_free(void* handle) { delete static_cast<BM25Handle*>(handle); }

// Tokenize one text into vocab ids given a prebuilt vocab (linear-probe map
// rebuilt per call is wasteful; callers keep the python dict — this exists
// for symmetric testing).
int64_t anorag_tokenize_count(const char* text, int64_t len) {
  std::vector<std::string> toks;
  tokenize(text, len, toks);
  return static_cast<int64_t>(toks.size());
}

// Levenshtein similarity ratio in [0, 1].
double anorag_levenshtein_ratio(const char* a, int64_t la, const char* b,
                                int64_t lb) {
  if (la == 0 && lb == 0) return 1.0;
  if (la == 0 || lb == 0) return 0.0;
  std::vector<int32_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = static_cast<int32_t>(j);
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = static_cast<int32_t>(i);
    for (int64_t j = 1; j <= lb; ++j) {
      const int32_t sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  const double dist = prev[lb];
  return 1.0 - dist / static_cast<double>(std::max(la, lb));
}

// Path-aware ranker graph ops over an undirected entity multigraph with
// interned node ids. Each input edge (src[e], dst[e]) carries the index of
// the candidate note that contributed it. Semantics mirror the Python
// EntityGraph (anorag_tpu/retrieval/path_aware_ranker.py) exactly:
//   * expanded: level-synchronous k-hop BFS membership from the query
//     entities (seeds included; seeds with no edges ignored);
//   * contributing: for every (a < b) query-entity pair, enumerate simple
//     paths src->dst in BFS order with at most max_len nodes, take the
//     first per_pair_cap, and for each consecutive (u, v) on a path count
//     every adjacency entry u->v once toward its candidate.
// Adjacency per node preserves edge-insertion order (CSR counting sort with
// sequential fill) so BFS path order — and therefore which paths fall under
// the cap — matches the Python structure built from the same triples.
void anorag_pathrank(const int32_t* src, const int32_t* dst,
                     const int32_t* cand, int64_t n_edges, int32_t n_nodes,
                     int32_t n_cands, const int32_t* q_ents, int32_t n_q,
                     int32_t k_hop, int32_t max_len, int32_t per_pair_cap,
                     uint8_t* expanded, int32_t* contributing) {
  std::vector<int64_t> off(static_cast<size_t>(n_nodes) + 1, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    off[src[e] + 1]++;
    off[dst[e] + 1]++;
  }
  for (int32_t v = 0; v < n_nodes; ++v) off[v + 1] += off[v];
  std::vector<int32_t> nbr(2 * n_edges), ecand(2 * n_edges);
  std::vector<int64_t> cur(off.begin(), off.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t p = cur[src[e]]++;
    nbr[p] = dst[e];
    ecand[p] = cand[e];
    p = cur[dst[e]]++;
    nbr[p] = src[e];
    ecand[p] = cand[e];
  }

  // k-hop expansion
  std::vector<uint8_t> seen(n_nodes, 0);
  std::vector<int32_t> frontier;
  for (int32_t i = 0; i < n_q; ++i) {
    const int32_t s = q_ents[i];
    if (s >= 0 && s < n_nodes && off[s + 1] > off[s] && !seen[s]) {
      seen[s] = 1;
      frontier.push_back(s);
    }
  }
  for (int32_t h = 0; h < k_hop && !frontier.empty(); ++h) {
    std::vector<int32_t> nxt;
    for (int32_t u : frontier)
      for (int64_t p = off[u]; p < off[u + 1]; ++p)
        if (!seen[nbr[p]]) {
          seen[nbr[p]] = 1;
          nxt.push_back(nbr[p]);
        }
    frontier.swap(nxt);
  }
  std::memcpy(expanded, seen.data(), static_cast<size_t>(n_nodes));

  // simple-path BFS between query-entity pairs
  std::fill(contributing, contributing + n_cands, 0);
  if (n_q < 2 || max_len < 2) return;
  for (int32_t a = 0; a < n_q; ++a) {
    for (int32_t b = a + 1; b < n_q; ++b) {
      const int32_t s = q_ents[a], t = q_ents[b];
      if (s < 0 || s >= n_nodes || t < 0 || t >= n_nodes) continue;
      if (off[s + 1] == off[s]) continue;  // src not in graph
      std::deque<std::vector<int32_t>> q;
      q.push_back({s});
      int32_t found = 0;
      int64_t expansions = 0;  // safety valve; Python has none and would hang
      while (!q.empty() && found < per_pair_cap && expansions < 2000000) {
        std::vector<int32_t> path = std::move(q.front());
        q.pop_front();
        if (static_cast<int32_t>(path.size()) > max_len) continue;
        const int32_t u = path.back();
        if (u == t && path.size() > 1) {
          ++found;
          for (size_t i = 0; i + 1 < path.size(); ++i) {
            const int32_t x = path[i], y = path[i + 1];
            for (int64_t p = off[x]; p < off[x + 1]; ++p)
              if (nbr[p] == y) contributing[ecand[p]]++;
          }
          continue;
        }
        for (int64_t p = off[u]; p < off[u + 1]; ++p) {
          const int32_t v = nbr[p];
          ++expansions;
          if (std::find(path.begin(), path.end(), v) == path.end()) {
            std::vector<int32_t> np = path;
            np.push_back(v);
            q.push_back(std::move(np));
          }
        }
      }
    }
  }
}

}  // extern "C"
