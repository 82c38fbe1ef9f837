// graphcore — native data core for kgc_gcn_tpu.
//
// Replaces the reference's Python text-parsing / vocab / graph-assembly path
// (reference data_loader.py:61-120) with C++: one pass over the three TSV
// triple files builds the interned entity/relation vocabularies (first-seen
// order, lowercased — matching the Python layer bit-for-bit) and the id
// triples per split; a second entry point builds the CSR-sorted half-graph
// arrays (dst-sort permutation, row pointers, reference degree norms).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image); the Python
// wrapper is kgc_gcn_tpu/utils/native.py and falls back to the pure-Python
// path when the shared library is unavailable.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Corpus {
    std::vector<std::string> entities;   // first-seen order
    std::vector<std::string> relations;
    std::unordered_map<std::string, int32_t> ent2id;
    std::unordered_map<std::string, int32_t> rel2id;
    std::vector<int32_t> triples[3];     // flat (s, r, o) per split
    std::string error;
};

int32_t intern(std::unordered_map<std::string, int32_t>& map,
               std::vector<std::string>& order, const std::string& key) {
    auto it = map.find(key);
    if (it != map.end()) return it->second;
    int32_t id = static_cast<int32_t>(order.size());
    map.emplace(key, id);
    order.push_back(key);
    return id;
}

void lower(std::string& s) {
    for (char& c : s) c = static_cast<char>(std::tolower(
        static_cast<unsigned char>(c)));
}

bool parse_file(Corpus* c, const char* path, int split) {
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        c->error = std::string("cannot open ") + path;
        return false;
    }
    std::string buf;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(static_cast<size_t>(size));
    if (size > 0 && std::fread(&buf[0], 1, buf.size(), f) != buf.size()) {
        std::fclose(f);
        c->error = std::string("short read on ") + path;
        return false;
    }
    std::fclose(f);

    std::vector<std::string> tok;
    std::string cur;
    size_t line_no = 0;
    size_t i = 0, n = buf.size();
    while (i <= n) {
        char ch = (i < n) ? buf[i] : '\n';
        if (ch == '\n' || ch == '\r') {
            if (!cur.empty()) { tok.push_back(cur); cur.clear(); }
            if (!tok.empty()) {
                ++line_no;
                if (tok.size() != 3) {
                    char msg[256];
                    std::snprintf(msg, sizeof msg,
                                  "%s: malformed line %zu (%zu fields)",
                                  path, line_no, tok.size());
                    c->error = msg;
                    return false;
                }
                lower(tok[0]); lower(tok[1]); lower(tok[2]);
                int32_t s = intern(c->ent2id, c->entities, tok[0]);
                int32_t r = intern(c->rel2id, c->relations, tok[1]);
                int32_t o = intern(c->ent2id, c->entities, tok[2]);
                auto& t = c->triples[split];
                t.push_back(s); t.push_back(r); t.push_back(o);
                tok.clear();
            }
        } else if (ch == '\t' || ch == ' ') {
            if (!cur.empty()) { tok.push_back(cur); cur.clear(); }
        } else {
            cur.push_back(ch);
        }
        ++i;
    }
    return true;
}

}  // namespace

extern "C" {

// ---- corpus loading ---------------------------------------------------------

void* gc_load_corpus(const char* train, const char* valid, const char* test) {
    auto* c = new Corpus();
    const char* paths[3] = {train, valid, test};
    for (int s = 0; s < 3; ++s) {
        if (!parse_file(c, paths[s], s)) return c;  // error recorded
    }
    return c;
}

const char* gc_error(void* h) {
    auto* c = static_cast<Corpus*>(h);
    return c->error.empty() ? nullptr : c->error.c_str();
}

int32_t gc_num_entities(void* h) {
    return static_cast<int32_t>(static_cast<Corpus*>(h)->entities.size());
}

int32_t gc_num_relations(void* h) {
    return static_cast<int32_t>(static_cast<Corpus*>(h)->relations.size());
}

int64_t gc_num_triples(void* h, int32_t split) {
    return static_cast<int64_t>(
        static_cast<Corpus*>(h)->triples[split].size() / 3);
}

// Copies the (n, 3) int32 triple array of a split into caller-owned memory.
void gc_copy_triples(void* h, int32_t split, int32_t* out) {
    auto& t = static_cast<Corpus*>(h)->triples[split];
    std::memcpy(out, t.data(), t.size() * sizeof(int32_t));
}

// Total bytes of the newline-joined vocab (incl. trailing NUL).
int64_t gc_vocab_bytes(void* h, int32_t which) {
    auto* c = static_cast<Corpus*>(h);
    auto& v = which == 0 ? c->entities : c->relations;
    int64_t n = 1;
    for (auto& s : v) n += static_cast<int64_t>(s.size()) + 1;
    return n;
}

// Newline-joined vocab strings, first-seen order.
void gc_copy_vocab(void* h, int32_t which, char* out) {
    auto* c = static_cast<Corpus*>(h);
    auto& v = which == 0 ? c->entities : c->relations;
    char* p = out;
    for (auto& s : v) {
        std::memcpy(p, s.data(), s.size());
        p += s.size();
        *p++ = '\n';
    }
    *p = '\0';
}

void gc_free(void* h) { delete static_cast<Corpus*>(h); }

// ---- CSR half-graph assembly ------------------------------------------------
// Given (src, dst) of one direction half, fills: the dst-sort permutation,
// CSR row pointers, and the reference degree norm deg(row)^-1/2*deg(col)^-1/2
// with degree counted over row occurrences only (reference model.py:72-80).
void gc_build_half(const int32_t* src, const int32_t* dst, int64_t e,
                   int32_t n_ent, int32_t* perm_out, int32_t* indptr_out,
                   float* norm_out) {
    std::vector<int64_t> count(static_cast<size_t>(n_ent) + 1, 0);
    for (int64_t i = 0; i < e; ++i) count[dst[i] + 1]++;
    std::partial_sum(count.begin(), count.end(), count.begin());
    for (int32_t r = 0; r <= n_ent; ++r)
        indptr_out[r] = static_cast<int32_t>(count[r]);

    // stable counting sort by dst
    std::vector<int64_t> cursor(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < e; ++i)
        perm_out[cursor[dst[i]]++] = static_cast<int32_t>(i);

    // degree over row (= src) occurrences, indexed at both endpoints
    std::vector<float> dinv(n_ent, 0.0f);
    for (int64_t i = 0; i < e; ++i) dinv[src[i]] += 1.0f;
    for (int32_t v = 0; v < n_ent; ++v)
        dinv[v] = dinv[v] > 0.0f ? 1.0f / std::sqrt(dinv[v]) : 0.0f;
    for (int64_t i = 0; i < e; ++i) norm_out[i] = dinv[src[i]] * dinv[dst[i]];
}

}  // extern "C"

// ---- sr2o grouping ----------------------------------------------------------
// The reference's label-map build (data_loader.py:80-96) walks every triple
// twice — (s, r)→o and (o, r+R)→s — into a dict-of-dicts with first-seen key
// order and first-seen value dedup.  This is its single-pass equivalent over
// the composite key k = s*2R + r: open-addressing hash tables for key→group
// and (group, value) dedup, CSR output in first-seen group order.  At FB15k
// scale this replaces ~2.3 s of int64 numpy sorts with one ~50 ms pass.

namespace {

struct GroupResult {
    std::vector<int64_t> keys;       // (G,) composite s*2R + r, first-seen
    std::vector<int32_t> values;     // (V,) grouped, first-seen-deduped
    std::vector<int64_t> offsets;    // (G+1,)
};

inline uint64_t mix64(uint64_t x) {   // splitmix64 finalizer
    x += 0x9e3779b97f4a7c15ULL;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
    return x ^ (x >> 31);
}

// open-addressing map from int64 key -> int32 slot id (insert-only)
struct FlatMap {
    std::vector<int64_t> keys;
    std::vector<int32_t> vals;
    uint64_t mask;
    explicit FlatMap(size_t n) {
        size_t cap = 16;
        while (cap < 2 * n + 1) cap <<= 1;
        keys.assign(cap, -1);
        vals.assign(cap, -1);
        mask = cap - 1;
    }
    // returns existing id or -1 after positioning; caller inserts via slot
    int32_t get_or_insert(int64_t k, int32_t next_id, bool* inserted) {
        uint64_t h = mix64(static_cast<uint64_t>(k)) & mask;
        while (true) {
            if (keys[h] == -1) {
                keys[h] = k;
                vals[h] = next_id;
                *inserted = true;
                return next_id;
            }
            if (keys[h] == k) {
                *inserted = false;
                return vals[h];
            }
            h = (h + 1) & mask;
        }
    }
};

}  // namespace

extern "C" {

// tri: (n, 3) int64 id triples (row-major). num_rel = R (forward count).
// Walks the (s, r)->o then (o, r+R)->s stream per triple; fills `out` with
// the grouping after ALL n triples and, when snapshot != nullptr, also fills
// it with the grouping as of the first n_snapshot triples (the reference's
// sr2o_train snapshot, data_loader.py:88-90) — one hash pass for both.
static void group_sr2o_impl(const int64_t* tri, int64_t n, int32_t num_rel,
                            int64_t n_snapshot, GroupResult* out,
                            GroupResult* snapshot) {
    const int64_t two_r = 2 * static_cast<int64_t>(num_rel);
    if (n == 0) {
        out->offsets.push_back(0);
        if (snapshot) snapshot->offsets.push_back(0);
        return;
    }
    FlatMap key2gid(static_cast<size_t>(2 * n));
    FlatMap pairseen(static_cast<size_t>(2 * n));
    std::vector<int32_t> kept_gid;
    std::vector<int32_t> kept_val;
    kept_gid.reserve(static_cast<size_t>(2 * n));
    kept_val.reserve(static_cast<size_t>(2 * n));
    std::vector<int64_t> counts;
    int32_t next_gid = 0;

    auto visit = [&](int64_t key, int32_t val) {
        bool ins;
        int32_t gid = key2gid.get_or_insert(key, next_gid, &ins);
        if (ins) {
            ++next_gid;
            out->keys.push_back(key);
            counts.push_back(0);
        }
        // (gid, val) dedup: gid < 2n < 2^31, val is an int32 entity id
        int64_t pid = (static_cast<int64_t>(gid) << 31)
                      | static_cast<int64_t>(val);
        pairseen.get_or_insert(pid, 0, &ins);
        if (ins) {
            kept_gid.push_back(gid);
            kept_val.push_back(val);
            ++counts[gid];
        }
    };

    auto materialize = [&](GroupResult* r) {
        const size_t g = counts.size();
        r->offsets.assign(g + 1, 0);
        for (size_t i = 0; i < g; ++i)
            r->offsets[i + 1] = r->offsets[i] + counts[i];
        r->values.resize(kept_val.size());
        std::vector<int64_t> cursor(r->offsets.begin(), r->offsets.end() - 1);
        for (size_t i = 0; i < kept_val.size(); ++i)
            r->values[cursor[kept_gid[i]]++] = kept_val[i];
    };

    for (int64_t i = 0; i < n; ++i) {
        if (snapshot && i == n_snapshot) {
            snapshot->keys = out->keys;
            materialize(snapshot);
        }
        const int64_t s = tri[3 * i], r = tri[3 * i + 1], o = tri[3 * i + 2];
        visit(s * two_r + r, static_cast<int32_t>(o));
        visit(o * two_r + (r + num_rel), static_cast<int32_t>(s));
    }
    if (snapshot && n_snapshot >= n) {   // snapshot at/after the end
        snapshot->keys = out->keys;
        materialize(snapshot);
    }
    materialize(out);
}

void* gc_group_sr2o(const int64_t* tri, int64_t n, int32_t num_rel) {
    auto* res = new GroupResult();
    group_sr2o_impl(tri, n, num_rel, -1, res, nullptr);
    return res;
}

// Both groupings in one pass: [0] = snapshot after the first n_train
// triples (train-only sr2o), [1] = all n triples. Access the halves with
// gc_group2_get + the gc_group_{n,nvals,copy} accessors; free the PAIR with
// gc_group2_free only.
void* gc_group_sr2o_splits(const int64_t* tri, int64_t n, int64_t n_train,
                           int32_t num_rel) {
    auto* pair = new GroupResult[2];
    group_sr2o_impl(tri, n, num_rel, n_train, &pair[1], &pair[0]);
    return pair;
}

void* gc_group2_get(void* h, int32_t which) {
    return &static_cast<GroupResult*>(h)[which];
}

void gc_group2_free(void* h) { delete[] static_cast<GroupResult*>(h); }

int64_t gc_group_n(void* h) {
    return static_cast<int64_t>(static_cast<GroupResult*>(h)->keys.size());
}

int64_t gc_group_nvals(void* h) {
    return static_cast<int64_t>(static_cast<GroupResult*>(h)->values.size());
}

void gc_group_copy(void* h, int64_t* keys_out, int32_t* values_out,
                   int64_t* offsets_out) {
    auto* r = static_cast<GroupResult*>(h);
    if (!r->keys.empty())
        std::memcpy(keys_out, r->keys.data(),
                    r->keys.size() * sizeof(int64_t));
    if (!r->values.empty())
        std::memcpy(values_out, r->values.data(),
                    r->values.size() * sizeof(int32_t));
    if (!r->offsets.empty())
        std::memcpy(offsets_out, r->offsets.data(),
                    r->offsets.size() * sizeof(int64_t));
}

void gc_group_free(void* h) { delete static_cast<GroupResult*>(h); }

}  // extern "C"

// ---- locality ordering --------------------------------------------------
// Deterministic label propagation (LPA) over the UNDIRECTED train graph,
// communities emitted contiguously (largest first).  Contiguous ranges of
// the resulting order become the entity shards of the multi-chip schedules
// (kgc_gcn_tpu/parallel/boundary.py), so cross-shard edges — and with them
// the boundary exchange volume — shrink by the graph's community structure.
// LPA (not BFS/Cuthill-McKee): BFS cannot recover clusters through noise —
// a 10% cross-edge fraction pulls foreign vertices into the frontier and
// interleaves communities (measured, BENCH_NOTES round 3); majority-label
// propagation is robust to it.  The sweep is sequential in id order with a
// smallest-label tie-break, so the result is deterministic and equal to the
// numpy twin (kgc_gcn_tpu/data/partition.py, pinned in tests).

extern "C" {

void gc_locality_order(const int32_t* src, const int32_t* dst, int64_t e,
                       int32_t n_ent, int32_t* order_out) {
    // undirected CSR adjacency
    std::vector<int64_t> indptr(static_cast<size_t>(n_ent) + 1, 0);
    for (int64_t i = 0; i < e; ++i) {
        indptr[src[i] + 1]++;
        indptr[dst[i] + 1]++;
    }
    std::partial_sum(indptr.begin(), indptr.end(), indptr.begin());
    std::vector<int32_t> adj(static_cast<size_t>(2 * e));
    {
        std::vector<int64_t> cur(indptr.begin(), indptr.end() - 1);
        for (int64_t i = 0; i < e; ++i) {
            adj[cur[src[i]]++] = dst[i];
            adj[cur[dst[i]]++] = src[i];
        }
    }

    // asynchronous LPA, sequential id-order sweeps, <= 10 iterations
    std::vector<int32_t> label(n_ent);
    std::iota(label.begin(), label.end(), 0);
    std::vector<int32_t> nbuf;
    for (int iter = 0; iter < 10; ++iter) {
        bool changed = false;
        for (int32_t v = 0; v < n_ent; ++v) {
            const int64_t lo = indptr[v], hi = indptr[v + 1];
            if (hi == lo) continue;
            nbuf.clear();
            for (int64_t j = lo; j < hi; ++j) nbuf.push_back(label[adj[j]]);
            std::sort(nbuf.begin(), nbuf.end());
            // most frequent neighbor label; ties -> smallest label
            int32_t best = nbuf[0];
            int64_t bc = 1, cc = 1;
            for (size_t j = 1; j < nbuf.size(); ++j) {
                if (nbuf[j] == nbuf[j - 1]) {
                    if (++cc > bc) { bc = cc; best = nbuf[j]; }
                } else {
                    cc = 1;
                }
            }
            if (best != label[v]) { label[v] = best; changed = true; }
        }
        if (!changed) break;
    }

    // order: communities by (size desc, label asc), vertices by id asc
    std::vector<int64_t> csize(n_ent, 0);
    for (int32_t v = 0; v < n_ent; ++v) csize[label[v]]++;
    std::iota(order_out, order_out + n_ent, 0);
    std::stable_sort(order_out, order_out + n_ent,
                     [&](int32_t a, int32_t b) {
                         const int64_t sa = csize[label[a]],
                                       sb = csize[label[b]];
                         if (sa != sb) return sa > sb;
                         if (label[a] != label[b]) return label[a] < label[b];
                         return a < b;
                     });
}

}  // extern "C"
