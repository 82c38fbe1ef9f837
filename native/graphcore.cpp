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
