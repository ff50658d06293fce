// Native atomic-file reader: TSV parse + first-appearance token coding.
//
// The hot half of dataset construction is parsing multi-million-row
// .inter files and factorizing their token columns (pandas C engine +
// pd.factorize: ~35 s at 10M rows). This reader does both in one pass:
// token columns come back as int32 codes plus their unique strings in
// FIRST-APPEARANCE order — exactly pd.factorize's order, so the Python
// side can merge per-source vocabularies bit-identically
// (data/atomic.py native path; parity tests in tests/test_dataset.py).
//
// Scalar columns only (token / float). Files with *_seq columns take the
// pandas path. Empty token cells are counted so the wrapper can fall
// back to pandas (whose NaN semantics the remap preserves).
//
// C ABI (ctypes): parse → opaque handle → getters → free.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>
#include <cstdio>

namespace {

struct TokenCol {
    std::vector<int32_t> codes;
    std::vector<std::string> uniques;
    std::unordered_map<std::string, int32_t> map;
    int64_t empty_cells = 0;
};

struct FloatCol {
    std::vector<double> vals;
};

struct Parsed {
    int64_t n_rows = 0;
    std::vector<int> col_idx;    // physical column index per output col
    std::vector<int> col_type;   // 0 = token, 1 = float
    std::vector<TokenCol> tokens;  // parallel (entry unused for floats)
    std::vector<FloatCol> floats;
};

}  // namespace

namespace {

// Parse [s, end) rows into `out` (a per-thread Parsed with local token
// ids). Single-threaded worker reused across the thread fan-out.
void parse_range(Parsed* out, const char* s, const char* end, char sep,
                 int max_phys) {
    int n_cols = (int)out->col_idx.size();
    std::vector<const char*> starts(max_phys + 2);
    std::vector<const char*> ends(max_phys + 2);
    while (s < end) {
        const char* line_end = (const char*)memchr(s, '\n', end - s);
        if (!line_end) line_end = end;
        if (line_end == s) { s = line_end + 1; continue; }  // blank line

        int col = 0;
        const char* cs = s;
        for (const char* c = s; c <= line_end && col <= max_phys + 1; ++c) {
            if (c == line_end || *c == sep) {
                starts[col] = cs;
                ends[col] = (c > cs && c[-1] == '\r') ? c - 1 : c;
                cs = c + 1;
                ++col;
            }
        }
        for (int i = 0; i < n_cols; ++i) {
            int ci = out->col_idx[i];
            const char* vs = ci < col ? starts[ci] : line_end;
            const char* ve = ci < col ? ends[ci] : line_end;
            if (out->col_type[i] == 0) {
                TokenCol& tc = out->tokens[i];
                if (vs == ve) {
                    tc.empty_cells++;
                    tc.codes.push_back(-1);
                } else {
                    std::string tok(vs, ve - vs);
                    auto it = tc.map.find(tok);
                    int32_t code;
                    if (it == tc.map.end()) {
                        code = (int32_t)tc.uniques.size();
                        tc.map.emplace(tok, code);
                        tc.uniques.push_back(std::move(tok));
                    } else {
                        code = it->second;
                    }
                    tc.codes.push_back(code);
                }
            } else {
                if (vs == ve) {
                    out->floats[i].vals.push_back(std::nan(""));
                } else {
                    char* endp = nullptr;
                    std::string tmp(vs, ve - vs);
                    double v = std::strtod(tmp.c_str(), &endp);
                    if (endp == tmp.c_str()) v = std::nan("");
                    out->floats[i].vals.push_back(v);
                }
            }
        }
        out->n_rows++;
        s = line_end + 1;
    }
}

}  // namespace

extern "C" {

void* ar_parse(const char* path, int n_cols, const int* col_idx,
               const int* col_type, char sep) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string buf;
    buf.resize(size);
    if (size > 0 && std::fread(&buf[0], 1, size, f) != (size_t)size) {
        std::fclose(f);
        return nullptr;
    }
    std::fclose(f);

    auto* p = new Parsed();
    p->col_idx.assign(col_idx, col_idx + n_cols);
    p->col_type.assign(col_type, col_type + n_cols);
    p->tokens.resize(n_cols);
    p->floats.resize(n_cols);

    int max_phys = 0;
    for (int i = 0; i < n_cols; ++i)
        if (col_idx[i] > max_phys) max_phys = col_idx[i];

    const char* s = buf.data();
    const char* end = s + buf.size();
    // skip header line
    const char* nl = (const char*)memchr(s, '\n', end - s);
    if (!nl) { delete p; return nullptr; }
    s = nl + 1;

    // chunk at line boundaries and parse in parallel; per-chunk token
    // ids merge in CHUNK ORDER, which reproduces global
    // first-appearance coding exactly (a token's earliest occurrence is
    // in the earliest chunk that contains it)
    unsigned hw = std::thread::hardware_concurrency();
    size_t n_threads = std::max(1u, std::min(hw ? hw : 1u, 16u));
    if ((size_t)(end - s) < (size_t)1 << 22) n_threads = 1;  // small file
    std::vector<const char*> bounds;
    bounds.push_back(s);
    for (size_t t = 1; t < n_threads; ++t) {
        const char* guess = s + (end - s) * t / n_threads;
        const char* b = (const char*)memchr(
            guess, '\n', end - guess);
        bounds.push_back(b ? b + 1 : end);
    }
    bounds.push_back(end);
    std::sort(bounds.begin(), bounds.end());

    std::vector<Parsed> parts(n_threads);
    std::vector<std::thread> threads;
    for (size_t t = 0; t < n_threads; ++t) {
        parts[t].col_idx = p->col_idx;
        parts[t].col_type = p->col_type;
        parts[t].tokens.resize(n_cols);
        parts[t].floats.resize(n_cols);
        threads.emplace_back(parse_range, &parts[t], bounds[t],
                             bounds[t + 1], sep, max_phys);
    }
    for (auto& th : threads) th.join();

    for (size_t t = 0; t < n_threads; ++t)
        p->n_rows += parts[t].n_rows;
    for (int i = 0; i < n_cols; ++i) {
        if (p->col_type[i] == 0) {
            TokenCol& g = p->tokens[i];
            g.codes.reserve(p->n_rows);
            for (size_t t = 0; t < n_threads; ++t) {
                TokenCol& lc = parts[t].tokens[i];
                g.empty_cells += lc.empty_cells;
                // local-id → global-id (first-appearance across chunks)
                std::vector<int32_t> remap(lc.uniques.size());
                for (size_t j = 0; j < lc.uniques.size(); ++j) {
                    auto it = g.map.find(lc.uniques[j]);
                    if (it == g.map.end()) {
                        int32_t gid = (int32_t)g.uniques.size();
                        g.map.emplace(lc.uniques[j], gid);
                        g.uniques.push_back(std::move(lc.uniques[j]));
                        remap[j] = gid;
                    } else {
                        remap[j] = it->second;
                    }
                }
                for (int32_t c : lc.codes)
                    g.codes.push_back(c < 0 ? c : remap[c]);
            }
        } else {
            FloatCol& g = p->floats[i];
            g.vals.reserve(p->n_rows);
            for (size_t t = 0; t < n_threads; ++t) {
                auto& v = parts[t].floats[i].vals;
                g.vals.insert(g.vals.end(), v.begin(), v.end());
            }
        }
    }
    return p;
}

int64_t ar_num_rows(void* h) { return ((Parsed*)h)->n_rows; }

int64_t ar_token_empty(void* h, int col) {
    return ((Parsed*)h)->tokens[col].empty_cells;
}

void ar_token_codes(void* h, int col, int32_t* out) {
    auto& c = ((Parsed*)h)->tokens[col].codes;
    std::memcpy(out, c.data(), c.size() * sizeof(int32_t));
}

int64_t ar_uniques_count(void* h, int col) {
    return (int64_t)((Parsed*)h)->tokens[col].uniques.size();
}

int64_t ar_uniques_bytes(void* h, int col) {
    int64_t total = 0;
    for (auto& u : ((Parsed*)h)->tokens[col].uniques) total += u.size();
    return total;
}

// blob: concatenated unique strings; offsets: (count+1) int64 boundaries
void ar_uniques(void* h, int col, char* blob, int64_t* offsets) {
    int64_t off = 0;
    int64_t i = 0;
    for (auto& u : ((Parsed*)h)->tokens[col].uniques) {
        offsets[i++] = off;
        std::memcpy(blob + off, u.data(), u.size());
        off += (int64_t)u.size();
    }
    offsets[i] = off;
}

void ar_floats(void* h, int col, double* out) {
    auto& v = ((Parsed*)h)->floats[col].vals;
    std::memcpy(out, v.data(), v.size() * sizeof(double));
}

void ar_free(void* h) { delete (Parsed*)h; }

}  // extern "C"
