// SipHash-2-4 batch kernel (csiphash replacement, reference:
// `recbole/inductive/dh_embedder.py:12,137` uses csiphash.siphash24).
//
// Computes, for B little-endian 8-byte messages (IDs) and K 128-bit keys,
// the full B×K matrix of 64-bit SipHash-2-4 digests. Exposed via a C ABI
// for ctypes; built with: c++ -O3 -shared -fPIC siphash.cpp -o libsiphash.so
//
// The DHE embedder calls this once per unique ID batch (and once over the
// whole item corpus at eval), so throughput matters: the inner loop is
// branch-free and the per-key state init is hoisted.

#include <cstdint>
#include <cstddef>

static inline uint64_t rotl(uint64_t x, int b) {
    return (x << b) | (x >> (64 - b));
}

#define SIPROUND        \
    do {                \
        v0 += v1;       \
        v1 = rotl(v1, 13); \
        v1 ^= v0;       \
        v0 = rotl(v0, 32); \
        v2 += v3;       \
        v3 = rotl(v3, 16); \
        v3 ^= v2;       \
        v0 += v3;       \
        v3 = rotl(v3, 21); \
        v3 ^= v0;       \
        v2 += v1;       \
        v1 = rotl(v1, 17); \
        v1 ^= v2;       \
        v2 = rotl(v2, 32); \
    } while (0)

extern "C" {

// msgs: B uint64 (the 8-byte little-endian IDs)
// keys: K pairs of uint64 (k0, k1), little-endian halves of the 16B key
// out:  B*K uint64, row-major (msg-major)
void siphash24_batch(const uint64_t* msgs, size_t n_msgs,
                     const uint64_t* keys, size_t n_keys,
                     uint64_t* out) {
    const uint64_t b_len = 8ULL << 56;  // message length byte (8) in top
    for (size_t k = 0; k < n_keys; ++k) {
        const uint64_t k0 = keys[2 * k];
        const uint64_t k1 = keys[2 * k + 1];
        const uint64_t i0 = 0x736f6d6570736575ULL ^ k0;
        const uint64_t i1 = 0x646f72616e646f6dULL ^ k1;
        const uint64_t i2 = 0x6c7967656e657261ULL ^ k0;
        const uint64_t i3 = 0x7465646279746573ULL ^ k1;
        for (size_t m = 0; m < n_msgs; ++m) {
            const uint64_t mi = msgs[m];
            uint64_t v0 = i0, v1 = i1, v2 = i2, v3 = i3;
            // one full 8-byte block
            v3 ^= mi;
            SIPROUND;
            SIPROUND;
            v0 ^= mi;
            // final block: only the length byte (no trailing bytes)
            v3 ^= b_len;
            SIPROUND;
            SIPROUND;
            v0 ^= b_len;
            // finalization
            v2 ^= 0xff;
            SIPROUND;
            SIPROUND;
            SIPROUND;
            SIPROUND;
            out[m * n_keys + k] = v0 ^ v1 ^ v2 ^ v3;
        }
    }
}

}  // extern "C"
