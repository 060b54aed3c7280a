// Native text engine — the host-side ingest hot loop in C++.
//
// The reference framework was pure Python end to end; at production ingest
// rates the per-chunk tokenize/count loop (reference hot loop 1,
// embedding_pipeline.py:88 per SURVEY §3.1) becomes the host bottleneck
// feeding the TPU encoder.  This engine implements the HashingTokenizer
// semantics (models/tokenizer.py) bit-exactly for ASCII input:
//
//   * lowercase
//   * runs of [a-z0-9] are words; any other non-space char is its own piece
//   * words longer than piece_len split into piece_len-sized "##" pieces
//   * id = first_regular + fnv1a(piece) % (vocab - first_regular)
//   * [CLS] ... [SEP], truncate to max_len-2, zero-pad, 0/1 mask
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C modular_rag_system_tpu/native   (or the auto-build in
// native/__init__.py).

#include <cstdint>
#include <cstring>
#include <string>

namespace {

constexpr int PAD_ID = 0;
constexpr int CLS_ID = 101;
constexpr int SEP_ID = 102;
constexpr uint32_t FNV_OFFSET = 0x811C9DC5u;
constexpr uint32_t FNV_PRIME = 0x01000193u;

inline uint32_t fnv1a(const char* data, int len) {
    uint32_t h = FNV_OFFSET;
    for (int i = 0; i < len; ++i) {
        h ^= static_cast<uint8_t>(data[i]);
        h *= FNV_PRIME;
    }
    return h;
}

inline int first_regular(int vocab_size) {
    // mirrors tokenizer._first_regular
    if (vocab_size > 2 * 999) return 999;
    return SEP_ID + 1;
}

inline bool is_word_char(char c) {
    return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}

inline bool is_space(char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v';
}

// Emit the hash id of `piece` (with optional "##" prefix) via callback-free
// inline hashing: prefix is hashed as literal bytes '#','#'.
inline int piece_id(const char* piece, int len, bool cont, int vocab_size) {
    const int first = first_regular(vocab_size);
    const int span = vocab_size - first;
    uint32_t h = FNV_OFFSET;
    if (cont) {
        h = (h ^ '#') * FNV_PRIME;
        h = (h ^ '#') * FNV_PRIME;
    }
    for (int i = 0; i < len; ++i) {
        h ^= static_cast<uint8_t>(piece[i]);
        h *= FNV_PRIME;
    }
    return first + static_cast<int>(h % static_cast<uint32_t>(span));
}

// Tokenize one lowercased ASCII string into ids; returns count of pieces
// produced (may exceed cap; only the first `cap` are stored).
int tokenize_pieces(const char* text, int text_len, int piece_len,
                    int vocab_size, int32_t* out, int cap) {
    int n = 0;
    int i = 0;
    while (i < text_len) {
        char c = text[i];
        if (is_space(c)) { ++i; continue; }
        if (is_word_char(c)) {
            int start = i;
            while (i < text_len && is_word_char(text[i])) ++i;
            int wlen = i - start;
            if (wlen <= piece_len) {
                if (n < cap) out[n] = piece_id(text + start, wlen, false, vocab_size);
                ++n;
            } else {
                if (n < cap) out[n] = piece_id(text + start, piece_len, false, vocab_size);
                ++n;
                for (int off = piece_len; off < wlen; off += piece_len) {
                    int plen = (off + piece_len <= wlen) ? piece_len : (wlen - off);
                    if (n < cap) out[n] = piece_id(text + start + off, plen, true, vocab_size);
                    ++n;
                }
            }
        } else {
            if (n < cap) out[n] = piece_id(text + i, 1, false, vocab_size);
            ++n;
            ++i;
        }
    }
    return n;
}

}  // namespace

extern "C" {

// Batch tokenization: texts are pre-lowercased ASCII, concatenated into
// `blob` with per-text (offset, length) pairs.  Outputs are row-major
// (n, max_len) int32 ids and masks.
void te_tokenize_batch(const char* blob, const int64_t* offsets,
                       const int64_t* lengths, int n_texts, int max_len,
                       int vocab_size, int piece_len, int32_t* ids_out,
                       int32_t* mask_out) {
    const int body_cap = max_len - 2;
    // scratch per text lives on the stack of this loop iteration
    for (int t = 0; t < n_texts; ++t) {
        int32_t* ids = ids_out + static_cast<int64_t>(t) * max_len;
        int32_t* mask = mask_out + static_cast<int64_t>(t) * max_len;
        std::memset(ids, 0, sizeof(int32_t) * max_len);
        std::memset(mask, 0, sizeof(int32_t) * max_len);
        int produced = tokenize_pieces(blob + offsets[t],
                                       static_cast<int>(lengths[t]), piece_len,
                                       vocab_size, ids + 1, body_cap);
        int body = produced < body_cap ? produced : body_cap;
        ids[0] = CLS_ID;
        ids[body + 1] = SEP_ID;
        for (int i = 0; i < body + 2; ++i) mask[i] = 1;
    }
    (void)PAD_ID;
}

// Token count (pieces + CLS + SEP) for the chunker's budget loop.
int64_t te_token_count(const char* text, int64_t len, int piece_len) {
    // count without storing: vocab_size irrelevant for counting
    int n = 0;
    int i = 0;
    int L = static_cast<int>(len);
    while (i < L) {
        char c = text[i];
        if (is_space(c)) { ++i; continue; }
        if (is_word_char(c)) {
            int start = i;
            while (i < L && is_word_char(text[i])) ++i;
            int wlen = i - start;
            if (wlen <= piece_len) {
                n += 1;
            } else {
                // first piece + ceil((wlen - piece_len) / piece_len) continuations
                n += 1 + (wlen - piece_len + piece_len - 1) / piece_len;
            }
        } else {
            ++n;
            ++i;
        }
    }
    return n + 2;
}

int te_abi_version() { return 1; }

}  // extern "C"
