// Minimal OpenSSL EVP shim for host compilation of the reference headers.
//
// The reference uses exactly this EVP surface (aes128_mmo.cuh:49-89,
// sha256.cuh:43-89, aes128_feistel.cuh:38-115):
//   - EVP_CIPHER_CTX_new/free, EVP_aes_128_ecb, EVP_EncryptInit_ex2,
//     EVP_CIPHER_CTX_set_padding, EVP_EncryptUpdate  (AES-128-ECB, 16B blocks)
//   - EVP_Digest with EVP_sha256
//
// Both algorithms are public standards: AES-128 is implemented with x86
// AES-NI intrinsics (requires -maes) and SHA-256 is the FIPS-180-4
// compression, so the *reference scheme logic* above this layer is exercised
// unmodified. The Python test suite independently cross-checks this shim's
// SHA-256 against hashlib and the AES against FIPS-197 vectors via the
// generated primitive golden vectors.
#pragma once
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <wmmintrin.h>

// ---------------------------------------------------------------------------
// AES-128-ECB via AES-NI
// ---------------------------------------------------------------------------

typedef struct evp_cipher_st {
  int dummy;
} EVP_CIPHER;

typedef struct evp_cipher_ctx_st {
  __m128i round_keys[11];
  int initialized;
} EVP_CIPHER_CTX;

static inline const EVP_CIPHER *EVP_aes_128_ecb(void) {
  static EVP_CIPHER c = {0};
  return &c;
}

static inline EVP_CIPHER_CTX *EVP_CIPHER_CTX_new(void) {
  EVP_CIPHER_CTX *ctx = (EVP_CIPHER_CTX *)calloc(1, sizeof(EVP_CIPHER_CTX));
  return ctx;
}

static inline void EVP_CIPHER_CTX_free(EVP_CIPHER_CTX *ctx) { free(ctx); }

static inline int EVP_CIPHER_CTX_set_padding(EVP_CIPHER_CTX *ctx, int pad) {
  (void)ctx;
  (void)pad;
  return 1;
}

#define FSS_SHIM_AES_EXPAND_STEP(rk, rc)                                   \
  do {                                                                     \
    __m128i tmp = _mm_aeskeygenassist_si128(rk, rc);                       \
    tmp = _mm_shuffle_epi32(tmp, 0xff);                                    \
    rk = _mm_xor_si128(rk, _mm_slli_si128(rk, 4));                         \
    rk = _mm_xor_si128(rk, _mm_slli_si128(rk, 4));                         \
    rk = _mm_xor_si128(rk, _mm_slli_si128(rk, 4));                         \
    rk = _mm_xor_si128(rk, tmp);                                           \
  } while (0)

static inline int EVP_EncryptInit_ex2(EVP_CIPHER_CTX *ctx, const EVP_CIPHER *cipher, const unsigned char *key,
    const unsigned char *iv, const void *params) {
  (void)cipher;
  (void)iv;
  (void)params;
  if (key == NULL) return 1;  // re-init keeping previous key (reference never does this)
  __m128i rk = _mm_loadu_si128((const __m128i *)key);
  ctx->round_keys[0] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x01); ctx->round_keys[1] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x02); ctx->round_keys[2] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x04); ctx->round_keys[3] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x08); ctx->round_keys[4] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x10); ctx->round_keys[5] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x20); ctx->round_keys[6] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x40); ctx->round_keys[7] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x80); ctx->round_keys[8] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x1b); ctx->round_keys[9] = rk;
  FSS_SHIM_AES_EXPAND_STEP(rk, 0x36); ctx->round_keys[10] = rk;
  ctx->initialized = 1;
  return 1;
}

static inline int EVP_EncryptUpdate(EVP_CIPHER_CTX *ctx, unsigned char *out, int *outl, const unsigned char *in,
    int inl) {
  if (!ctx->initialized || inl % 16 != 0) return 0;
  for (int off = 0; off < inl; off += 16) {
    __m128i b = _mm_loadu_si128((const __m128i *)(in + off));
    b = _mm_xor_si128(b, ctx->round_keys[0]);
    for (int r = 1; r < 10; ++r) b = _mm_aesenc_si128(b, ctx->round_keys[r]);
    b = _mm_aesenclast_si128(b, ctx->round_keys[10]);
    _mm_storeu_si128((__m128i *)(out + off), b);
  }
  *outl = inl;
  return 1;
}

// ---------------------------------------------------------------------------
// SHA-256 (FIPS 180-4)
// ---------------------------------------------------------------------------

typedef struct evp_md_st {
  int dummy;
} EVP_MD;

static inline const EVP_MD *EVP_sha256(void) {
  static EVP_MD m = {0};
  return &m;
}

static const uint32_t fss_shim_sha256_k[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1, 0x923f82a4, 0xab1c5ed5,
    0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174,
    0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967,
    0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208, 0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t fss_shim_rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

static inline void fss_shim_sha256_block(uint32_t h[8], const unsigned char *p) {
  uint32_t w[64];
  for (int i = 0; i < 16; ++i)
    w[i] = ((uint32_t)p[4 * i] << 24) | ((uint32_t)p[4 * i + 1] << 16) | ((uint32_t)p[4 * i + 2] << 8) |
           (uint32_t)p[4 * i + 3];
  for (int i = 16; i < 64; ++i) {
    uint32_t s0 = fss_shim_rotr(w[i - 15], 7) ^ fss_shim_rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
    uint32_t s1 = fss_shim_rotr(w[i - 2], 17) ^ fss_shim_rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
    w[i] = w[i - 16] + s0 + w[i - 7] + s1;
  }
  uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5], g = h[6], hh = h[7];
  for (int i = 0; i < 64; ++i) {
    uint32_t s1 = fss_shim_rotr(e, 6) ^ fss_shim_rotr(e, 11) ^ fss_shim_rotr(e, 25);
    uint32_t ch = (e & f) ^ (~e & g);
    uint32_t t1 = hh + s1 + ch + fss_shim_sha256_k[i] + w[i];
    uint32_t s0 = fss_shim_rotr(a, 2) ^ fss_shim_rotr(a, 13) ^ fss_shim_rotr(a, 22);
    uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
    uint32_t t2 = s0 + maj;
    hh = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
  }
  h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
}

static inline int EVP_Digest(const void *data, size_t count, unsigned char *md, unsigned int *size, const EVP_MD *type,
    void *impl) {
  (void)type;
  (void)impl;
  uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a, 0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
  const unsigned char *p = (const unsigned char *)data;
  size_t n = count;
  while (n >= 64) {
    fss_shim_sha256_block(h, p);
    p += 64;
    n -= 64;
  }
  unsigned char tail[128];
  memset(tail, 0, sizeof(tail));
  memcpy(tail, p, n);
  tail[n] = 0x80;
  size_t tail_len = (n + 9 <= 64) ? 64 : 128;
  uint64_t bits = (uint64_t)count * 8;
  for (int i = 0; i < 8; ++i) tail[tail_len - 1 - i] = (unsigned char)(bits >> (8 * i));
  fss_shim_sha256_block(h, tail);
  if (tail_len == 128) fss_shim_sha256_block(h, tail + 64);
  for (int i = 0; i < 8; ++i) {
    md[4 * i] = (unsigned char)(h[i] >> 24);
    md[4 * i + 1] = (unsigned char)(h[i] >> 16);
    md[4 * i + 2] = (unsigned char)(h[i] >> 8);
    md[4 * i + 3] = (unsigned char)h[i];
  }
  if (size) *size = 32;
  return 1;
}
