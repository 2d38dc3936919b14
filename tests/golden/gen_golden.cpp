// Golden-vector generator: compiles the ACTUAL reference implementation
// (/root/reference/include/fss/*.cuh) host-side via the shim headers in
// ./shim and emits JSON vectors for every scheme and primitive, so the
// fss_tpu test suite can assert byte equality against keys/outputs produced
// by the reference's own code (not a transcription of it).
//
// Build/run: make -C tests/golden  (see tests/golden/Makefile).
// Output: tests/golden/vectors/*.json (checked into the repo).
//
// Input material is derived from a splitmix64 stream but every input is
// recorded in the JSON, so consumers never re-derive anything.
#include <algorithm>
#include <cassert>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include <fss/dpf.cuh>
#include <fss/dcf.cuh>
#include <fss/half_tree_dpf.cuh>
#include <fss/grotto_dcf.cuh>
#include <fss/vdpf.cuh>
#include <fss/vdmpf.cuh>
#include <fss/cuckoo_hash.cuh>
#include <fss/group/bytes.cuh>
#include <fss/group/uint.cuh>
#include <fss/prg/chacha.cuh>
#include <fss/prg/aes128_mmo.cuh>
#include <fss/prg/aes128_mmo_raw.cuh>
#include <fss/prg/aes128_mmo_soft.cuh>
#include <fss/hash/sha256.cuh>
#include <fss/hash/blake3.cuh>
#include <fss/prp/aes128_feistel.cuh>

namespace {

// ---------------------------------------------------------------------------
// Deterministic input stream + JSON helpers
// ---------------------------------------------------------------------------

uint64_t g_sm_state = 0x9e3779b97f4a7c15ULL;

uint64_t splitmix64() {
  uint64_t z = (g_sm_state += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

int4 rand_int4() {
  uint64_t a = splitmix64(), b = splitmix64();
  return {static_cast<int>(a), static_cast<int>(a >> 32), static_cast<int>(b), static_cast<int>(b >> 32)};
}

std::string hex_bytes(const void *p, size_t n) {
  static const char *digits = "0123456789abcdef";
  const auto *b = static_cast<const unsigned char *>(p);
  std::string out(2 * n, '0');
  for (size_t i = 0; i < n; ++i) {
    out[2 * i] = digits[b[i] >> 4];
    out[2 * i + 1] = digits[b[i] & 15];
  }
  return out;
}

std::string hex_int4(int4 v) { return hex_bytes(&v, 16); }

std::string hex_u128(__uint128_t v) {
  char buf[40];
  uint64_t hi = static_cast<uint64_t>(v >> 64), lo = static_cast<uint64_t>(v);
  if (hi) snprintf(buf, sizeof(buf), "0x%" PRIx64 "%016" PRIx64, hi, lo);
  else snprintf(buf, sizeof(buf), "0x%" PRIx64, lo);
  return buf;
}

// SHA-256 digest (via the shim's EVP_Digest) of a raw byte buffer, for
// compact eval_all assertions. Python recomputes with hashlib.
std::string digest_hex(const void *p, size_t n) {
  unsigned char md[32];
  EVP_Digest(p, n, md, nullptr, EVP_sha256(), nullptr);
  return hex_bytes(md, 32);
}

// Minimal JSON writer: we only emit objects/arrays of strings and ints.
struct Json {
  FILE *f;
  bool first = true;

  explicit Json(const std::string &path) {
    f = fopen(path.c_str(), "w");
    assert(f);
  }
  void close() {
    fclose(f);
  }
  void sep() {
    if (!first) fputs(",\n", f);
    first = false;
  }
  void raw(const char *s) { fputs(s, f); }
  void open_obj() { fputs("{\n", f); first = true; }
  void close_obj() { fputs("\n}", f); }
  void open_arr(const char *key) {
    sep();
    fprintf(f, "\"%s\": [\n", key);
    first = true;
  }
  void close_arr() {
    fputs("\n]", f);
    first = false;
  }
  void kv(const char *key, const std::string &val) {
    sep();
    fprintf(f, "\"%s\": \"%s\"", key, val.c_str());
  }
  void kv(const char *key, long long val) {
    sep();
    fprintf(f, "\"%s\": %lld", key, val);
  }
  void kv_strs(const char *key, const std::vector<std::string> &vals) {
    sep();
    fprintf(f, "\"%s\": [", key);
    for (size_t i = 0; i < vals.size(); ++i) fprintf(f, "%s\"%s\"", i ? ", " : "", vals[i].c_str());
    fputs("]", f);
  }
  void item_obj_open() {
    sep();
    fputs("{\n", f);
    first = true;
  }
  void item_obj_close() {
    fputs("\n}", f);
    first = false;
  }
};

// Serialize one 32B correction word as 8 u32 words, the binding wire format
// (fss_crypto/_csrc/dpf_binding_impl.cuh:45-51 writes Cw structs into a
// zero-initialized (n+1, 8) int32 tensor).
template <typename Cw>
std::string row_s_flag(const Cw &cw, bool flag) {
  uint32_t row[8] = {0};
  memcpy(row, &cw.s, 16);
  row[4] = flag ? 1u : 0u;
  return hex_bytes(row, 32);
}

std::string row_s_v(const int4 &s, const int4 &v) {
  uint32_t row[8];
  memcpy(row, &s, 16);
  memcpy(row + 4, &v, 16);
  return hex_bytes(row, 32);
}

// ---------------------------------------------------------------------------
// PRG/hash factory plumbing (one place that knows constructor shapes)
// ---------------------------------------------------------------------------

struct Material {
  int nonce[2];
  unsigned char aes_keys[4][16];
  int4 hash_key;     // Sha256 key / HalfTree hash_key
  int4 blake3_iv[2];
};

Material fresh_material() {
  Material m;
  uint64_t n = splitmix64();
  m.nonce[0] = static_cast<int>(n);
  m.nonce[1] = static_cast<int>(n >> 32);
  for (int k = 0; k < 4; ++k)
    for (int i = 0; i < 16; ++i) m.aes_keys[k][i] = static_cast<unsigned char>(splitmix64());
  m.hash_key = rand_int4();
  m.blake3_iv[0] = rand_int4();
  m.blake3_iv[1] = rand_int4();
  return m;
}

void emit_material(Json &j, const Material &m) {
  j.kv("nonce_lo", static_cast<long long>(static_cast<uint32_t>(m.nonce[0])));
  j.kv("nonce_hi", static_cast<long long>(static_cast<uint32_t>(m.nonce[1])));
  std::vector<std::string> keys;
  for (int k = 0; k < 4; ++k) keys.push_back(hex_bytes(m.aes_keys[k], 16));
  j.kv_strs("aes_keys", keys);
  j.kv("hash_key", hex_int4(m.hash_key));
  j.kv_strs("blake3_iv", {hex_int4(m.blake3_iv[0]), hex_int4(m.blake3_iv[1])});
}

template <int mul>
fss::prg::Aes128Mmo<mul> make_mmo(const Material &m, cuda::std::array<EVP_CIPHER_CTX *, mul> &ctxs) {
  const unsigned char *keys[mul];
  for (int i = 0; i < mul; ++i) keys[i] = m.aes_keys[i];
  ctxs = fss::prg::Aes128Mmo<mul>::CreateCtxs(keys);
  return fss::prg::Aes128Mmo<mul>(cuda::std::span<EVP_CIPHER_CTX *, mul>(ctxs));
}

// ---------------------------------------------------------------------------
// DPF / DCF / Half-Tree / Grotto cases
// ---------------------------------------------------------------------------

template <int in_bits, typename Group, typename Prg, typename In>
void dpf_case(Json &j, const char *prg_name, const char *group_name, Prg prg, const Material &m, __uint128_t alpha,
    const std::vector<__uint128_t> &xs) {
  using Dpf = fss::Dpf<in_bits, Group, Prg, In>;
  Dpf dpf{prg};

  int4 s0s[2] = {rand_int4(), rand_int4()};
  int4 beta = fss::util::SetLsb(rand_int4(), false);

  std::vector<typename Dpf::Cw> cws(in_bits + 1);
  dpf.Gen(cws.data(), s0s, static_cast<In>(alpha), beta);

  j.item_obj_open();
  j.kv("scheme", "dpf");
  j.kv("prg", prg_name);
  j.kv("group", group_name);
  j.kv("in_bits", in_bits);
  emit_material(j, m);
  j.kv_strs("s0s", {hex_int4(s0s[0]), hex_int4(s0s[1])});
  j.kv("alpha", hex_u128(alpha));
  j.kv("beta", hex_int4(beta));
  std::vector<std::string> rows;
  for (int i = 0; i <= in_bits; ++i) rows.push_back(row_s_flag(cws[i], i < in_bits ? cws[i].tr : false));
  j.kv_strs("cws", rows);

  std::vector<std::string> xs_hex, y0s, y1s;
  for (auto x : xs) {
    xs_hex.push_back(hex_u128(x));
    y0s.push_back(hex_int4(dpf.Eval(false, s0s[0], cws.data(), static_cast<In>(x))));
    y1s.push_back(hex_int4(dpf.Eval(true, s0s[1], cws.data(), static_cast<In>(x))));
  }
  j.kv_strs("xs", xs_hex);
  j.kv_strs("ys0", y0s);
  j.kv_strs("ys1", y1s);

  if constexpr (in_bits <= 16) {
    size_t n = size_t(1) << in_bits;
    std::vector<int4> ys(n);
    dpf.EvalAll(false, s0s[0], cws.data(), ys.data());
    j.kv("eval_all_digest0", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_head0", hex_bytes(ys.data(), (n < 4 ? n : 4) * 16));
    dpf.EvalAll(true, s0s[1], cws.data(), ys.data());
    j.kv("eval_all_digest1", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_head1", hex_bytes(ys.data(), (n < 4 ? n : 4) * 16));
  }
  j.item_obj_close();
}

template <int in_bits, typename Group, typename Prg, fss::DcfPred pred, typename In>
void dcf_case(Json &j, const char *prg_name, const char *group_name, Prg prg, const Material &m, __uint128_t alpha,
    const std::vector<__uint128_t> &xs) {
  using Dcf = fss::Dcf<in_bits, Group, Prg, In, pred>;
  Dcf dcf{prg};

  int4 s0s[2] = {rand_int4(), rand_int4()};
  int4 beta = fss::util::SetLsb(rand_int4(), false);

  std::vector<typename Dcf::Cw> cws(in_bits + 1);
  dcf.Gen(cws.data(), s0s, static_cast<In>(alpha), beta);

  j.item_obj_open();
  j.kv("scheme", "dcf");
  j.kv("pred", pred == fss::DcfPred::kLt ? "lt" : "gt");
  j.kv("prg", prg_name);
  j.kv("group", group_name);
  j.kv("in_bits", in_bits);
  emit_material(j, m);
  j.kv_strs("s0s", {hex_int4(s0s[0]), hex_int4(s0s[1])});
  j.kv("alpha", hex_u128(alpha));
  j.kv("beta", hex_int4(beta));
  std::vector<std::string> rows;
  for (int i = 0; i <= in_bits; ++i) rows.push_back(row_s_v(cws[i].s, cws[i].v));
  j.kv_strs("cws", rows);

  std::vector<std::string> xs_hex, y0s, y1s;
  for (auto x : xs) {
    xs_hex.push_back(hex_u128(x));
    y0s.push_back(hex_int4(dcf.Eval(false, s0s[0], cws.data(), static_cast<In>(x))));
    y1s.push_back(hex_int4(dcf.Eval(true, s0s[1], cws.data(), static_cast<In>(x))));
  }
  j.kv_strs("xs", xs_hex);
  j.kv_strs("ys0", y0s);
  j.kv_strs("ys1", y1s);

  if constexpr (in_bits <= 16) {
    size_t n = size_t(1) << in_bits;
    std::vector<int4> ys(n);
    dcf.EvalAll(false, s0s[0], cws.data(), ys.data());
    j.kv("eval_all_digest0", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_head0", hex_bytes(ys.data(), (n < 4 ? n : 4) * 16));
    dcf.EvalAll(true, s0s[1], cws.data(), ys.data());
    j.kv("eval_all_digest1", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_head1", hex_bytes(ys.data(), (n < 4 ? n : 4) * 16));
  }
  j.item_obj_close();
}

template <int in_bits, typename Group, typename Prg, typename In>
void half_tree_case(Json &j, const char *prg_name, const char *group_name, Prg prg, const Material &m,
    __uint128_t alpha, const std::vector<__uint128_t> &xs) {
  using Ht = fss::HalfTreeDpf<in_bits, Group, Prg, In>;
  Ht ht{prg, m.hash_key};

  int4 s0s[2] = {rand_int4(), rand_int4()};
  int4 beta = fss::util::SetLsb(rand_int4(), false);

  std::vector<typename Ht::Cw> cws(in_bits);
  int4 ocw;
  ht.Gen(cws.data(), ocw, s0s, static_cast<In>(alpha), beta);

  j.item_obj_open();
  j.kv("scheme", "half_tree");
  j.kv("prg", prg_name);
  j.kv("group", group_name);
  j.kv("in_bits", in_bits);
  emit_material(j, m);
  j.kv_strs("s0s", {hex_int4(s0s[0]), hex_int4(s0s[1])});
  j.kv("alpha", hex_u128(alpha));
  j.kv("beta", hex_int4(beta));
  j.kv("ocw", hex_int4(ocw));
  std::vector<std::string> rows;
  for (int i = 0; i < in_bits; ++i) rows.push_back(row_s_flag(cws[i], cws[i].extra));
  j.kv_strs("cws", rows);

  std::vector<std::string> xs_hex, y0s, y1s;
  for (auto x : xs) {
    xs_hex.push_back(hex_u128(x));
    y0s.push_back(hex_int4(ht.Eval(false, s0s[0], cws.data(), ocw, static_cast<In>(x))));
    y1s.push_back(hex_int4(ht.Eval(true, s0s[1], cws.data(), ocw, static_cast<In>(x))));
  }
  j.kv_strs("xs", xs_hex);
  j.kv_strs("ys0", y0s);
  j.kv_strs("ys1", y1s);

  if constexpr (in_bits <= 16) {
    size_t n = size_t(1) << in_bits;
    std::vector<int4> ys(n);
    ht.EvalAll(false, s0s[0], cws.data(), ocw, ys.data());
    j.kv("eval_all_digest0", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_head0", hex_bytes(ys.data(), (n < 4 ? n : 4) * 16));
    ht.EvalAll(true, s0s[1], cws.data(), ocw, ys.data());
    j.kv("eval_all_digest1", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_head1", hex_bytes(ys.data(), (n < 4 ? n : 4) * 16));
  }
  j.item_obj_close();
}

template <int in_bits, typename Prg, typename In>
void grotto_case(Json &j, const char *prg_name, Prg prg, const Material &m, __uint128_t alpha,
    const std::vector<__uint128_t> &xs) {
  using Grotto = fss::GrottoDcf<in_bits, Prg, In>;
  Grotto grotto{prg};

  int4 s0s[2] = {rand_int4(), rand_int4()};
  std::vector<typename Grotto::Cw> cws(in_bits + 1);
  grotto.Gen(cws.data(), s0s, static_cast<In>(alpha));

  j.item_obj_open();
  j.kv("scheme", "grotto");
  j.kv("prg", prg_name);
  j.kv("in_bits", in_bits);
  emit_material(j, m);
  j.kv_strs("s0s", {hex_int4(s0s[0]), hex_int4(s0s[1])});
  j.kv("alpha", hex_u128(alpha));
  std::vector<std::string> rows;
  for (int i = 0; i <= in_bits; ++i) rows.push_back(row_s_flag(cws[i], i < in_bits ? cws[i].tr : false));
  j.kv_strs("cws", rows);

  constexpr size_t N = size_t(1) << in_bits;
  std::vector<bool> p0(2 * N - 1), p1(2 * N - 1);
  // ParityTree wants raw bool*; vector<bool> is packed, so use arrays.
  std::vector<char> buf0(2 * N - 1), buf1(2 * N - 1);
  typename Grotto::ParityTree pt0{reinterpret_cast<bool *>(buf0.data()), false};
  typename Grotto::ParityTree pt1{reinterpret_cast<bool *>(buf1.data()), true};
  grotto.Preprocess(pt0, s0s[0], cws.data());
  grotto.Preprocess(pt1, s0s[1], cws.data());

  std::vector<std::string> xs_hex, y0s, y1s;
  for (auto x : xs) {
    xs_hex.push_back(hex_u128(x));
    y0s.push_back(Grotto::Eval(pt0, static_cast<In>(x)) ? "1" : "0");
    y1s.push_back(Grotto::Eval(pt1, static_cast<In>(x)) ? "1" : "0");
  }
  j.kv_strs("xs", xs_hex);
  j.kv_strs("ys0", y0s);
  j.kv_strs("ys1", y1s);

  std::vector<unsigned char> ys(N);
  std::vector<char> bbuf(N);
  grotto.EvalAll(false, s0s[0], cws.data(), reinterpret_cast<bool *>(bbuf.data()));
  for (size_t i = 0; i < N; ++i) ys[i] = bbuf[i] ? 1 : 0;
  j.kv("eval_all_digest0", digest_hex(ys.data(), N));
  j.kv("eval_all_head0", hex_bytes(ys.data(), 32));
  grotto.EvalAll(true, s0s[1], cws.data(), reinterpret_cast<bool *>(bbuf.data()));
  for (size_t i = 0; i < N; ++i) ys[i] = bbuf[i] ? 1 : 0;
  j.kv("eval_all_digest1", digest_hex(ys.data(), N));
  j.kv("eval_all_head1", hex_bytes(ys.data(), 32));
  j.item_obj_close();
}

// ---------------------------------------------------------------------------
// VDPF / VDMPF cases
// ---------------------------------------------------------------------------

template <int in_bits, typename Group, typename Prg, typename XorHash, typename Hash, typename In>
void vdpf_case(Json &j, const char *prg_name, const char *hash_name, const char *group_name, Prg prg,
    XorHash xor_hash, Hash hash, const Material &m, __uint128_t alpha, const std::vector<__uint128_t> &xs) {
  using Vdpf = fss::Vdpf<in_bits, Group, Prg, XorHash, Hash, In>;
  Vdpf vdpf{prg, xor_hash, hash};

  int4 beta = fss::util::SetLsb(rand_int4(), false);
  std::vector<typename Vdpf::Cw> cws(in_bits);
  cuda::std::array<int4, 4> cs;
  int4 ocw;
  int4 s0s[2];
  int retries = 0;
  for (;;) {
    s0s[0] = rand_int4();
    s0s[1] = rand_int4();
    int ret = vdpf.Gen(cws.data(), cs, ocw, cuda::std::span<const int4, 2>(s0s, 2), static_cast<In>(alpha), beta);
    if (ret == 0) break;
    ++retries;
    assert(retries < 64);
  }

  j.item_obj_open();
  j.kv("scheme", "vdpf");
  j.kv("prg", prg_name);
  j.kv("hash", hash_name);
  j.kv("group", group_name);
  j.kv("in_bits", in_bits);
  j.kv("gen_retries", retries);
  emit_material(j, m);
  j.kv_strs("s0s", {hex_int4(s0s[0]), hex_int4(s0s[1])});
  j.kv("alpha", hex_u128(alpha));
  j.kv("beta", hex_int4(beta));
  std::vector<std::string> rows;
  for (int i = 0; i < in_bits; ++i) rows.push_back(row_s_flag(cws[i], cws[i].tr));
  j.kv_strs("cws", rows);
  j.kv_strs("cs", {hex_int4(cs[0]), hex_int4(cs[1]), hex_int4(cs[2]), hex_int4(cs[3])});
  j.kv("ocw", hex_int4(ocw));

  std::vector<std::string> xs_hex, y0s, y1s, pt0s, pt1s;
  std::vector<cuda::std::array<int4, 4>> pts0, pts1;
  for (auto x : xs) {
    xs_hex.push_back(hex_u128(x));
    int4 y;
    auto pt = vdpf.Eval(false, s0s[0], cuda::std::span<const typename Vdpf::Cw>(cws.data(), in_bits),
        cuda::std::span<const int4, 4>(cs), ocw, static_cast<In>(x), y);
    y0s.push_back(hex_int4(y));
    pt0s.push_back(hex_bytes(pt.data(), 64));
    pts0.push_back(pt);
    pt = vdpf.Eval(true, s0s[1], cuda::std::span<const typename Vdpf::Cw>(cws.data(), in_bits),
        cuda::std::span<const int4, 4>(cs), ocw, static_cast<In>(x), y);
    y1s.push_back(hex_int4(y));
    pt1s.push_back(hex_bytes(pt.data(), 64));
    pts1.push_back(pt);
  }
  j.kv_strs("xs", xs_hex);
  j.kv_strs("ys0", y0s);
  j.kv_strs("ys1", y1s);
  j.kv_strs("pi_tildes0", pt0s);
  j.kv_strs("pi_tildes1", pt1s);

  cuda::std::array<int4, 4> pi0, pi1;
  vdpf.Prove(cuda::std::span<const cuda::std::array<int4, 4>>(pts0.data(), pts0.size()),
      cuda::std::span<const int4, 4>(cs), pi0);
  vdpf.Prove(cuda::std::span<const cuda::std::array<int4, 4>>(pts1.data(), pts1.size()),
      cuda::std::span<const int4, 4>(cs), pi1);
  j.kv("prove_pi0", hex_bytes(pi0.data(), 64));
  j.kv("prove_pi1", hex_bytes(pi1.data(), 64));
  assert(Vdpf::Verify(cuda::std::span<const int4, 4>(pi0.data(), 4), cuda::std::span<const int4, 4>(pi1.data(), 4)));

  if constexpr (in_bits <= 16) {
    size_t n = size_t(1) << in_bits;
    std::vector<int4> ys(n);
    cuda::std::array<int4, 4> pia0, pia1;
    vdpf.EvalAll(false, s0s[0], cuda::std::span<const typename Vdpf::Cw>(cws.data(), in_bits),
        cuda::std::span<const int4, 4>(cs), ocw, cuda::std::span<int4>(ys.data(), n), pia0);
    j.kv("eval_all_digest0", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_pi0", hex_bytes(pia0.data(), 64));
    vdpf.EvalAll(true, s0s[1], cuda::std::span<const typename Vdpf::Cw>(cws.data(), in_bits),
        cuda::std::span<const int4, 4>(cs), ocw, cuda::std::span<int4>(ys.data(), n), pia1);
    j.kv("eval_all_digest1", digest_hex(ys.data(), n * 16));
    j.kv("eval_all_pi1", hex_bytes(pia1.data(), 64));
    assert(Vdpf::Verify(cuda::std::span<const int4, 4>(pia0.data(), 4),
        cuda::std::span<const int4, 4>(pia1.data(), 4)));
  }
  j.item_obj_close();
}

// Parameterized over PRG/hash/occupancy (vdmpf_test.cu:38-122 is the
// coverage bar): the base config mirrors the reference's own test
// (t=30, 16-bit, bucket_bits=14, ChaCha+Blake3); extra registrations
// sweep the AES-MMO PRG, the SHA-256 hash pair, and a t < max_points
// occupancy where the runtime bucket count m_rt differs from the
// compile-time m.
template <int max_points, int in_bits = 16, int bucket_bits = 14, typename InT = uint16_t, typename Prg,
    typename Hash>
void vdmpf_case(Json &j, const char *prg_name, const char *hash_name, Prg prg, Hash xor_hash, Hash hash,
    const Material &m, int t) {
  using Prp = fss::prp::Aes128Feistel;
  using Vdmpf = fss::Vdmpf<in_bits, max_points, bucket_bits, fss::group::Uint<uint64_t>, Prg, Hash, Hash, Prp,
      InT>;
  constexpr uint64_t in_mask = (in_bits >= 64) ? ~0ULL : ((1ULL << in_bits) - 1);

  Prp prp;
  Vdmpf vdmpf{prg, xor_hash, hash, prp};

  std::vector<InT> alphas;
  std::vector<int4> betas;
  for (int i = 0; i < t; ++i) {
    InT a;
    do {
      a = static_cast<InT>(splitmix64() & in_mask);
    } while (std::find(alphas.begin(), alphas.end(), a) != alphas.end());
    alphas.push_back(a);
    betas.push_back(fss::util::SetLsb(rand_int4(), false));
  }

  auto k0 = std::make_unique<typename Vdmpf::Key>();
  auto k1 = std::make_unique<typename Vdmpf::Key>();
  int4 sigma;
  std::vector<cuda::std::array<int4, 2>> s0s(Vdmpf::m);
  int retries = 0;
  for (;;) {
    sigma = rand_int4();
    for (auto &p : s0s) p = {rand_int4(), rand_int4()};
    int ret = vdmpf.Gen(*k0, *k1, sigma, cuda::std::span<const cuda::std::array<int4, 2>, Vdmpf::m>(s0s.data(),
        Vdmpf::m), std::span<const InT>(alphas), std::span<const int4>(betas), t);
    if (ret == 0) break;
    ++retries;
    assert(retries < 64);
  }

  j.item_obj_open();
  j.kv("scheme", "vdmpf");
  j.kv("prg", prg_name);
  j.kv("hash", hash_name);
  j.kv("prp", "aes128_feistel");
  j.kv("group", "uint64");
  j.kv("in_bits", in_bits);
  j.kv("max_points", max_points);
  j.kv("bucket_bits", bucket_bits);
  j.kv("t", t);
  j.kv("m", Vdmpf::m);
  j.kv("m_rt", k0->m_rt);
  j.kv("b_size_rt", k0->b_size_rt);
  j.kv("gen_retries", retries);
  emit_material(j, m);
  j.kv("sigma", hex_int4(sigma));
  std::vector<std::string> alphas_hex, betas_hex, seeds0, seeds1;
  for (int i = 0; i < t; ++i) {
    alphas_hex.push_back(hex_u128(alphas[i]));
    betas_hex.push_back(hex_int4(betas[i]));
  }
  for (int i = 0; i < Vdmpf::m; ++i) {
    seeds0.push_back(hex_int4(s0s[i][0]));
    seeds1.push_back(hex_int4(s0s[i][1]));
  }
  j.kv_strs("alphas", alphas_hex);
  j.kv_strs("betas", betas_hex);
  j.kv_strs("bucket_s0s0", seeds0);
  j.kv_strs("bucket_s0s1", seeds1);

  // Per-bucket key material (shared parts from k0; s0 differs per party).
  j.open_arr("buckets");
  for (int i = 0; i < Vdmpf::m; ++i) {
    j.item_obj_open();
    std::vector<std::string> rows;
    for (int l = 0; l < bucket_bits; ++l) rows.push_back(row_s_flag(k0->bks[i].cws[l], k0->bks[i].cws[l].tr));
    j.kv_strs("cws", rows);
    j.kv("cs", hex_bytes(k0->bks[i].cs.data(), 64));
    j.kv("ocw", hex_int4(k0->bks[i].ocw));
    j.item_obj_close();
  }
  j.close_arr();

  // BatchEval at all alphas plus 10 non-alphas.
  std::vector<InT> xs(alphas);
  for (int i = 0; i < 10; ++i) {
    InT x;
    do {
      x = static_cast<InT>(splitmix64() & in_mask);
    } while (std::find(alphas.begin(), alphas.end(), x) != alphas.end() ||
             std::find(xs.begin(), xs.end(), x) != xs.end());
    xs.push_back(x);
  }
  std::vector<int4> ys0(xs.size()), ys1(xs.size());
  cuda::std::array<int4, 4> pi0, pi1;
  vdmpf.BatchEval(false, *k0, std::span<const InT>(xs), std::span<int4>(ys0), pi0);
  vdmpf.BatchEval(true, *k1, std::span<const InT>(xs), std::span<int4>(ys1), pi1);
  assert(Vdmpf::Verify(cuda::std::span<const int4, 4>(pi0.data(), 4), cuda::std::span<const int4, 4>(pi1.data(), 4)));

  std::vector<std::string> xs_hex, y0s_hex, y1s_hex;
  for (size_t i = 0; i < xs.size(); ++i) {
    xs_hex.push_back(hex_u128(xs[i]));
    y0s_hex.push_back(hex_int4(ys0[i]));
    y1s_hex.push_back(hex_int4(ys1[i]));
  }
  j.kv_strs("xs", xs_hex);
  j.kv_strs("ys0", y0s_hex);
  j.kv_strs("ys1", y1s_hex);
  j.kv("pi0", hex_bytes(pi0.data(), 64));
  j.kv("pi1", hex_bytes(pi1.data(), 64));
  j.item_obj_close();
}

// ---------------------------------------------------------------------------
// Primitive vectors
// ---------------------------------------------------------------------------

void primitives(Json &j) {
  // Known-answer self-checks for the shim backends first: if these fire, the
  // shim (not the reference logic) is wrong.
  {
    // FIPS-197 appendix C.1 AES-128 vector.
    unsigned char key[16], pt[16], ct[16];
    for (int i = 0; i < 16; ++i) key[i] = static_cast<unsigned char>(i);
    for (int i = 0; i < 16; ++i) pt[i] = static_cast<unsigned char>(i * 0x11);
    EVP_CIPHER_CTX *ctx = EVP_CIPHER_CTX_new();
    EVP_EncryptInit_ex2(ctx, EVP_aes_128_ecb(), key, nullptr, nullptr);
    int len;
    EVP_EncryptUpdate(ctx, ct, &len, pt, 16);
    EVP_CIPHER_CTX_free(ctx);
    static const unsigned char expect[16] = {0x69, 0xc4, 0xe0, 0xd8, 0x6a, 0x7b, 0x04, 0x30, 0xd8, 0xcd, 0xb7, 0x80,
        0x70, 0xb4, 0xc5, 0x5a};
    assert(memcmp(ct, expect, 16) == 0);
    // SHA-256("abc")
    unsigned char md[32];
    EVP_Digest("abc", 3, md, nullptr, EVP_sha256(), nullptr);
    static const unsigned char expect_md[8] = {0xba, 0x78, 0x16, 0xbf, 0x8f, 0x01, 0xcf, 0xea};
    assert(memcmp(md, expect_md, 8) == 0);
  }

  Material m = fresh_material();

  // ChaCha mul=1/2/4 at fixed seeds+nonce.
  j.open_arr("chacha");
  for (int trial = 0; trial < 4; ++trial) {
    int4 seed = rand_int4();
    int nonce[2] = {static_cast<int>(splitmix64()), static_cast<int>(splitmix64())};
    fss::prg::ChaCha<1> c1(nonce);
    fss::prg::ChaCha<2> c2(nonce);
    fss::prg::ChaCha<4> c4(nonce);
    auto o1 = c1.Gen(seed);
    auto o2 = c2.Gen(seed);
    auto o4 = c4.Gen(seed);
    j.item_obj_open();
    j.kv("seed", hex_int4(seed));
    j.kv("nonce_lo", static_cast<long long>(static_cast<uint32_t>(nonce[0])));
    j.kv("nonce_hi", static_cast<long long>(static_cast<uint32_t>(nonce[1])));
    j.kv("out1", hex_bytes(o1.data(), 16));
    j.kv("out2", hex_bytes(o2.data(), 32));
    j.kv("out4", hex_bytes(o4.data(), 64));
    j.item_obj_close();
  }
  j.close_arr();

  // AES-128-MMO: EVP, AES-NI raw, and soft T-table variants must agree.
  j.open_arr("aes_mmo");
  {
    cuda::std::array<EVP_CIPHER_CTX *, 4> ctxs;
    auto mmo = make_mmo<4>(m, ctxs);
    uint8_t raw_keys[4][16];
    for (int k = 0; k < 4; ++k) memcpy(raw_keys[k], m.aes_keys[k], 16);
    fss::prg::Aes128MmoRaw<4> raw(raw_keys);
    uint32_t te0[256];
    uint8_t sbox[256];
    fss::prg::aes_detail::InitTe0(te0);
    fss::prg::aes_detail::InitSbox(sbox);
    uint8_t soft_keys[4][16];
    for (int k = 0; k < 4; ++k) memcpy(soft_keys[k], m.aes_keys[k], 16);
    fss::prg::Aes128Soft<4> soft(soft_keys, te0, sbox);
    for (int trial = 0; trial < 4; ++trial) {
      int4 seed = rand_int4();
      auto o_evp = mmo.Gen(seed);
      auto o_raw = raw.Gen(seed);
      auto o_soft = soft.Gen(seed);
      assert(memcmp(o_evp.data(), o_raw.data(), 64) == 0);
      assert(memcmp(o_evp.data(), o_soft.data(), 64) == 0);
      j.item_obj_open();
      std::vector<std::string> key_hex;
      for (int k = 0; k < 4; ++k) key_hex.push_back(hex_bytes(m.aes_keys[k], 16));
      j.kv_strs("keys", key_hex);
      j.kv("seed", hex_int4(seed));
      j.kv("out4", hex_bytes(o_evp.data(), 64));
      j.item_obj_close();
    }
    fss::prg::Aes128Mmo<4>::FreeCtxs(ctxs);
  }
  j.close_arr();

  // SHA-256 keyed Hash + XorHash.
  j.open_arr("sha256");
  for (int trial = 0; trial < 4; ++trial) {
    int4 key = rand_int4();
    fss::hash::Sha256 h(key);
    int4 msg[4] = {rand_int4(), rand_int4(), rand_int4(), rand_int4()};
    auto out = h.Hash(cuda::std::span<const int4, 4>(msg, 4));
    int4 a = rand_int4(), b = rand_int4();
    auto xout = h.Hash(cuda::std::tuple<int4, const int4>{a, b});
    j.item_obj_open();
    j.kv("key", hex_int4(key));
    j.kv("msg", hex_bytes(msg, 64));
    j.kv("hash", hex_bytes(out.data(), 32));
    j.kv("x", hex_int4(a));
    j.kv("s", hex_int4(b));
    j.kv("xor_hash", hex_bytes(xout.data(), 64));
    j.item_obj_close();
  }
  j.close_arr();

  // BLAKE3 keyed Hash + XorHash.
  j.open_arr("blake3");
  for (int trial = 0; trial < 4; ++trial) {
    int4 iv[2] = {rand_int4(), rand_int4()};
    fss::hash::Blake3 h(cuda::std::span<const int4, 2>(iv, 2));
    int4 msg[4] = {rand_int4(), rand_int4(), rand_int4(), rand_int4()};
    auto out = h.Hash(cuda::std::span<const int4, 4>(msg, 4));
    int4 a = rand_int4(), b = rand_int4();
    auto xout = h.Hash(cuda::std::tuple<int4, const int4>{a, b});
    j.item_obj_open();
    j.kv("iv", hex_bytes(iv, 32));
    j.kv("msg", hex_bytes(msg, 64));
    j.kv("hash", hex_bytes(out.data(), 32));
    j.kv("x", hex_int4(a));
    j.kv("s", hex_int4(b));
    j.kv("xor_hash", hex_bytes(xout.data(), 64));
    j.item_obj_close();
  }
  j.close_arr();

  // Feistel PRP Permu vectors over assorted domains (incl. non-power-of-2).
  j.open_arr("feistel");
  {
    fss::prp::Aes128Feistel prp;
    const __uint128_t domains[4] = {256, 1000, 65536 * 3, (static_cast<__uint128_t>(1) << 40) * 3};
    for (auto domain : domains) {
      int4 sigma = rand_int4();
      std::vector<std::string> xs_hex, ys_hex;
      for (int trial = 0; trial < 8; ++trial) {
        __uint128_t x = (static_cast<__uint128_t>(splitmix64()) << 64 | splitmix64()) % domain;
        __uint128_t y = prp.Permu(sigma, x, domain);
        assert(y < domain);
        xs_hex.push_back(hex_u128(x));
        ys_hex.push_back(hex_u128(y));
      }
      j.item_obj_open();
      j.kv("sigma", hex_int4(sigma));
      j.kv("domain", hex_u128(domain));
      j.kv_strs("xs", xs_hex);
      j.kv_strs("ys", ys_hex);
      j.item_obj_close();
    }
  }
  j.close_arr();

  // Cuckoo: ChBucket values and a Compact table.
  j.open_arr("cuckoo");
  {
    j.item_obj_open();
    std::vector<std::string> ts, ms;
    for (int t : {30, 31, 50, 100, 247, 1000, 4096, 100000}) {
      ts.push_back(std::to_string(t));
      ms.push_back(std::to_string(fss::cuckoo_hash::ChBucket(t, 80)));
    }
    j.kv_strs("t", ts);
    j.kv_strs("ch_bucket_80", ms);
    std::vector<std::string> ls, lms;
    for (int l : {40, 80, 128}) {
      ls.push_back(std::to_string(l));
      lms.push_back(std::to_string(fss::cuckoo_hash::ChBucket(30, l)));
    }
    j.kv_strs("lambda", ls);
    j.kv_strs("ch_bucket_t30", lms);
    j.item_obj_close();

    // Compact table: t=30 16-bit elements, n=2^16, kappa=3.
    fss::prp::Aes128Feistel prp;
    int4 sigma = rand_int4();
    std::vector<uint16_t> as;
    for (int i = 0; i < 30; ++i) {
      uint16_t a;
      do {
        a = static_cast<uint16_t>(splitmix64());
      } while (std::find(as.begin(), as.end(), a) != as.end());
      as.push_back(a);
    }
    int m_ = fss::cuckoo_hash::ChBucket(30, 80);
    __uint128_t n = 65536;
    int b_size = static_cast<int>((n * 3 + m_ - 1) / m_);
    std::vector<std::pair<int, int>> table(m_);
    fss::cuckoo_hash::Compact<fss::prp::Aes128Feistel, uint16_t, 3> compact{prp};
    int ret = compact.Run(std::span<const uint16_t>(as), m_, sigma, n, b_size, 1000,
        std::span<std::pair<int, int>>(table));
    assert(ret == 0);
    j.item_obj_open();
    j.kv("sigma", hex_int4(sigma));
    j.kv("m", m_);
    j.kv("b_size", b_size);
    std::vector<std::string> as_hex, tbl;
    for (auto a : as) as_hex.push_back(hex_u128(a));
    for (auto &[idx, k] : table) tbl.push_back(std::to_string(idx) + "," + std::to_string(k));
    j.kv_strs("as", as_hex);
    j.kv_strs("table", tbl);
    j.item_obj_close();
  }
  j.close_arr();
}

}  // namespace

int main(int argc, char **argv) {
  std::string outdir = argc > 1 ? argv[1] : "vectors";

  using Bytes = fss::group::Bytes;
  using U64 = fss::group::Uint<uint64_t>;
  using U32 = fss::group::Uint<uint32_t>;
  using U127 = fss::group::Uint<__uint128_t, (static_cast<__uint128_t>(1) << 127)>;
  // Non-power-of-two 128-bit modulus (group/uint.cuh is generic over it);
  // exercises the TPU kernel's mod128np 160-bit exact accumulator.
  using U127M = fss::group::Uint<__uint128_t, (static_cast<__uint128_t>(1) << 127) - 1>;

  {
    Json j(outdir + "/primitives.json");
    j.open_obj();
    primitives(j);
    j.close_obj();
    j.close();
  }

  {
    Json j(outdir + "/dpf.json");
    j.open_obj();
    j.open_arr("cases");
    {
      Material m = fresh_material();
      dpf_case<8, Bytes, fss::prg::ChaCha<2>, uint8_t>(j, "chacha", "bytes", fss::prg::ChaCha<2>(m.nonce), m, 42,
          {42, 0, 100, 255});
      m = fresh_material();
      dpf_case<16, U64, fss::prg::ChaCha<2>, uint16_t>(j, "chacha", "uint64", fss::prg::ChaCha<2>(m.nonce), m, 31337,
          {31337, 0, 65535, 12345});
      m = fresh_material();
      dpf_case<16, U32, fss::prg::ChaCha<2>, uint16_t>(j, "chacha", "uint32", fss::prg::ChaCha<2>(m.nonce), m, 777,
          {777, 778, 1});
      m = fresh_material();
      dpf_case<16, U127, fss::prg::ChaCha<2>, uint16_t>(j, "chacha", "uint127", fss::prg::ChaCha<2>(m.nonce), m, 999,
          {999, 1000, 0});
      m = fresh_material();
      {
        cuda::std::array<EVP_CIPHER_CTX *, 2> ctxs;
        auto mmo = make_mmo<2>(m, ctxs);
        dpf_case<8, Bytes, fss::prg::Aes128Mmo<2>, uint8_t>(j, "aes", "bytes", mmo, m, 42, {42, 0, 100, 255});
        fss::prg::Aes128Mmo<2>::FreeCtxs(ctxs);
      }
      m = fresh_material();
      {
        cuda::std::array<EVP_CIPHER_CTX *, 2> ctxs;
        auto mmo = make_mmo<2>(m, ctxs);
        dpf_case<16, U64, fss::prg::Aes128Mmo<2>, uint16_t>(j, "aes", "uint64", mmo, m, 31337, {31337, 0, 65535});
        fss::prg::Aes128Mmo<2>::FreeCtxs(ctxs);
      }
      // Wide domains: point evals only.
      m = fresh_material();
      dpf_case<48, Bytes, fss::prg::ChaCha<2>, uint64_t>(j, "chacha", "bytes", fss::prg::ChaCha<2>(m.nonce), m,
          0x123456789abcULL, {0x123456789abcULL, 0, 0xffffffffffffULL, 0x123456789abdULL});
      m = fresh_material();
      dpf_case<128, Bytes, fss::prg::ChaCha<2>, __uint128_t>(j, "chacha", "bytes", fss::prg::ChaCha<2>(m.nonce), m,
          (static_cast<__uint128_t>(0xdeadbeefcafebabeULL) << 64) | 0x0123456789abcdefULL,
          {(static_cast<__uint128_t>(0xdeadbeefcafebabeULL) << 64) | 0x0123456789abcdefULL, 0,
              static_cast<__uint128_t>(-1)});
    }
    j.close_arr();
    j.close_obj();
    j.close();
  }

  {
    Json j(outdir + "/dcf.json");
    j.open_obj();
    j.open_arr("cases");
    {
      Material m = fresh_material();
      dcf_case<8, Bytes, fss::prg::ChaCha<4>, fss::DcfPred::kLt, uint8_t>(j, "chacha", "bytes",
          fss::prg::ChaCha<4>(m.nonce), m, 42, {41, 42, 43, 0, 255});
      m = fresh_material();
      dcf_case<16, U64, fss::prg::ChaCha<4>, fss::DcfPred::kLt, uint16_t>(j, "chacha", "uint64",
          fss::prg::ChaCha<4>(m.nonce), m, 31337, {31336, 31337, 31338, 0, 65535});
      m = fresh_material();
      dcf_case<16, U64, fss::prg::ChaCha<4>, fss::DcfPred::kGt, uint16_t>(j, "chacha", "uint64",
          fss::prg::ChaCha<4>(m.nonce), m, 31337, {31336, 31337, 31338, 0, 65535});
      m = fresh_material();
      {
        cuda::std::array<EVP_CIPHER_CTX *, 4> ctxs;
        auto mmo = make_mmo<4>(m, ctxs);
        dcf_case<8, U64, fss::prg::Aes128Mmo<4>, fss::DcfPred::kLt, uint8_t>(j, "aes", "uint64", mmo, m, 100,
            {99, 100, 101, 0, 255});
        fss::prg::Aes128Mmo<4>::FreeCtxs(ctxs);
      }
      m = fresh_material();
      dcf_case<16, U127, fss::prg::ChaCha<4>, fss::DcfPred::kLt, uint16_t>(j, "chacha", "uint127",
          fss::prg::ChaCha<4>(m.nonce), m, 999, {998, 999, 1000});
      m = fresh_material();
      dcf_case<16, U127M, fss::prg::ChaCha<4>, fss::DcfPred::kLt, uint16_t>(j, "chacha", "uint127m",
          fss::prg::ChaCha<4>(m.nonce), m, 777, {776, 777, 778});
      // Wide domain (the 128-bit cw-block shape that scoped-VMEM-OOMed
      // the eval kernels on-chip; point evals only).
      m = fresh_material();
      dcf_case<128, U64, fss::prg::ChaCha<4>, fss::DcfPred::kLt, __uint128_t>(j, "chacha", "uint64",
          fss::prg::ChaCha<4>(m.nonce), m, (static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL,
          {((static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL) - 1, (static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL, ((static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL) + 1});
    }
    j.close_arr();
    j.close_obj();
    j.close();
  }

  {
    Json j(outdir + "/half_tree.json");
    j.open_obj();
    j.open_arr("cases");
    {
      Material m = fresh_material();
      half_tree_case<8, Bytes, fss::prg::ChaCha<1>, uint8_t>(j, "chacha", "bytes", fss::prg::ChaCha<1>(m.nonce), m,
          42, {42, 0, 100, 255});
      m = fresh_material();
      half_tree_case<16, U64, fss::prg::ChaCha<1>, uint16_t>(j, "chacha", "uint64", fss::prg::ChaCha<1>(m.nonce), m,
          31337, {31337, 0, 65535, 12345});
      m = fresh_material();
      half_tree_case<1, U64, fss::prg::ChaCha<1>, uint8_t>(j, "chacha", "uint64", fss::prg::ChaCha<1>(m.nonce), m, 1,
          {0, 1});
      m = fresh_material();
      {
        cuda::std::array<EVP_CIPHER_CTX *, 1> ctxs;
        auto mmo = make_mmo<1>(m, ctxs);
        half_tree_case<8, U64, fss::prg::Aes128Mmo<1>, uint8_t>(j, "aes", "uint64", mmo, m, 200, {200, 0, 199});
        fss::prg::Aes128Mmo<1>::FreeCtxs(ctxs);
      }
      m = fresh_material();
      half_tree_case<128, U64, fss::prg::ChaCha<1>, __uint128_t>(j, "chacha", "uint64",
          fss::prg::ChaCha<1>(m.nonce), m, (static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL,
          {(static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL, 0, ((static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL) + 1});
    }
    j.close_arr();
    j.close_obj();
    j.close();
  }

  {
    Json j(outdir + "/grotto.json");
    j.open_obj();
    j.open_arr("cases");
    {
      Material m = fresh_material();
      grotto_case<8, fss::prg::ChaCha<2>, uint8_t>(j, "chacha", fss::prg::ChaCha<2>(m.nonce), m, 42,
          {41, 42, 43, 0, 254, 255});
      m = fresh_material();
      grotto_case<16, fss::prg::ChaCha<2>, uint16_t>(j, "chacha", fss::prg::ChaCha<2>(m.nonce), m, 31337,
          {31336, 31337, 31338, 0, 65534, 65535});
      m = fresh_material();
      grotto_case<8, fss::prg::ChaCha<2>, uint8_t>(j, "chacha", fss::prg::ChaCha<2>(m.nonce), m, 0, {0, 1, 255});
      m = fresh_material();
      grotto_case<8, fss::prg::ChaCha<2>, uint8_t>(j, "chacha", fss::prg::ChaCha<2>(m.nonce), m, 255,
          {254, 255, 0});
      m = fresh_material();
      {
        cuda::std::array<EVP_CIPHER_CTX *, 2> ctxs;
        auto mmo = make_mmo<2>(m, ctxs);
        grotto_case<16, fss::prg::Aes128Mmo<2>, uint16_t>(j, "aes", mmo, m, 31337,
            {31336, 31337, 31338, 0, 65534, 65535});
        fss::prg::Aes128Mmo<2>::FreeCtxs(ctxs);
      }
    }
    j.close_arr();
    j.close_obj();
    j.close();
  }

  {
    Json j(outdir + "/vdpf.json");
    j.open_obj();
    j.open_arr("cases");
    {
      Material m = fresh_material();
      {
        fss::hash::Sha256 h(m.hash_key);
        vdpf_case<8, Bytes, fss::prg::ChaCha<2>, fss::hash::Sha256, fss::hash::Sha256, uint8_t>(j, "chacha",
            "sha256", "bytes", fss::prg::ChaCha<2>(m.nonce), h, h, m, 42, {42, 0, 100, 255});
      }
      m = fresh_material();
      {
        fss::hash::Sha256 h(m.hash_key);
        vdpf_case<16, U64, fss::prg::ChaCha<2>, fss::hash::Sha256, fss::hash::Sha256, uint16_t>(j, "chacha",
            "sha256", "uint64", fss::prg::ChaCha<2>(m.nonce), h, h, m, 31337, {31337, 0, 65535, 12345});
      }
      m = fresh_material();
      {
        fss::hash::Blake3 h(cuda::std::span<const int4, 2>(m.blake3_iv, 2));
        vdpf_case<16, U64, fss::prg::ChaCha<2>, fss::hash::Blake3, fss::hash::Blake3, uint16_t>(j, "chacha",
            "blake3", "uint64", fss::prg::ChaCha<2>(m.nonce), h, h, m, 31337, {31337, 0, 65535, 12345});
      }
      m = fresh_material();
      {
        fss::hash::Blake3 h(cuda::std::span<const int4, 2>(m.blake3_iv, 2));
        vdpf_case<128, U64, fss::prg::ChaCha<2>, fss::hash::Blake3, fss::hash::Blake3, __uint128_t>(j, "chacha",
            "blake3", "uint64", fss::prg::ChaCha<2>(m.nonce), h, h, m, (static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL,
            {(static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL, 0, ((static_cast<__uint128_t>(0x1122334455667788ULL) << 64) | 0x99aabbccddeeff00ULL) + 1});
      }
      m = fresh_material();
      {
        cuda::std::array<EVP_CIPHER_CTX *, 2> ctxs;
        auto mmo = make_mmo<2>(m, ctxs);
        fss::hash::Sha256 h(m.hash_key);
        vdpf_case<8, U64, fss::prg::Aes128Mmo<2>, fss::hash::Sha256, fss::hash::Sha256, uint8_t>(j, "aes", "sha256",
            "uint64", mmo, h, h, m, 77, {77, 0, 78});
        fss::prg::Aes128Mmo<2>::FreeCtxs(ctxs);
      }
    }
    j.close_arr();
    j.close_obj();
    j.close();
  }

  {
    Json j(outdir + "/vdmpf.json");
    j.open_obj();
    j.open_arr("cases");
    {
      // The reference's own test config (vdmpf_test.cu): t = max_points.
      Material m = fresh_material();
      fss::hash::Blake3 h(cuda::std::span<const int4, 2>(m.blake3_iv, 2));
      vdmpf_case<30>(j, "chacha", "blake3", fss::prg::ChaCha<2>(m.nonce), h, h, m, 30);
    }
    {
      // AES-MMO PRG sweep.
      Material m = fresh_material();
      cuda::std::array<EVP_CIPHER_CTX *, 2> ctxs;
      auto mmo = make_mmo<2>(m, ctxs);
      fss::hash::Blake3 h(cuda::std::span<const int4, 2>(m.blake3_iv, 2));
      vdmpf_case<30>(j, "aes", "blake3", mmo, h, h, m, 30);
      fss::prg::Aes128Mmo<2>::FreeCtxs(ctxs);
    }
    {
      // SHA-256 hash pair sweep.
      Material m = fresh_material();
      fss::hash::Sha256 h(m.hash_key);
      vdmpf_case<30>(j, "chacha", "sha256", fss::prg::ChaCha<2>(m.nonce), h, h, m, 30);
    }
    {
      // t < max_points occupancy: runtime m_rt differs from compile m.
      Material m = fresh_material();
      fss::hash::Blake3 h(cuda::std::span<const int4, 2>(m.blake3_iv, 2));
      vdmpf_case<60>(j, "chacha", "blake3", fss::prg::ChaCha<2>(m.nonce), h, h, m, 42);
    }
    {
      // Wide domain (in_bits > 32): pins the >29-bit Locate routing —
      // the PRP's __uint128_t-domain walk (prp.cuh:22-25) plus the
      // bucket/index divide — which previously had only property-test
      // coverage (r3 VERDICT #8). uint64_t inputs. 33 bits is near the
      // REFERENCE's own ceiling: its inner Vdpf input is `uint` and
      // b_size must fit 1 << bucket_bits as int (vdmpf.cuh:91-93), so
      // bucket_bits <= 30 and n*kappa/m <= 2^30 caps in_bits ~ 35.
      Material m = fresh_material();
      fss::hash::Blake3 h(cuda::std::span<const int4, 2>(m.blake3_iv, 2));
      vdmpf_case<30, 33, 30, uint64_t>(j, "chacha", "blake3", fss::prg::ChaCha<2>(m.nonce), h, h, m, 30);
    }
    j.close_arr();
    j.close_obj();
    j.close();
  }

  printf("golden vectors written to %s/\n", outdir.c_str());
  return 0;
}
