"""Native host engine: ctypes bindings for the C++ library.

Compiled on demand with g++ and cached by source hash under
~/.cache/fss_tpu/native (override with FSS_TPU_NATIVE_CACHE) — the same
compile-once-per-config deploy shape as the reference's JIT-compiled torch
extensions (fss_crypto/_jit.py:198-253), minus the per-parameter-set
codegen: the C ABI takes scheme parameters at runtime.

Public surface: ``engine()`` returns a NativeEngine with prg / dpf_gen /
dpf_eval / dpf_eval_batch / dpf_eval_all, operating on numpy uint32 arrays
in the standard key layouts.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "fss_native.cpp")

PRG_CHACHA = 0
PRG_AES128_MMO = 1
GROUP_BYTES = 0
GROUP_UINT = 1

_ENGINE = None


def _build() -> str:
    cache_root = os.environ.get(
        "FSS_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fss_tpu",
                     "native"))
    os.makedirs(cache_root, exist_ok=True)
    with open(_SRC, "rb") as f:
        src = f.read()
    # VAES-512 paths (4 AES blocks per instruction) are compiled in only
    # when THIS host has the features — the flags join the cache key so a
    # cache dir moved across hosts cannot serve a mismatched binary.
    extra: list[str] = []
    try:
        with open("/proc/cpuinfo") as f:
            flags = f.read()
        if " vaes" in flags and " avx512f" in flags and \
                " avx512bw" in flags and " avx512vl" in flags:
            extra = ["-mvaes", "-mavx512f", "-mavx512bw", "-mavx512vl",
                     "-mavx512dq", "-DFSS_BUILD_VAES512=1"]
    except OSError:
        pass
    key = hashlib.sha256(src + b"|" + " ".join(extra).encode()
                         ).hexdigest()[:16]
    so_path = os.path.join(cache_root, f"fss_native_{key}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + ".tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-maes",
           "-msse4.2", *extra, "-o", tmp, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


class NativeEngine:
    def __init__(self):
        self._lib = ctypes.CDLL(_build())
        self._lib.fss_native_has_aesni.restype = ctypes.c_int

    @property
    def has_aesni(self) -> bool:
        return bool(self._lib.fss_native_has_aesni())

    @staticmethod
    def _u32(arr):
        a = np.ascontiguousarray(arr, dtype=np.uint32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))

    @staticmethod
    def _u64(arr):
        a = np.ascontiguousarray(arr, dtype=np.uint64)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))

    @staticmethod
    def _split_u128(xs):
        """(lo, hi) uint64 halves of the inputs. Integer ndarrays take the
        vectorized path; Python-int (object) arrays carry > 64-bit domains
        element-wise (the per-element loop costs ~270 ns/point, so it is
        reserved for inputs that actually need it)."""
        if (isinstance(xs, np.ndarray) and xs.dtype != object
                and np.issubdtype(xs.dtype, np.integer)):
            lo = np.atleast_1d(xs).astype(np.uint64)
            return lo, np.zeros_like(lo)
        xs = np.atleast_1d(np.asarray(xs, dtype=object))
        lo = np.array([int(x) & (2**64 - 1) for x in xs],
                      dtype=np.uint64)
        hi = np.array([int(x) >> 64 for x in xs], dtype=np.uint64)
        return lo, hi

    @staticmethod
    def _u8(arr):
        if arr is None:
            return None, None
        a = np.ascontiguousarray(np.frombuffer(arr, dtype=np.uint8)
                                 if isinstance(arr, (bytes, bytearray))
                                 else arr, dtype=np.uint8)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def _prg_args(self, prg_kind, nonce, aes_keys, rounds):
        nonce_arr = np.zeros(2, dtype=np.uint32)
        if nonce is not None:
            nonce_arr[:] = [int(n) & 0xFFFFFFFF for n in nonce]
        _, nonce_p = self._u32(nonce_arr)
        keys_buf = b"".join(aes_keys) if aes_keys else None
        keys_hold, keys_p = self._u8(keys_buf)
        return (nonce_arr, nonce_p, keys_hold, keys_p,
                ctypes.c_int(int(rounds)))

    def prg(self, prg_kind: int, mul: int, seed, nonce=None, aes_keys=None,
            rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        seed_a, seed_p = self._u32(seed)
        out = np.zeros((mul, 4), dtype=np.uint32)
        _, out_p = self._u32(out)
        self._lib.fss_prg(ctypes.c_int(prg_kind), ctypes.c_int(mul),
                          nonce_p, keys_p, rounds_c, seed_p, out_p)
        return out

    def dpf_gen(self, in_bits: int, prg_kind: int, group_kind: int,
                group_bits: int, s0s, alpha: int, beta, nonce=None,
                aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0s_a, s0s_p = self._u32(s0s)
        beta_a, beta_p = self._u32(beta)
        cws = np.zeros((in_bits + 1, 8), dtype=np.uint32)
        _, cws_p = self._u32(cws)
        self._lib.fss_dpf_gen(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            s0s_p, ctypes.c_uint64(alpha & (2**64 - 1)),
            ctypes.c_uint64(alpha >> 64), beta_p, cws_p)
        return cws

    def dpf_gen_batch(self, in_bits: int, prg_kind: int, group_kind: int,
                      group_bits: int, s0s_batch, alphas, betas, nonce=None,
                      aes_keys=None, rounds: int = 20) -> np.ndarray:
        """n independent gens in one native call: s0s [n, 2, 4],
        alphas [n] uint64, betas [n, 4] -> cws [n, in_bits+1, 8]."""
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0s_a, s0s_p = self._u32(s0s_batch)
        betas_a, betas_p = self._u32(betas)
        lo = np.ascontiguousarray(alphas, dtype=np.uint64)
        _, lo_p = self._u64(lo)
        n = len(lo)
        cws = np.zeros((n, in_bits + 1, 8), dtype=np.uint32)
        _, cws_p = self._u32(cws)
        self._lib.fss_dpf_gen_batch(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            s0s_p, lo_p, None, betas_p, ctypes.c_int64(n), cws_p)
        return cws

    def dpf_eval(self, in_bits: int, prg_kind: int, group_kind: int,
                 group_bits: int, party: int, s0, cws, xs, nonce=None,
                 aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        lo, hi = self._split_u128(xs)
        _, lo_p = self._u64(lo)
        _, hi_p = self._u64(hi)
        ys = np.zeros((len(lo), 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        self._lib.fss_dpf_eval(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0_p, cws_p, lo_p, hi_p,
            ctypes.c_int64(len(lo)), ys_p)
        return ys

    def dpf_eval_batch(self, in_bits: int, prg_kind: int, group_kind: int,
                       group_bits: int, party: int, s0s, cws_batch, xs,
                       nonce=None, aes_keys=None,
                       rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0s_a, s0s_p = self._u32(s0s)
        cws_a, cws_p = self._u32(cws_batch)
        lo = np.ascontiguousarray(xs, dtype=np.uint64)
        _, lo_p = self._u64(lo)
        n = len(lo)
        ys = np.zeros((n, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        self._lib.fss_dpf_eval_batch(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0s_p, cws_p, lo_p, ctypes.c_int64(n),
            ys_p)
        return ys

    def dcf_gen(self, in_bits: int, prg_kind: int, group_kind: int,
                group_bits: int, pred: str, s0s, alpha: int, beta,
                nonce=None, aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0s_a, s0s_p = self._u32(s0s)
        beta_a, beta_p = self._u32(beta)
        cws = np.zeros((in_bits + 1, 8), dtype=np.uint32)
        _, cws_p = self._u32(cws)
        self._lib.fss_dcf_gen(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(1 if pred == "lt" else 0), s0s_p,
            ctypes.c_uint64(alpha & (2**64 - 1)),
            ctypes.c_uint64(alpha >> 64), beta_p, cws_p)
        return cws

    def dcf_eval(self, in_bits: int, prg_kind: int, group_kind: int,
                 group_bits: int, party: int, s0, cws, xs, nonce=None,
                 aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        lo, hi = self._split_u128(xs)
        _, lo_p = self._u64(lo)
        _, hi_p = self._u64(hi)
        ys = np.zeros((len(lo), 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        self._lib.fss_dcf_eval(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0_p, cws_p, lo_p, hi_p,
            ctypes.c_int64(len(lo)), ys_p)
        return ys

    def dcf_eval_all(self, in_bits: int, prg_kind: int, group_kind: int,
                     group_bits: int, party: int, s0, cws, nonce=None,
                     aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        n = 1 << in_bits
        ys = np.zeros((n, 4), dtype=np.uint32)
        scratch = np.zeros((n, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        _, sc_p = self._u32(scratch)
        self._lib.fss_dcf_eval_all(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0_p, cws_p, ys_p, sc_p)
        return ys

    def ht_gen(self, in_bits: int, prg_kind: int, group_kind: int,
               group_bits: int, hash_key, s0s, alpha: int, beta,
               nonce=None, aes_keys=None, rounds: int = 20):
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_a, hk_p = self._u32(hash_key)
        s0s_a, s0s_p = self._u32(s0s)
        beta_a, beta_p = self._u32(beta)
        cws = np.zeros((in_bits, 8), dtype=np.uint32)
        ocw = np.zeros(4, dtype=np.uint32)
        _, cws_p = self._u32(cws)
        _, ocw_p = self._u32(ocw)
        self._lib.fss_ht_gen(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            hk_p, s0s_p, ctypes.c_uint64(alpha & (2**64 - 1)),
            ctypes.c_uint64(alpha >> 64), beta_p, cws_p, ocw_p)
        return cws, ocw

    def ht_eval(self, in_bits: int, prg_kind: int, group_kind: int,
                group_bits: int, party: int, hash_key, s0, cws, ocw, xs,
                nonce=None, aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_a, hk_p = self._u32(hash_key)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        ocw_a, ocw_p = self._u32(ocw)
        lo, hi = self._split_u128(xs)
        _, lo_p = self._u64(lo)
        _, hi_p = self._u64(hi)
        ys = np.zeros((len(lo), 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        self._lib.fss_ht_eval(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), hk_p, s0_p, cws_p, ocw_p, lo_p, hi_p,
            ctypes.c_int64(len(lo)), ys_p)
        return ys

    def dcf_gen_batch(self, in_bits: int, prg_kind: int, group_kind: int,
                      group_bits: int, pred_lt, s0s, alphas, betas,
                      nonce=None, aes_keys=None,
                      rounds: int = 20) -> np.ndarray:
        # Accept the same "lt"/"gt" strings as dcf_gen besides the raw
        # int flag, so the two wrappers cannot silently disagree.
        if isinstance(pred_lt, str):
            pred_lt = 1 if pred_lt == "lt" else 0
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0s_a, s0s_p = self._u32(s0s)
        a_a, a_p = self._u64(np.asarray(alphas, dtype=np.uint64))
        b_a, b_p = self._u32(betas)
        n = len(a_a)
        cws = np.zeros((n, in_bits + 1, 8), dtype=np.uint32)
        _, cws_p = self._u32(cws)
        self._lib.fss_dcf_gen_batch(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(pred_lt), s0s_p, a_p, b_p, ctypes.c_int64(n),
            cws_p)
        return cws

    def ht_gen_batch(self, in_bits: int, prg_kind: int, group_kind: int,
                     group_bits: int, hash_key, s0s, alphas, betas,
                     nonce=None, aes_keys=None, rounds: int = 20):
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_a, hk_p = self._u32(hash_key)
        s0s_a, s0s_p = self._u32(s0s)
        a_a, a_p = self._u64(np.asarray(alphas, dtype=np.uint64))
        b_a, b_p = self._u32(betas)
        n = len(a_a)
        cws = np.zeros((n, in_bits, 8), dtype=np.uint32)
        ocws = np.zeros((n, 4), dtype=np.uint32)
        _, cws_p = self._u32(cws)
        _, ocw_p = self._u32(ocws)
        self._lib.fss_ht_gen_batch(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            hk_p, s0s_p, a_p, b_p, ctypes.c_int64(n), cws_p, ocw_p)
        return cws, ocws

    def vdpf_gen_batch(self, in_bits: int, prg_kind: int, hash_kind: int,
                       hash_key: bytes, group_kind: int, group_bits: int,
                       s0s, alphas, betas, nonce=None, aes_keys=None,
                       rounds: int = 20):
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hkh, hk_p = self._u8(hash_key)
        s0s_a, s0s_p = self._u32(s0s)
        a_a, a_p = self._u64(np.asarray(alphas, dtype=np.uint64))
        b_a, b_p = self._u32(betas)
        n = len(a_a)
        cws = np.zeros((n, in_bits, 8), dtype=np.uint32)
        cs = np.zeros((n, 4, 4), dtype=np.uint32)
        ocws = np.zeros((n, 4), dtype=np.uint32)
        fails = np.zeros(n, dtype=np.int32)
        _, cws_p = self._u32(cws)
        _, cs_p = self._u32(cs)
        _, ocw_p = self._u32(ocws)
        f_p = fails.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        self._lib.fss_vdpf_gen_batch(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(hash_kind), hk_p,
            ctypes.c_int(group_kind), ctypes.c_int(group_bits), s0s_p, a_p,
            b_p, ctypes.c_int64(n), cws_p, cs_p, ocw_p, f_p)
        return cws, cs, ocws, fails

    def ht_eval_all(self, in_bits: int, prg_kind: int, group_kind: int,
                    group_bits: int, party: int, hash_key, s0, cws, ocw,
                    nonce=None, aes_keys=None,
                    rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_a, hk_p = self._u32(hash_key)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        ocw_a, ocw_p = self._u32(ocw)
        ys = np.zeros((1 << in_bits, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        self._lib.fss_ht_eval_all(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), hk_p, s0_p, cws_p, ocw_p, ys_p)
        return ys

    # hash_kind 0 = sha256 (hash_key: 16B), 1 = blake3 (hash_key: 32B iv)
    def vdpf_gen(self, in_bits: int, prg_kind: int, hash_kind: int,
                 hash_key: bytes, group_kind: int, group_bits: int, s0s,
                 alpha: int, beta, nonce=None, aes_keys=None,
                 rounds: int = 20):
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_hold, hk_p = self._u8(hash_key)
        s0s_a, s0s_p = self._u32(s0s)
        beta_a, beta_p = self._u32(beta)
        cws = np.zeros((in_bits, 8), dtype=np.uint32)
        cs = np.zeros((4, 4), dtype=np.uint32)
        ocw = np.zeros(4, dtype=np.uint32)
        _, cws_p = self._u32(cws)
        _, cs_p = self._u32(cs)
        _, ocw_p = self._u32(ocw)
        self._lib.fss_vdpf_gen.restype = ctypes.c_int
        fail = self._lib.fss_vdpf_gen(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(hash_kind), hk_p,
            ctypes.c_int(group_kind), ctypes.c_int(group_bits), s0s_p,
            ctypes.c_uint64(int(alpha) & (2**64 - 1)),
            ctypes.c_uint64(int(alpha) >> 64), beta_p, cws_p, cs_p, ocw_p)
        return cws, cs, ocw, int(fail)

    def vdpf_eval_batch(self, in_bits: int, prg_kind: int, hash_kind: int,
                        hash_key: bytes, group_kind: int, group_bits: int,
                        party: int, s0, cws, cs, ocw, xs, nonce=None,
                        aes_keys=None, rounds: int = 20):
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_hold, hk_p = self._u8(hash_key)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        cs_a, cs_p = self._u32(cs)
        ocw_a, ocw_p = self._u32(ocw)
        lo, hi = self._split_u128(xs)
        _, lo_p = self._u64(lo)
        _, hi_p = self._u64(hi)
        ys = np.zeros((len(lo), 4), dtype=np.uint32)
        pts = np.zeros((len(lo), 4, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        _, pts_p = self._u32(pts)
        self._lib.fss_vdpf_eval_batch(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(hash_kind), hk_p,
            ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0_p, cws_p, cs_p, ocw_p, lo_p, hi_p,
            ctypes.c_int64(len(lo)), ys_p, pts_p)
        return ys, pts

    def vdpf_prove(self, hash_kind: int, hash_key: bytes, pi_tildes,
                   cs) -> np.ndarray:
        hk_hold, hk_p = self._u8(hash_key)
        pts_a, pts_p = self._u32(pi_tildes)
        cs_a, cs_p = self._u32(cs)
        n = pts_a.reshape(-1, 4, 4).shape[0]
        pi = np.zeros((4, 4), dtype=np.uint32)
        _, pi_p = self._u32(pi)
        self._lib.fss_vdpf_prove(ctypes.c_int(hash_kind), hk_p, pts_p,
                                 ctypes.c_int64(n), cs_p, pi_p)
        return pi

    def vdpf_prove1_batch(self, hash_kind: int, hash_key: bytes,
                          pi_tildes, cs) -> np.ndarray:
        """n independent single-fold proofs: pis[j] = Prove([pt_j], cs).

        Mirrors the reference Prove benchmark's per-iteration work
        (bench_cpu.cu:408-435), where each timed iteration folds exactly
        one corrected hash starting from cs.
        """
        hk_hold, hk_p = self._u8(hash_key)
        pts_a, pts_p = self._u32(pi_tildes)
        cs_a, cs_p = self._u32(cs)
        n = pts_a.reshape(-1, 4, 4).shape[0]
        pis = np.zeros((n, 4, 4), dtype=np.uint32)
        _, pis_p = self._u32(pis)
        self._lib.fss_vdpf_prove1_batch(ctypes.c_int(hash_kind), hk_p,
                                        pts_p, ctypes.c_int64(n), cs_p,
                                        pis_p)
        return pis

    def vdpf_eval_all(self, in_bits: int, prg_kind: int, hash_kind: int,
                      hash_key: bytes, group_kind: int, group_bits: int,
                      party: int, s0, cws, cs, ocw, nonce=None,
                      aes_keys=None, rounds: int = 20):
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hk_hold, hk_p = self._u8(hash_key)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        cs_a, cs_p = self._u32(cs)
        ocw_a, ocw_p = self._u32(ocw)
        ys = np.zeros((1 << in_bits, 4), dtype=np.uint32)
        pi = np.zeros((4, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        _, pi_p = self._u32(pi)
        self._lib.fss_vdpf_eval_all(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(hash_kind), hk_p,
            ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0_p, cws_p, cs_p, ocw_p, ys_p, pi_p)
        return ys, pi

    def grotto_preprocess(self, in_bits: int, prg_kind: int, party: int,
                          s0, cws, nonce=None, aes_keys=None,
                          rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        n = 1 << in_bits
        scratch = np.zeros((n, 4), dtype=np.uint32)
        pt = np.zeros(2 * n - 1, dtype=np.uint8)
        _, sc_p = self._u32(scratch)
        _, pt_p = self._u8(pt)
        self._lib.fss_grotto_preprocess(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(party), s0_p, cws_p, sc_p, pt_p)
        return pt

    def grotto_eval_batch(self, in_bits: int, pt, xs) -> np.ndarray:
        pt_a, pt_p = self._u8(pt)
        xs_a, xs_p = self._u64(np.asarray(xs, dtype=np.uint64))
        out = np.zeros(len(xs_a), dtype=np.uint8)
        _, out_p = self._u8(out)
        self._lib.fss_grotto_eval_batch(
            ctypes.c_int(in_bits), pt_p, xs_p, ctypes.c_int64(len(xs_a)),
            out_p)
        return out

    def grotto_pack_tree(self, pt) -> np.ndarray:
        pt_a, pt_p = self._u8(pt)
        n2 = len(pt_a)
        packed = np.zeros((n2 + 63) // 64, dtype=np.uint64)
        _, pk_p = self._u64(packed)
        self._lib.fss_grotto_pack_tree(pt_p, ctypes.c_uint64(n2), pk_p)
        return packed

    def grotto_eval_batch_packed(self, in_bits: int, packed,
                                 xs) -> np.ndarray:
        pk_a, pk_p = self._u64(packed)
        xs_a, xs_p = self._u64(np.asarray(xs, dtype=np.uint64))
        out = np.zeros(len(xs_a), dtype=np.uint8)
        _, out_p = self._u8(out)
        self._lib.fss_grotto_eval_batch_packed(
            ctypes.c_int(in_bits), pk_p, xs_p, ctypes.c_int64(len(xs_a)),
            out_p)
        return out

    def grotto_eval_all(self, in_bits: int, prg_kind: int, party: int, s0,
                        cws, nonce=None, aes_keys=None,
                        rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        n = 1 << in_bits
        scratch = np.zeros((n, 4), dtype=np.uint32)
        ys = np.zeros(n, dtype=np.uint8)
        _, sc_p = self._u32(scratch)
        _, ys_p = self._u8(ys)
        self._lib.fss_grotto_eval_all(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(party), s0_p, cws_p, sc_p, ys_p)
        return ys

    def sha256(self, data: bytes) -> bytes:
        d_hold, d_p = self._u8(data)
        out = np.zeros(32, dtype=np.uint8)
        _, out_p = self._u8(out)
        self._lib.fss_sha256(d_p, ctypes.c_int64(len(data)), out_p)
        return out.tobytes()

    def blake3_compress(self, iv, m, block_len: int) -> np.ndarray:
        iv_a, iv_p = self._u32(iv)
        m_a, m_p = self._u32(m)
        out = np.zeros(16, dtype=np.uint32)
        _, out_p = self._u32(out)
        self._lib.fss_blake3_compress(iv_p, m_p,
                                      ctypes.c_uint32(block_len), out_p)
        return out

    def vdmpf_gen(self, bucket_bits: int, prg_kind: int, hash_kind: int,
                  hash_key: bytes, group_kind: int, group_bits: int,
                  sigma: bytes, n: int, m: int, m_rt: int, b_size: int,
                  kappa: int, s0s, alphas, betas, ch_retry: int = 1000,
                  nonce=None, aes_keys=None, rounds: int = 20):
        """Native VDMPF Gen (vdmpf.cuh:135-189): Cuckoo placement with
        the reference's mt19937(42) stream + per-bucket inner VDPF Gens.
        s0s [m,2,4]; returns (cws [m,bb,8], cs [m,4,4], ocw [m,4], fail).
        """
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hkh, hk_p = self._u8(hash_key)
        sgh, sg_p = self._u8(sigma)
        s0s_a, s0s_p = self._u32(s0s)
        a_a, a_p = self._u64(np.asarray(alphas, dtype=np.uint64))
        b_a, b_p = self._u32(betas)
        cws = np.zeros((m, bucket_bits, 8), dtype=np.uint32)
        cs = np.zeros((m, 4, 4), dtype=np.uint32)
        ocw = np.zeros((m, 4), dtype=np.uint32)
        _, cws_p = self._u32(cws)
        _, cs_p = self._u32(cs)
        _, ocw_p = self._u32(ocw)
        self._lib.fss_vdmpf_gen.restype = ctypes.c_int
        fail = self._lib.fss_vdmpf_gen(
            ctypes.c_int(bucket_bits), ctypes.c_int(prg_kind), nonce_p,
            keys_p, rounds_c, ctypes.c_int(hash_kind), hk_p,
            ctypes.c_int(group_kind), ctypes.c_int(group_bits), sg_p,
            ctypes.c_uint64(n), ctypes.c_int(m), ctypes.c_int(m_rt),
            ctypes.c_int(b_size), ctypes.c_int(kappa), s0s_p, a_p, b_p,
            ctypes.c_int(len(a_a)), ctypes.c_int(ch_retry), cws_p, cs_p,
            ocw_p)
        return cws, cs, ocw, int(fail)

    def vdmpf_batch_eval(self, bucket_bits: int, prg_kind: int,
                         hash_kind: int, hash_key: bytes, group_kind: int,
                         group_bits: int, party: int, sigma: bytes,
                         n: int, m: int, b_size: int, kappa: int, s0, cws,
                         cs, ocw, xs, nonce=None, aes_keys=None,
                         rounds: int = 20):
        """Full native BatchEval (vdmpf.cuh:202-270): routing, inner
        VDPF evals, group accumulation, and the reference proof chain.
        s0 [m,4], cws [m,bucket_bits,8], cs [m,4,4], ocw [m,4]."""
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        hkh, hk_p = self._u8(hash_key)
        sgh, sg_p = self._u8(sigma)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        cs_a, cs_p = self._u32(cs)
        ocw_a, ocw_p = self._u32(ocw)
        xs_a, xs_p = self._u64(np.asarray(xs, dtype=np.uint64))
        eta = len(xs_a)
        ys = np.zeros((eta, 4), dtype=np.uint32)
        pi = np.zeros((4, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        _, pi_p = self._u32(pi)
        self._lib.fss_vdmpf_batch_eval(
            ctypes.c_int(bucket_bits), ctypes.c_int(prg_kind), nonce_p,
            keys_p, rounds_c, ctypes.c_int(hash_kind), hk_p,
            ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), sg_p, ctypes.c_uint64(n),
            ctypes.c_int(m), ctypes.c_int(b_size), ctypes.c_int(kappa),
            s0_p, cws_p, cs_p, ocw_p, xs_p, ctypes.c_int64(eta), ys_p,
            pi_p)
        return ys, pi

    def vdmpf_route(self, sigma: bytes, n: int, b_size: int, kappa: int,
                    xs):
        sg_hold, sg_p = self._u8(sigma)
        xs_a, xs_p = self._u64(np.asarray(xs, dtype=np.uint64))
        eta = len(xs_a)
        bucket = np.zeros((eta, kappa), dtype=np.int32)
        index = np.zeros((eta, kappa), dtype=np.int32)
        bk_p = bucket.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        ix_p = index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        self._lib.fss_vdmpf_route(
            sg_p, ctypes.c_uint64(n), ctypes.c_int(b_size),
            ctypes.c_int(kappa), xs_p, ctypes.c_int64(eta), bk_p, ix_p)
        return bucket, index

    def prp_permu_batch(self, sigma: bytes, domain: int,
                        xs) -> np.ndarray:
        """Batched Feistel PRP (prp/aes128_feistel.cuh semantics).
        Requires AES-NI."""
        assert self.has_aesni
        sig, sig_p = self._u8(sigma)
        lo = np.ascontiguousarray(xs, dtype=np.uint64)
        _, lo_p = self._u64(lo)
        n = len(lo)
        ys = np.zeros(n, dtype=np.uint64)
        _, ys_p = self._u64(ys)
        self._lib.fss_prp_permu_batch(sig_p, ctypes.c_uint64(domain),
                                      lo_p, ctypes.c_int64(n), ys_p)
        return ys

    def dpf_eval_all(self, in_bits: int, prg_kind: int, group_kind: int,
                     group_bits: int, party: int, s0, cws, nonce=None,
                     aes_keys=None, rounds: int = 20) -> np.ndarray:
        nh, nonce_p, kh, keys_p, rounds_c = self._prg_args(
            prg_kind, nonce, aes_keys, rounds)
        s0_a, s0_p = self._u32(s0)
        cws_a, cws_p = self._u32(cws)
        ys = np.zeros((1 << in_bits, 4), dtype=np.uint32)
        _, ys_p = self._u32(ys)
        self._lib.fss_dpf_eval_all(
            ctypes.c_int(in_bits), ctypes.c_int(prg_kind), nonce_p, keys_p,
            rounds_c, ctypes.c_int(group_kind), ctypes.c_int(group_bits),
            ctypes.c_int(party), s0_p, cws_p, ys_p)
        return ys


def engine() -> NativeEngine:
    """Process-wide singleton (compiles the library on first use)."""
    global _ENGINE
    if _ENGINE is None:
        _ENGINE = NativeEngine()
    return _ENGINE
