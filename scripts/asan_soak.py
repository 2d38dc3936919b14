"""AddressSanitizer soak of the native engine's hand-written SIMD.

Exercises every engine entry point (no JAX in-process) over random
configs: both PRGs, all groups, in_bits 1..16 (covers the sub-VAES
scalar tails), gen/eval/eval_all/batch/prove/route. Any OOB/UAF in the
AES-NI / VAES-512 / SHA-NI paths aborts with an ASAN report.

Builds an instrumented .so, then re-executes itself under LD_PRELOADed
libasan. Run: python scripts/asan_soak.py [n_trials]   (make asan)
"""
import os
import pathlib
import subprocess
import sys

import numpy as np

SO = "/tmp/fss_native_asan.so"
SRC = str(pathlib.Path(__file__).resolve().parent.parent
          / "fss_tpu" / "native" / "src" / "fss_native.cpp")

if os.environ.get("FSS_ASAN_CHILD") != "1":
    libasan = subprocess.run(
        ["gcc", "-print-file-name=libasan.so"], capture_output=True,
        text=True, check=True).stdout.strip()
    extra = []
    with open("/proc/cpuinfo") as f:
        flags = f.read()
    if " vaes" in flags and " avx512f" in flags:
        extra = ["-mvaes", "-mavx512f", "-mavx512bw", "-mavx512vl",
                 "-mavx512dq", "-DFSS_BUILD_VAES512=1"]
    subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-shared", "-fPIC", "-maes",
         "-msse4.2", *extra, "-fsanitize=address",
         "-fno-omit-frame-pointer", "-o", SO, SRC], check=True)
    env = dict(os.environ, FSS_ASAN_CHILD="1", LD_PRELOAD=libasan,
               ASAN_OPTIONS="detect_leaks=0")
    env["PYTHONPATH"] = str(pathlib.Path(SRC).parents[3])
    raise SystemExit(subprocess.run(
        [sys.executable, __file__, *sys.argv[1:]], env=env).returncode)

import fss_tpu.native as native  # noqa: E402

native._build = lambda: SO
eng = native.engine()
print("ASAN engine loaded; has_aesni =", eng.has_aesni, flush=True)

rng = np.random.default_rng(99)
U, BY = native.GROUP_UINT, native.GROUP_BYTES
AES, CHA = native.PRG_AES128_MMO, native.PRG_CHACHA
NONCE = (123, 456)


def keys(n):
    return tuple(bytes(rng.integers(0, 256, 16, dtype=np.uint8))
                 for _ in range(n))


for trial in range(int(sys.argv[1]) if len(sys.argv) > 1 else 6):
    # Every third trial walks a wide domain (u128 lo/hi input paths);
    # full-domain ops are skipped there (2^48+ leaves).
    wide = trial % 3 == 2
    ib = int(rng.choice([33, 48, 64, 97, 127] if wide
                        else [1, 2, 3, 5, 7, 8, 11, 13, 16]))
    gk, gb = [(U, 16), (U, 32), (U, 64), (U, 128), (BY, 0)][trial % 5]
    pk = AES if trial % 2 == 0 else CHA
    k2, k4 = keys(2), keys(4)
    pa2 = dict(aes_keys=k2) if pk == AES else dict(nonce=NONCE)
    pa4 = dict(aes_keys=k4) if pk == AES else dict(nonce=NONCE)
    dom = 1 << min(ib, 63)
    alpha = int(rng.integers(0, dom))
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    xs = rng.integers(0, dom, size=33, dtype=np.uint64)

    # PRG
    eng.prg(pk, 2, s0s[0], **pa2)
    # DPF gen/eval/eval_all + batches
    cws = eng.dpf_gen(ib, pk, gk, gb, s0s, alpha, beta, **pa2)
    y0 = eng.dpf_eval(ib, pk, gk, gb, 0, s0s[0], cws, xs, **pa2)
    y1 = eng.dpf_eval(ib, pk, gk, gb, 1, s0s[1], cws, xs, **pa2)
    if not wide:
        a0 = eng.dpf_eval_all(ib, pk, gk, gb, 0, s0s[0], cws, **pa2)
        a1 = eng.dpf_eval_all(ib, pk, gk, gb, 1, s0s[1], cws, **pa2)
    if not wide and gk == BY:
        rec = a0 ^ a1
        exp = beta.copy()
        exp[3] &= 0xFFFFFFFE  # clamped bit (lambda=127) is dropped
        assert np.array_equal(rec[alpha], exp)
    B = 17
    s0sb = rng.integers(0, 2**32, size=(B, 2, 4), dtype=np.uint32)
    alphas = rng.integers(0, dom, size=B, dtype=np.uint64)
    betas = rng.integers(0, 2**32, size=(B, 4), dtype=np.uint32)
    eng.dpf_gen_batch(ib, pk, gk, gb, s0sb, alphas, betas, **pa2)
    cwsb = np.broadcast_to(cws, (B,) + cws.shape).copy()
    eng.dpf_eval_batch(ib, pk, gk, gb, 0,
                       np.broadcast_to(s0s[0], (B, 4)).copy(), cwsb,
                       xs[:B], **pa2)
    # DCF
    for pred in ("lt", "gt"):
        dc = eng.dcf_gen(ib, pk, gk, gb, pred, s0s, alpha, beta, **pa4)
        eng.dcf_eval(ib, pk, gk, gb, 0, s0s[0], dc, xs, **pa4)
        if not wide:
            eng.dcf_eval_all(ib, pk, gk, gb, 0, s0s[0], dc, **pa4)
            eng.dcf_eval_all(ib, pk, gk, gb, 1, s0s[1], dc, **pa4)
    eng.dcf_gen_batch(ib, pk, gk, gb, 1, s0sb, alphas, betas, **pa4)
    # Half-Tree
    hk = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    hcw, ocw = eng.ht_gen(ib, pk, gk, gb, hk, s0s, alpha, beta, **pa2)
    eng.ht_eval(ib, pk, gk, gb, 0, hk, s0s[0], hcw, ocw, xs, **pa2)
    if not wide:
        eng.ht_eval_all(ib, pk, gk, gb, 0, hk, s0s[0], hcw, ocw, **pa2)
    eng.ht_gen_batch(ib, pk, gk, gb, hk, s0sb, alphas, betas, **pa2)
    # VDPF (uint only; hash kinds 0=sha256, 1=blake3)
    if gk == U and gb <= 64 and not wide:
        hkey = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        for hkind in (0, 1):
            vg = eng.vdpf_gen(ib, pk, hkind, hkey, gk, gb, s0s, alpha,
                              beta, **pa2)
            vcws, vcs, vocw, fail = vg
            if fail:
                continue
            ys, pts = eng.vdpf_eval_batch(ib, pk, hkind, hkey, gk, gb, 0,
                                          s0s[0], vcws, vcs, vocw, xs,
                                          **pa2)
            eng.vdpf_prove(hkind, hkey, pts, vcs)
            eng.vdpf_prove1_batch(hkind, hkey, pts, vcs)
            eng.vdpf_eval_all(ib, pk, hkind, hkey, gk, gb, 0, s0s[0],
                              vcws, vcs, vocw, **pa2)
        eng.vdpf_gen_batch(ib, pk, 1, hkey, gk, gb, s0sb, alphas, betas,
                           **pa2)
    # Grotto
    if wide:
        print(f"trial {trial}: ib={ib} (wide) gk={gk} gb={gb} "
              f"prg={pk} ok", flush=True)
        continue
    gcws = eng.dpf_gen(ib, pk, BY, 0, s0s, alpha,
                       np.array([1, 0, 0, 0], np.uint32), **pa2)
    pt = eng.grotto_preprocess(ib, pk, 0, s0s[0], gcws, **pa2)
    eng.grotto_eval_batch(ib, pt, xs)
    packed = eng.grotto_pack_tree(pt)
    eng.grotto_eval_batch_packed(ib, packed, xs)
    eng.grotto_eval_all(ib, pk, 0, s0s[0], gcws, **pa2)
    # hashes
    eng.sha256(bytes(rng.integers(0, 256, 80, dtype=np.uint8)))
    eng.blake3_compress(rng.integers(0, 2**32, 8, dtype=np.uint32),
                        rng.integers(0, 2**32, 16, dtype=np.uint32), 64)
    print(f"trial {trial}: ib={ib} gk={gk} gb={gb} prg={pk} ok",
          flush=True)

# VDMPF once (bigger machinery)
sigma = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
hkey = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
t, ib = 30, 12
alphas = rng.choice(1 << ib, size=t, replace=False).astype(np.uint64)
betas = rng.integers(0, 2**32, size=(t, 4), dtype=np.uint32)
m = 59  # ch_bucket(30, 80) analog; engine computes from args
eng.vdmpf_route(sigma, 1 << ib, (((1 << ib) * 3) // m) + 1, 3,
                np.arange(64, dtype=np.uint64))
print("vdmpf_route ok", flush=True)
print("ASAN soak: ALL OK", flush=True)
