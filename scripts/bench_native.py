"""Native host-engine benchmark: one row per reference CPU headline.

Mirrors the reference's bench_cpu registry (src/bench_cpu.cu:631-704)
name-for-name across DPF / DCF / VDPF / Half-Tree / Grotto x {Gen, Eval,
EvalAll, Prove, Preprocess}, single core, 20-bit domains, with the
reference's published Xeon 8352V numbers (its README.md:329-358) printed
alongside. "Aes" rows use the AES-NI engine (= the reference's
Aes128Mmo/Raw bit-identically); "ChaCha" the 20-round ChaCha variant.

Run: JAX_PLATFORMS=cpu python scripts/bench_native.py [--quick]
"""

import sys
import time

import numpy as np

from fss_tpu import native

IB = 20
N = 1 << IB
QUICK = "--quick" in sys.argv

# Reference single-core numbers (ns/op or ms total), README.md:329-358.
REF_NS = {
    "BM_DpfEval_Uint_Aes/20": 1704, "BM_DpfEval_Uint_Aes/14": 1117,
    "BM_DpfEval_Uint_Aes/17": 1408, "BM_DpfGen_Uint_Aes/20": 3226,
    "BM_DpfEval_Bytes_Aes/20": 1609, "BM_DpfEval_Uint_ChaCha/20": 44940,
    "BM_DpfEval_Uint_AesSoft/20": 16184,
    "BM_DcfEval_Uint_Aes/20": 4318, "BM_DcfGen_Uint_Aes/20": 7461,
    "BM_DcfEval_Bytes_Aes/20": 3685,
    "BM_VdpfEval_Uint_Aes_Sha256/20": 2959,
    "BM_VdpfGen_Uint_Aes_Sha256/20": 6000,
    "BM_VdpfEval_Uint_Aes_Blake3/20": 7354,
    "BM_VdpfProve_Uint_ChaCha_Blake3/20": 1890,
    "BM_HalfTreeDpfEval_Uint_Aes/20": 985,
    "BM_HalfTreeDpfGen_Uint_Aes/20": 2204,
    "BM_GrottoDcfEval_Aes/20": 46.9,
}
REF_MS = {
    "BM_DpfEvalAll_Uint_Aes/20": 166.8, "BM_DcfEvalAll_Uint_Aes/20": 267.2,
    "BM_DcfEvalAll_Bytes_Aes/20": 276.6,
    "BM_VdpfEvalAll_Uint_Aes_Sha256/20": 1425.0,
    "BM_HalfTreeDpfEvalAll_Uint_Aes/20": 97.7,
    "BM_GrottoDcfPreprocess_Aes/20": 130.9,
    "BM_GrottoDcfPreprocessEvalAll_Aes/20": 260.2,
}

ROWS = []


def _ref_here():
    """Same-silicon reference numbers: the reference's own bench harness
    compiled and run on THIS machine (scripts/ref_bench; ns per op).
    These are the honest comparison baseline — the published Xeon 8352V
    numbers above are kept as a secondary column."""
    import json
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ref_bench", "results_here.jsonl")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                out[row["name"]] = row["ns_per_iter"]
    return out


REF_HERE_NS = _ref_here()


def row_ns(name, dt_ns):
    ref = REF_NS.get(name)
    pub = f"pub {ref / dt_ns:5.1f}x" if ref else ""
    here = REF_HERE_NS.get(name)
    hs = f"  here {here / dt_ns:5.1f}x" if here else ""
    ROWS.append((name, f"{dt_ns:10.1f} ns/op",
                 f"(ref {ref} ns) {pub}{hs}" if ref or here else ""))


def row_ms(name, dt_ms):
    ref = REF_MS.get(name)
    pub = f"pub {ref / dt_ms:5.1f}x" if ref else ""
    here = REF_HERE_NS.get(name)
    hs = f"  here {here / 1e6 / dt_ms:5.1f}x" if here else ""
    ROWS.append((name, f"{dt_ms:10.2f} ms",
                 f"(ref {ref} ms) {pub}{hs}" if ref or here else ""))


def timeit(fn, reps):
    """Best-of-3 passes of ``reps`` calls: this shared VM sees multi-ms
    scheduler interruptions, so a single pass over a large batch reads
    the noise floor, not the code. Best-of matches the cross-run
    best-keeping protocol of bench_compare.py."""
    fn()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    eng = native.engine()
    rng = np.random.default_rng(1)
    keys4 = tuple(bytes(rng.integers(0, 256, 16, dtype=np.uint8))
                  for _ in range(4))
    nonce = (1, 2)
    hash_key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    b3_iv = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    htk = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    U, BY = native.GROUP_UINT, native.GROUP_BYTES
    AES, CHA = native.PRG_AES128_MMO, native.PRG_CHACHA
    print(f"AES-NI: {eng.has_aesni}; in_bits=20; single core")
    assert eng.has_aesni, "bench expects the AES-NI path"

    ne = 4000 if QUICK else 20000  # point-eval batch
    ng = 1000 if QUICK else 5000   # gen batch

    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = np.array([604, 0, 0, 0], dtype=np.uint32)
    xs = rng.integers(0, N, size=ne, dtype=np.uint64)
    s0sb = rng.integers(0, 2**32, size=(ng, 2, 4), dtype=np.uint32)
    alphas = rng.integers(0, N, size=ng, dtype=np.uint64)
    betas = rng.integers(0, 2**32, size=(ng, 4), dtype=np.uint32)

    # ---- DPF ----
    for ib in (20, 14, 17):
        xsi = rng.integers(0, 1 << ib, size=ne, dtype=np.uint64)
        cws = eng.dpf_gen(ib, AES, U, 32, s0s, 12345, beta,
                          aes_keys=keys4[:2])
        dt = timeit(lambda: eng.dpf_eval(ib, AES, U, 32, 0, s0s[0], cws,
                                         xsi, aes_keys=keys4[:2]), 1)
        row_ns(f"BM_DpfEval_Uint_Aes/{ib}", dt / ne * 1e9)
    cws = eng.dpf_gen(IB, AES, U, 32, s0s, 12345, beta, aes_keys=keys4[:2])
    dt = timeit(lambda: eng.dpf_gen_batch(IB, AES, U, 32, s0sb, alphas,
                                          betas, aes_keys=keys4[:2]), 1)
    row_ns("BM_DpfGen_Uint_Aes/20", dt / ng * 1e9)
    cws_by = eng.dpf_gen(IB, AES, BY, 0, s0s, 12345, beta,
                         aes_keys=keys4[:2])
    dt = timeit(lambda: eng.dpf_eval(IB, AES, BY, 0, 0, s0s[0], cws_by, xs,
                                     aes_keys=keys4[:2]), 1)
    row_ns("BM_DpfEval_Bytes_Aes/20", dt / ne * 1e9)
    dt = timeit(lambda: eng.dpf_eval_all(IB, AES, U, 32, 0, s0s[0], cws,
                                         aes_keys=keys4[:2]), 1)
    row_ms("BM_DpfEvalAll_Uint_Aes/20", dt * 1e3)
    cws_c = eng.dpf_gen(IB, CHA, U, 32, s0s, 12345, beta, nonce=nonce)
    dt = timeit(lambda: eng.dpf_eval(IB, CHA, U, 32, 0, s0s[0], cws_c, xs,
                                     nonce=nonce), 1)
    row_ns("BM_DpfEval_Uint_ChaCha/20", dt / ne * 1e9)
    # One AES engine covers Aes/AesRaw/AesSoft bit-identically; report the
    # same AES-NI number for the Raw alias rows.
    row_ns("BM_DpfEval_Uint_AesRaw/20",
            float(ROWS[0][1].split()[0]))

    # ---- DCF ----
    dcws = eng.dcf_gen(IB, AES, U, 32, "lt", s0s, 12345, beta,
                       aes_keys=keys4)
    dt = timeit(lambda: eng.dcf_eval(IB, AES, U, 32, 0, s0s[0], dcws,
                                     xs, aes_keys=keys4), 1)
    row_ns("BM_DcfEval_Uint_Aes/20", dt / ne * 1e9)
    dt = timeit(lambda: eng.dcf_gen_batch(IB, AES, U, 32, 1, s0sb, alphas,
                                          betas, aes_keys=keys4), 1)
    row_ns("BM_DcfGen_Uint_Aes/20", dt / ng * 1e9)
    dcws_by = eng.dcf_gen(IB, AES, BY, 0, "lt", s0s, 12345, beta,
                          aes_keys=keys4)
    dt = timeit(lambda: eng.dcf_eval(IB, AES, BY, 0, 0, s0s[0],
                                     dcws_by, xs, aes_keys=keys4), 1)
    row_ns("BM_DcfEval_Bytes_Aes/20", dt / ne * 1e9)
    dt = timeit(lambda: eng.dcf_eval_all(IB, AES, U, 32, 0, s0s[0], dcws,
                                         aes_keys=keys4), 1)
    row_ms("BM_DcfEvalAll_Uint_Aes/20", dt * 1e3)
    dt = timeit(lambda: eng.dcf_eval_all(IB, AES, BY, 0, 0, s0s[0],
                                         dcws_by, aes_keys=keys4), 1)
    row_ms("BM_DcfEvalAll_Bytes_Aes/20", dt * 1e3)

    # ---- VDPF ----
    for hname, hk, hkey in (("Sha256", 0, hash_key), ("Blake3", 1, b3_iv)):
        vcws, vcs, vocw, fail = eng.vdpf_gen(
            IB, AES, hk, hkey, U, 32, s0s, 12345, beta, aes_keys=keys4[:2])
        assert not fail
        dt = timeit(lambda: eng.vdpf_eval_batch(
            IB, AES, hk, hkey, U, 32, 0, s0s[0], vcws, vcs, vocw, xs,
            aes_keys=keys4[:2]), 1)
        row_ns(f"BM_VdpfEval_Uint_Aes_{hname}/20", dt / ne * 1e9)
        if hname == "Sha256":
            dt = timeit(lambda: eng.vdpf_gen_batch(
                IB, AES, hk, hkey, U, 32, s0sb, alphas, betas,
                aes_keys=keys4[:2]), 1)
            row_ns("BM_VdpfGen_Uint_Aes_Sha256/20", dt / ng * 1e9)
            dt = timeit(lambda: eng.vdpf_eval_all(
                IB, AES, hk, hkey, U, 32, 0, s0s[0], vcws, vcs, vocw,
                aes_keys=keys4[:2]), 1)
            row_ms("BM_VdpfEvalAll_Uint_Aes_Sha256/20", dt * 1e3)
    # Prove (ChaCha+Blake3 config). The reference's Prove bench times
    # pi = cs; fold ONE pi-tilde per iteration (bench_cpu.cu:408-435) —
    # independent iterations the CPU overlaps. Workload-parity row uses
    # the same shape (prove1_batch); the n-deep *dependent* fold chain
    # (the real multi-point Prove, pi feeds the next hash, pure latency)
    # is reported alongside as a harder supplementary row.
    vcws, vcs, vocw, fail = eng.vdpf_gen(IB, CHA, 1, b3_iv, U, 32, s0s,
                                         12345, beta, nonce=nonce)
    assert not fail
    _, pts = eng.vdpf_eval_batch(IB, CHA, 1, b3_iv, U, 32, 0, s0s[0],
                                 vcws, vcs, vocw, xs[:ng], nonce=nonce)
    dt = timeit(lambda: eng.vdpf_prove1_batch(1, b3_iv, pts, vcs), 1)
    row_ns("BM_VdpfProve_Uint_ChaCha_Blake3/20", dt / len(pts) * 1e9)
    dt = timeit(lambda: eng.vdpf_prove(1, b3_iv, pts, vcs), 1)
    row_ns(f"BM_VdpfProveChain_Uint_ChaCha_Blake3/{len(pts)}",
           dt / len(pts) * 1e9)

    # ---- Half-Tree ----
    hcws, hocw = eng.ht_gen(IB, AES, U, 32, htk, s0s, 12345, beta,
                            aes_keys=keys4[:1])
    dt = timeit(lambda: eng.ht_eval(IB, AES, U, 32, 0, htk, s0s[0], hcws,
                                    hocw, xs, aes_keys=keys4[:1]), 1)
    row_ns("BM_HalfTreeDpfEval_Uint_Aes/20", dt / ne * 1e9)
    dt = timeit(lambda: eng.ht_gen_batch(IB, AES, U, 32, htk, s0sb,
                                         alphas, betas,
                                         aes_keys=keys4[:1]), 1)
    row_ns("BM_HalfTreeDpfGen_Uint_Aes/20", dt / ng * 1e9)
    dt = timeit(lambda: eng.ht_eval_all(IB, AES, U, 32, 0, htk, s0s[0],
                                        hcws, hocw, aes_keys=keys4[:1]), 1)
    row_ms("BM_HalfTreeDpfEvalAll_Uint_Aes/20", dt * 1e3)

    # ---- Grotto ----
    gcws = eng.dpf_gen(IB, AES, BY, 0, s0s, 12345,
                       np.zeros(4, dtype=np.uint32), aes_keys=keys4[:2])
    pt = eng.grotto_preprocess(IB, AES, 0, s0s[0], gcws,
                               aes_keys=keys4[:2])
    packed = eng.grotto_pack_tree(pt)
    # The reference's Eval bench walks the SAME x=100 every iteration
    # over a byte-per-node bool ParityTree (bench_cpu.cu:546-571) — path
    # lines L1-warm, branches perfectly predicted. Workload-parity row
    # mirrors that exactly (grotto_eval_batch is the same byte-tree
    # walk). Random xs on the bit-packed branchless tree (the form that
    # stays ~29 ns regardless of query distribution, vs ~90 ns for the
    # branchy byte walk) is the harder supplementary row.
    xs_fixed = np.full(ne, 100, dtype=np.uint64)
    dt = timeit(lambda: eng.grotto_eval_batch(IB, pt, xs_fixed), 8)
    row_ns("BM_GrottoDcfEval_Aes/20", dt / ne * 1e9)
    dt = timeit(lambda: eng.grotto_eval_batch_packed(IB, packed, xs), 8)
    row_ns("BM_GrottoDcfEvalRandXs_Aes/20", dt / ne * 1e9)
    dt = timeit(lambda: eng.grotto_preprocess(IB, AES, 0, s0s[0], gcws,
                                              aes_keys=keys4[:2]), 1)
    row_ms("BM_GrottoDcfPreprocess_Aes/20", dt * 1e3)
    dt = timeit(lambda: eng.grotto_eval_all(IB, AES, 0, s0s[0], gcws,
                                            aes_keys=keys4[:2]), 1)
    row_ms("BM_GrottoDcfPreprocessEvalAll_Aes/20", dt * 1e3)

    width = max(len(r[0]) for r in ROWS)
    for name, val, ref in ROWS:
        print(f"{name:<{width}}  {val}  {ref}")


if __name__ == "__main__":
    main()
