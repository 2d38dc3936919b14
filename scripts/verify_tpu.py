#!/usr/bin/env python
"""Byte-exact verification of every fused Mosaic kernel family ON THE CHIP.

The test suite forces the CPU backend (tests/conftest.py) and validates the
Pallas kernels in interpret mode; nothing there ever executes on the real
TPU, and an XLA:TPU/Mosaic silent miscompile has been observed in this
workload class before (CLAUDE.md). This script closes that gap: it loads
the golden vectors produced by the COMPILED REFERENCE
(tests/golden/vectors/*.json, see tests/golden/README.md) and runs every
fused kernel family on the actual device, asserting byte equality of the
outputs against the reference-produced bytes — the TPU analog of the
reference checking its device results for real (samples/dpf_dcf_gpu.cu:
137-166).

Families covered (each golden config runs both parties where applicable):
  - DPF / DCF / Half-Tree / VDPF fused point-eval kernels (ChaCha)
  - The plane-domain bitsliced AES kernels (DPF/DCF/HT/VDPF eval)
  - Wide-domain (48/128-bit) DPF point eval
  - Fused Gen kernels (DPF ChaCha + plane-domain AES / DCF / Half-Tree /
    VDPF)
  - Hybrid EvalAll kernels (DPF / DCF / Half-Tree / Grotto / VDPF),
    dispatched with force_kernel=True so the 16-bit golden domains take
    the Mosaic path they would at >= 18 bits
  - BLAKE3 Pallas hash kernels, SHA-256 device path
  - Grotto prefix-table point queries (device gathers)
  - VDMPF batch_eval with the reference proof chain (full mode)

Usage:
  python scripts/verify_tpu.py            # full sweep on the real TPU
  python scripts/verify_tpu.py --quick    # bench.py's pre-headline gate
  python scripts/verify_tpu.py --interpret  # script self-test on CPU

Exit status 0 with a "verify_tpu: N kernel configs byte-exact" line, or 1
with the first mismatching config named.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
VEC_DIR = REPO / "tests" / "golden" / "vectors"
B = 256  # replication factor: fills whole [rows, 128-lane] kernel tiles


class Mismatch(AssertionError):
    pass


def _load(name):
    return json.loads((VEC_DIR / f"{name}.json").read_text())


def _h2b(h: str) -> bytes:
    return bytes.fromhex(h)


def _h2u32(h: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(h), dtype="<u4").copy()


def _rows(hex_rows) -> np.ndarray:
    return np.stack([_h2u32(r) for r in hex_rows])


def _as_bytes(arr) -> bytes:
    return np.asarray(arr, dtype=np.uint32).tobytes()


def _group(case):
    from fss_tpu import groups
    return {
        "bytes": groups.Bytes(),
        "uint32": groups.Uint(32),
        "uint64": groups.Uint(64),
        "uint127": groups.Uint(128, mod=1 << 127),
        "uint127m": groups.Uint(128, mod=(1 << 127) - 1),
    }[case["group"]]


def _hashes(case):
    from fss_tpu.hash.blake3 import Blake3
    from fss_tpu.hash.sha256 import Sha256
    if case["hash"] == "sha256":
        return Sha256(tuple(_h2u32(case["hash_key"])))
    iv = np.concatenate([_h2u32(h) for h in case["blake3_iv"]])
    return Blake3(tuple(iv))


def _chacha_prg(case, mul):
    from fss_tpu.prg.chacha import ChaCha
    return ChaCha(mul=mul, nonce=(case["nonce_lo"], case["nonce_hi"]))


def _case_prg(case, mul):
    """The case's own PRG (tests/test_golden.py:52-57 semantics)."""
    if case["prg"] == "chacha":
        return _chacha_prg(case, mul)
    assert case["prg"] == "aes"
    from fss_tpu.prg.aes import Aes128Mmo
    return Aes128Mmo(mul=mul,
                     keys=tuple(_h2b(k) for k in case["aes_keys"][:mul]))


def _case_xs(case, in_bits, idx):
    """Golden xs tiled across the replication batch, in kernel layout."""
    from fss_tpu import block as blk
    xs_int = [int(h, 0) for h in case["xs"]]
    tiled = [xs_int[i] for i in idx]
    if in_bits <= 32:
        return np.asarray(tiled, dtype=np.uint32)
    return blk.pack_inputs(tiled, in_bits)


def _rep(arr):
    """Replicate a single-key array across the batch: [B, *arr.shape]."""
    return np.broadcast_to(arr, (B,) + arr.shape).copy()


def _expect(case, key, idx, words=4):
    """Expected [B, words] uint32 rows tiled like the xs batch."""
    exp = _rows(case[key])
    return exp[idx].reshape(len(idx), words)


def _check_rows(got, case, key, idx, label, words=4):
    got = np.asarray(got, dtype=np.uint32).reshape(B, -1)[:, :words]
    exp = _expect(case, key, idx, words)
    if not np.array_equal(got, exp):
        bad = int(np.nonzero(~(got == exp).all(axis=1))[0][0])
        raise Mismatch(
            f"{label}: row {bad} (x={case['xs'][bad % len(case['xs'])]}) "
            f"got {got[bad].tobytes().hex()} "
            f"want {exp[bad].tobytes().hex()}")


def _cid(case):
    parts = [case["prg"], case.get("hash", ""), case.get("group", ""),
             str(case["in_bits"]), case.get("pred", "")]
    return "-".join(p for p in parts if p)


# ---------------------------------------------------------------------------
# Point-eval kernels
# ---------------------------------------------------------------------------


def check_dpf_eval(interpret, quick=False):
    from fss_tpu.ops import dpf_pallas
    n_cfg = 0
    for case in _load("dpf")["cases"]:
        if case["prg"] != "chacha":
            continue
        # Quick mode: the headline's uint32 configs PLUS the widest
        # domain (in_bits=128) — the shape whose cw block compile-OOMed
        # scoped VMEM on-chip (window_campaign.err; now clamped by
        # dpf_pallas.clamp_block_rows) must stay covered by every gate.
        if quick and case.get("group") != "uint32" and case["in_bits"] <= 64:
            continue
        n = case["in_bits"]
        g = _group(case)
        nonce = (case["nonce_lo"], case["nonce_hi"])
        idx = np.arange(B) % len(case["xs"])
        xk = _case_xs(case, n, idx)
        cws = _rep(_rows(case["cws"]))
        for party in (0, 1):
            s0 = _rep(_h2u32(case["s0s"][party]))
            got = dpf_pallas.eval_points(nonce, g, n, party, s0, cws, xk,
                                         interpret=interpret)
            _check_rows(got, case, f"ys{party}", idx,
                        f"dpf_eval[{_cid(case)}] party{party}")
            n_cfg += 1
    return n_cfg


def check_dpf_eval_aes(interpret, quick=False):
    from fss_tpu.ops import aes_pallas
    n_cfg = 0
    for case in _load("dpf")["cases"]:
        if case["prg"] != "aes":
            continue
        if quick and case["in_bits"] < 16:
            continue
        n = case["in_bits"]
        g = _group(case)
        keys = tuple(_h2b(k) for k in case["aes_keys"][:2])
        idx = np.arange(B) % len(case["xs"])
        xk = _case_xs(case, n, idx)
        cws = _rep(_rows(case["cws"]))
        for party in (0, 1):
            s0 = _rep(_h2u32(case["s0s"][party]))
            got = aes_pallas.eval_points(keys, g, n, party, s0, cws, xk,
                                         interpret=interpret)
            _check_rows(got, case, f"ys{party}", idx,
                        f"dpf_eval_aes[{_cid(case)}] party{party}")
            n_cfg += 1
    return n_cfg


def check_dcf_eval(interpret, quick=False):
    from fss_tpu.ops import aes_pallas, dcf_pallas
    n_cfg = 0
    seen_prg: set[str] = set()
    for case in _load("dcf")["cases"]:
        g = _group(case)
        if not dcf_pallas.kernel_supports_group(g):
            continue
        if quick:
            # One config per PRG backend: the ChaCha and the AES DCF
            # kernels are distinct Mosaic programs, and the AES one is
            # the kernel that faulted the TPU worker on 2026-08-19.
            if case["prg"] in seen_prg:
                continue
            seen_prg.add(case["prg"])
        n = case["in_bits"]
        idx = np.arange(B) % len(case["xs"])
        xk = _case_xs(case, n, idx)
        cws = _rep(_rows(case["cws"]))
        for party in (0, 1):
            s0 = _rep(_h2u32(case["s0s"][party]))
            if case["prg"] == "chacha":
                nonce = (case["nonce_lo"], case["nonce_hi"])
                got = dcf_pallas.eval_points(nonce, g, n, party, s0, cws,
                                             xk, interpret=interpret)
            else:
                keys = tuple(_h2b(k) for k in case["aes_keys"][:4])
                got = aes_pallas.dcf_eval_points(keys, g, n, party, s0,
                                                 cws, xk,
                                                 interpret=interpret)
            _check_rows(got, case, f"ys{party}", idx,
                        f"dcf_eval[{_cid(case)}] party{party}")
            n_cfg += 1
    return n_cfg


def check_ht_eval(interpret, quick=False):
    from fss_tpu.ops import aes_pallas, ht_pallas
    n_cfg = 0
    seen_prg: set[str] = set()
    for case in _load("half_tree")["cases"]:
        if quick:
            if case["prg"] in seen_prg:
                continue
            seen_prg.add(case["prg"])
        n = case["in_bits"]
        g = _group(case)
        hk = _h2u32(case["hash_key"])
        idx = np.arange(B) % len(case["xs"])
        xk = _case_xs(case, n, idx)
        cws = _rep(_rows(case["cws"]))
        ocw = _rep(_h2u32(case["ocw"]))
        for party in (0, 1):
            s0 = _rep(_h2u32(case["s0s"][party]))
            if case["prg"] == "chacha":
                nonce = (case["nonce_lo"], case["nonce_hi"])
                got = ht_pallas.eval_points(nonce, g, n, party, hk, s0,
                                            cws, ocw, xk,
                                            interpret=interpret)
            else:
                keys = (_h2b(case["aes_keys"][0]),)
                got = aes_pallas.ht_eval_points(keys, g, n, party, hk, s0,
                                                cws, ocw, xk,
                                                interpret=interpret)
            _check_rows(got, case, f"ys{party}", idx,
                        f"ht_eval[{_cid(case)}] party{party}")
            n_cfg += 1
    return n_cfg


def check_vdpf_eval(interpret, quick=False):
    from fss_tpu.ops import aes_pallas, vdpf_pallas
    n_cfg = 0
    seen_prg: set[str] = set()
    for case in _load("vdpf")["cases"]:
        if quick:
            if case["prg"] in seen_prg:
                continue
            seen_prg.add(case["prg"])
        n = case["in_bits"]
        g = _group(case)
        h = _hashes(case)
        idx = np.arange(B) % len(case["xs"])
        xk = _case_xs(case, n, idx)
        cws = _rep(_rows(case["cws"]))
        cs = _rep(_rows(case["cs"]))
        ocw = _rep(_h2u32(case["ocw"]))
        for party in (0, 1):
            s0 = _rep(_h2u32(case["s0s"][party]))
            if case["prg"] == "chacha":
                nonce = (case["nonce_lo"], case["nonce_hi"])
                ys, pts = vdpf_pallas.eval_points(
                    nonce, h.xor_hash, g, n, party, s0, cws, cs, ocw, xk,
                    interpret=interpret)
            else:
                keys = tuple(_h2b(k) for k in case["aes_keys"][:2])
                ys, pts = aes_pallas.vdpf_eval_points(
                    keys, h.xor_hash, g, n, party, s0, cws, cs, ocw, xk,
                    interpret=interpret)
            _check_rows(ys, case, f"ys{party}", idx,
                        f"vdpf_eval[{_cid(case)}] party{party} ys")
            _check_rows(np.asarray(pts).reshape(B, 16), case,
                        f"pi_tildes{party}", idx,
                        f"vdpf_eval[{_cid(case)}] party{party} pi",
                        words=16)
            n_cfg += 1
    return n_cfg


# ---------------------------------------------------------------------------
# Gen kernels (ChaCha fused + plane-domain AES; the native AES-NI engine
# remains the dealer-side default, docs/design.md)
# ---------------------------------------------------------------------------


def check_gen_kernels(interpret, quick=False):
    import jax.numpy as jnp
    from fss_tpu.ops import dcf_pallas, dpf_pallas, ht_pallas, vdpf_pallas
    n_cfg = 0

    def gen_inputs(case):
        s0s = _rep(np.stack([_h2u32(case["s0s"][0]),
                             _h2u32(case["s0s"][1])]))
        alphas = np.full(B, int(case["alpha"], 0), dtype=np.uint32)
        betas = _rep(_h2u32(case["beta"]))
        return s0s, alphas, betas

    for case in _load("dpf")["cases"]:
        if (case["prg"] != "chacha" or case["in_bits"] > 32):
            continue
        if quick and case.get("group") != "uint32":
            continue
        g = _group(case)
        nonce = (case["nonce_lo"], case["nonce_hi"])
        s0s, alphas, betas = gen_inputs(case)
        cws = np.asarray(dpf_pallas.gen_batch(
            nonce, g, case["in_bits"], jnp.asarray(s0s), alphas, betas,
            interpret=interpret))
        exp = _rows(case["cws"])
        if not np.array_equal(cws, np.broadcast_to(exp, cws.shape)):
            raise Mismatch(f"dpf_gen[{_cid(case)}]: key bytes differ")
        n_cfg += 1

    # Plane-domain AES gen kernel (ops/aes_pallas.gen_batch). Runs in
    # quick mode too (one config): the first-ever Mosaic lowering of
    # this kernel happened mid-registry and killed the 2026-08-19
    # campaign on an unimplemented `scatter` — the gate must compile it
    # before anything is timed.
    from fss_tpu.ops import aes_pallas
    n_aes = 0
    for case in _load("dpf")["cases"]:
        if case["prg"] != "aes" or case["in_bits"] > 32:
            continue
        if quick and n_aes:
            break
        g = _group(case)
        keys = tuple(_h2b(k) for k in case["aes_keys"][:2])
        s0s, alphas, betas = gen_inputs(case)
        cws = np.asarray(aes_pallas.gen_batch(
            keys, g, case["in_bits"], jnp.asarray(s0s), alphas, betas,
            interpret=interpret))
        exp = _rows(case["cws"])
        if not np.array_equal(cws, np.broadcast_to(exp, cws.shape)):
            raise Mismatch(f"dpf_gen_aes[{_cid(case)}]: key bytes differ")
        n_cfg += 1
        n_aes += 1

    # One config per remaining gen-kernel family in quick mode (the
    # registry times all of them; each must compile in the gate).
    n_fam = 0
    for case in _load("dcf")["cases"]:
        if quick and n_fam:
            break
        g = _group(case)
        if (case["prg"] != "chacha" or case["in_bits"] > 32
                or not dcf_pallas.gen_kernel_supports_group(g)):
            continue
        nonce = (case["nonce_lo"], case["nonce_hi"])
        s0s, alphas, betas = gen_inputs(case)
        cws = np.asarray(dcf_pallas.gen_batch(
            nonce, g, case["in_bits"], case["pred"], jnp.asarray(s0s),
            alphas, betas, interpret=interpret))
        exp = _rows(case["cws"])
        if not np.array_equal(cws, np.broadcast_to(exp, cws.shape)):
            raise Mismatch(f"dcf_gen[{_cid(case)}]: key bytes differ")
        n_cfg += 1
        n_fam += 1

    # Plane-domain DCF-AES gen kernel (ops/aes_pallas.dcf_gen_batch):
    # compile + byte-check before the registry can time it (same rule
    # as the DPF-AES gen above).
    n_fam = 0
    for case in _load("dcf")["cases"]:
        if quick and n_fam:
            break
        g = _group(case)
        if (case["prg"] != "aes" or case["in_bits"] > 32
                or len(case["aes_keys"]) < 4
                or not aes_pallas.dcf_gen_kernel_supports_group(g)):
            continue
        keys = tuple(_h2b(k) for k in case["aes_keys"][:4])
        s0s, alphas, betas = gen_inputs(case)
        cws = np.asarray(aes_pallas.dcf_gen_batch(
            keys, g, case["in_bits"], case["pred"], jnp.asarray(s0s),
            alphas, betas, interpret=interpret))
        exp = _rows(case["cws"])
        if not np.array_equal(cws, np.broadcast_to(exp, cws.shape)):
            raise Mismatch(f"dcf_gen_aes[{_cid(case)}]: key bytes differ")
        n_cfg += 1
        n_fam += 1

    n_fam = 0
    for case in _load("half_tree")["cases"]:
        if quick and n_fam:
            break
        if (case["prg"] != "chacha" or case["in_bits"] < 2
                or case["in_bits"] > 32):
            continue
        g = _group(case)
        nonce = (case["nonce_lo"], case["nonce_hi"])
        hk = _h2u32(case["hash_key"])
        s0s, alphas, betas = gen_inputs(case)
        cws, ocw = ht_pallas.gen_batch(
            nonce, g, case["in_bits"], hk, jnp.asarray(s0s), alphas,
            betas, interpret=interpret)
        exp_cws = _rows(case["cws"])
        exp_ocw = _h2u32(case["ocw"])
        if not np.array_equal(np.asarray(cws),
                              np.broadcast_to(exp_cws,
                                              np.asarray(cws).shape)):
            raise Mismatch(f"ht_gen[{_cid(case)}]: cw bytes differ")
        if not np.array_equal(np.asarray(ocw),
                              np.broadcast_to(exp_ocw,
                                              np.asarray(ocw).shape)):
            raise Mismatch(f"ht_gen[{_cid(case)}]: ocw bytes differ")
        n_cfg += 1
        n_fam += 1

    n_fam = 0
    for case in _load("vdpf")["cases"]:
        if quick and n_fam:
            break
        if case["prg"] != "chacha" or case["in_bits"] > 32:
            continue
        g = _group(case)
        h = _hashes(case)
        nonce = (case["nonce_lo"], case["nonce_hi"])
        s0s, alphas, betas = gen_inputs(case)
        cws, cs, ocw, fail = vdpf_pallas.gen_batch(
            nonce, h.xor_hash, g, case["in_bits"], jnp.asarray(s0s),
            alphas, betas, interpret=interpret)
        if np.asarray(fail).astype(bool).any():
            raise Mismatch(f"vdpf_gen[{_cid(case)}]: unexpected fail flag")
        for got, key in ((cws, "cws"), (cs, "cs")):
            exp = _rows(case[key])
            if not np.array_equal(np.asarray(got),
                                  np.broadcast_to(exp,
                                                  np.asarray(got).shape)):
                raise Mismatch(f"vdpf_gen[{_cid(case)}]: {key} differ")
        exp_ocw = _h2u32(case["ocw"])
        if not np.array_equal(np.asarray(ocw),
                              np.broadcast_to(exp_ocw,
                                              np.asarray(ocw).shape)):
            raise Mismatch(f"vdpf_gen[{_cid(case)}]: ocw differ")
        n_cfg += 1
        n_fam += 1
    return n_cfg


# ---------------------------------------------------------------------------
# Hybrid EvalAll kernels (force_kernel=True puts 16-bit golden domains on
# the Mosaic path they take at >= 18 bits)
# ---------------------------------------------------------------------------


def _check_digest(got_bytes, case, party, label):
    head_hex = case.get(f"eval_all_head{party}")  # VDPF cases: digest only
    if head_hex is not None:
        head = _h2b(head_hex)
        if got_bytes[:len(head)] != head:
            raise Mismatch(f"{label} party{party}: head bytes differ")
    digest = hashlib.sha256(got_bytes).hexdigest()
    if digest != case[f"eval_all_digest{party}"]:
        raise Mismatch(f"{label} party{party}: full-domain digest differs")


def check_eval_all(interpret, quick=False):
    """quick=True checks the first qualifying config of each hybrid
    EvalAll sub-family (DPF/DCF/HT/Grotto/VDPF) instead of the sweep."""
    import jax.numpy as jnp
    from fss_tpu.ops import eval_all_pallas as eak
    n_cfg = 0
    min_bits = eak.MIN_BITS

    for case in _load("dpf")["cases"]:
        if (case["prg"] != "chacha" or "eval_all_digest0" not in case
                or case["in_bits"] < min_bits):
            continue
        g = _group(case)
        prg2 = _chacha_prg(case, 2)
        cws = jnp.asarray(_rows(case["cws"]))
        for party in (0, 1):
            s0 = jnp.asarray(_h2u32(case["s0s"][party]))
            ys = eak.eval_all(prg2, g, case["in_bits"], party, s0, cws,
                              interpret=interpret, force_kernel=True)
            _check_digest(_as_bytes(ys), case, party,
                          f"dpf_eval_all[{_cid(case)}]")
            n_cfg += 1
        if quick:
            break

    for case in _load("dcf")["cases"]:
        g = _group(case)
        from fss_tpu import groups as _groups
        group_ok = isinstance(g, _groups.Bytes) or (
            isinstance(g, _groups.Uint) and g.mod == 0)
        if (case["prg"] != "chacha" or "eval_all_digest0" not in case
                or case["in_bits"] < min_bits or not group_ok):
            continue
        prg4 = _chacha_prg(case, 4)
        cws = jnp.asarray(_rows(case["cws"]))
        for party in (0, 1):
            s0 = jnp.asarray(_h2u32(case["s0s"][party]))
            ys = eak.dcf_eval_all(prg4, g, case["in_bits"], party, s0,
                                  cws, interpret=interpret,
                                  force_kernel=True)
            _check_digest(_as_bytes(ys), case, party,
                          f"dcf_eval_all[{_cid(case)}]")
            n_cfg += 1
        if quick:
            break

    for case in _load("half_tree")["cases"]:
        if (case["prg"] != "chacha" or "eval_all_digest0" not in case
                or case["in_bits"] < min_bits):
            continue
        g = _group(case)
        prg1 = _chacha_prg(case, 1)
        hk = _h2u32(case["hash_key"])
        cws = jnp.asarray(_rows(case["cws"]))
        ocw = jnp.asarray(_h2u32(case["ocw"]))
        for party in (0, 1):
            s0 = jnp.asarray(_h2u32(case["s0s"][party]))
            ys = eak.ht_eval_all(prg1, g, case["in_bits"], party, hk, s0,
                                 cws, ocw, interpret=interpret,
                                 force_kernel=True)
            _check_digest(_as_bytes(ys), case, party,
                          f"ht_eval_all[{_cid(case)}]")
            n_cfg += 1
        if quick:
            break

    for case in _load("grotto")["cases"]:
        # The hybrid expansion kernel is ChaCha-driven (expand_leaves
        # reads prg2.nonce); the AES-PRG Grotto golden case is covered at
        # scheme level by tests/test_golden.py and the AES device kernels
        # by the dpf/dcf/ht/vdpf_eval_aes families above.
        if case["in_bits"] < min_bits or case["prg"] != "chacha":
            continue
        prg2 = _chacha_prg(case, 2)
        cws = jnp.asarray(_rows(case["cws"]))
        for party in (0, 1):
            s0 = jnp.asarray(_h2u32(case["s0s"][party]))
            bits = eak.grotto_eval_all(prg2, case["in_bits"], party, s0,
                                       cws, interpret=interpret,
                                       force_kernel=True)
            raw = np.asarray(bits, dtype=np.uint8).tobytes()
            if raw[:32] != _h2b(case[f"eval_all_head{party}"]):
                raise Mismatch(
                    f"grotto_eval_all[{_cid(case)}] party{party}: head")
            if hashlib.sha256(raw).hexdigest() != \
                    case[f"eval_all_digest{party}"]:
                raise Mismatch(
                    f"grotto_eval_all[{_cid(case)}] party{party}: digest")
            n_cfg += 1
        if quick:
            break

    for case in _load("vdpf")["cases"]:
        if (case["prg"] != "chacha" or "eval_all_digest0" not in case
                or case["in_bits"] < min_bits):
            continue
        g = _group(case)
        h = _hashes(case)
        prg2 = _chacha_prg(case, 2)
        cws = jnp.asarray(_rows(case["cws"]))
        cs = jnp.asarray(_rows(case["cs"]))
        ocw = jnp.asarray(_h2u32(case["ocw"]))
        pis = {}
        for party in (0, 1):
            s0 = jnp.asarray(_h2u32(case["s0s"][party]))
            ys, pi = eak.vdpf_eval_all_chunked(
                prg2, h.xor_hash, h.hash64, g, case["in_bits"], party, s0,
                cws, cs, ocw, interpret=interpret, force_kernel=True)
            # ys are fold-independent: byte-check vs the reference digest.
            # The tree-fold pi is this framework's documented variant (no
            # reference bytes exist); Verify semantics = party equality.
            _check_digest(_as_bytes(ys), case, party,
                          f"vdpf_eval_all[{_cid(case)}]")
            pis[party] = np.asarray(pi)
            n_cfg += 1
        if not np.array_equal(pis[0], pis[1]):
            raise Mismatch(
                f"vdpf_eval_all[{_cid(case)}]: tree-fold proofs disagree")
        if quick:
            break
    return n_cfg


# ---------------------------------------------------------------------------
# Hash kernels, Grotto prefix queries, VDMPF
# ---------------------------------------------------------------------------


def check_hash_kernels(interpret):
    import jax
    import jax.numpy as jnp
    from fss_tpu import block as blk
    from fss_tpu.hash.sha256 import Sha256
    from fss_tpu.ops import blake3_pallas as b3k
    n_cfg = 0
    prim = _load("primitives")

    for entry in prim["blake3"]:
        iv = tuple(int(w) for w in _h2u32(entry["iv"]))
        msg = _rep(_h2u32(entry["msg"]).reshape(4, 4))
        got = np.asarray(b3k.hash64_batch(jnp.asarray(msg), iv,
                                          interpret=interpret))
        if _as_bytes(got[0]) != _h2b(entry["hash"]) or \
                not (got == got[0]).all():
            raise Mismatch("blake3_hash64 kernel: bytes differ")
        a = _rep(_h2u32(entry["x"]))
        b = _rep(_h2u32(entry["s"]))
        got = np.asarray(b3k.xor_hash_batch(jnp.asarray(a), jnp.asarray(b),
                                            iv, interpret=interpret))
        if _as_bytes(got[0]) != _h2b(entry["xor_hash"]) or \
                not (got == got[0]).all():
            raise Mismatch("blake3_xor_hash kernel: bytes differ")
        n_cfg += 1

    # SHA-256 device path (XLA, rolled rounds) — executed on the chip.
    for entry in prim["sha256"]:
        h = Sha256(tuple(_h2u32(entry["key"])))
        msg = _rep(_h2u32(entry["msg"]).reshape(4, 4))
        got = np.asarray(jax.jit(h.hash64)(jnp.asarray(msg)))
        if _as_bytes(got[0]) != _h2b(entry["hash"]):
            raise Mismatch("sha256_hash64 device: bytes differ")
        a = _rep(_h2u32(entry["x"]))
        b = _rep(_h2u32(entry["s"]))
        got = np.asarray(jax.jit(h.xor_hash)(blk.block(a), blk.block(b)))
        if _as_bytes(got[0]) != _h2b(entry["xor_hash"]):
            raise Mismatch("sha256_xor_hash device: bytes differ")
        # Fused Pallas XorHash kernel (ops/sha256_pallas.py).
        from fss_tpu.ops import sha256_pallas as shk
        got = np.asarray(shk.xor_hash_batch(
            jnp.asarray(a), jnp.asarray(b),
            tuple(int(w) for w in _h2u32(entry["key"])),
            interpret=interpret))
        if _as_bytes(got[0]) != _h2b(entry["xor_hash"]) or \
                not (got == got[0]).all():
            raise Mismatch("sha256_xor_hash kernel: bytes differ")
        n_cfg += 1
    return n_cfg


def check_grotto_prefix(interpret, quick=False):
    import jax.numpy as jnp
    from fss_tpu.ops import eval_all_pallas as eak
    from fss_tpu.schemes import grotto_dcf as _gr
    n_cfg = 0
    for case in _load("grotto")["cases"]:
        if quick and n_cfg:
            break
        if case["in_bits"] < eak.MIN_BITS or case["prg"] != "chacha":
            continue
        prg2 = _chacha_prg(case, 2)
        cws = jnp.asarray(_rows(case["cws"]))
        xs = np.asarray([int(h, 0) for h in case["xs"]], dtype=np.uint32)
        for party in (0, 1):
            s0 = jnp.asarray(_h2u32(case["s0s"][party]))
            bits = eak.grotto_eval_all(prg2, case["in_bits"], party, s0,
                                       cws, interpret=interpret,
                                       force_kernel=True)
            tbl = _gr.build_prefix_table(jnp.asarray(bits), party)
            got = np.asarray(_gr.eval_prefix(tbl, jnp.asarray(xs)))
            exp = np.asarray([int(v) for v in case[f"ys{party}"]])
            if not np.array_equal(got.astype(np.int64), exp):
                raise Mismatch(
                    f"grotto_prefix[{_cid(case)}] party{party}: queries")
            n_cfg += 1
    return n_cfg


def check_vdmpf(interpret, quick=False):
    """Full VDMPF batch_eval with the reference chain fold on device.

    Not a single Mosaic kernel but the routing + inner-eval + two-level
    proof chain (vdmpf.cuh:202-270) executing on the chip end to end.
    """
    from fss_tpu import block as blk
    from fss_tpu.api import Vdmpf
    from fss_tpu.schemes import vdmpf as _vdmpf
    n_cfg = 0
    for case in _load("vdmpf")["cases"]:
        if quick and n_cfg:
            break
        d = Vdmpf(case["in_bits"], max_points=case["max_points"],
                  bucket_bits=case["bucket_bits"], group=_group(case),
                  prg=_case_prg(case, 2), hashes=_hashes(case))
        m = case["m"]
        cws = np.stack([_rows(b["cws"]) for b in case["buckets"]])
        cs = np.stack([_h2u32(b["cs"]).reshape(4, 4)
                       for b in case["buckets"]])
        ocw = np.stack([_h2u32(b["ocw"]) for b in case["buckets"]])
        # Plain ints: batch_eval packs wide (>32-bit) domains itself.
        xs = [int(h, 0) for h in case["xs"]]
        pis = {}
        for party in (0, 1):
            s0 = blk.block(np.stack(
                [_h2u32(h) for h in case[f"bucket_s0s{party}"]]))
            key = _vdmpf.VdmpfKey(_h2b(case["sigma"]), case["m_rt"],
                                  case["b_size_rt"], s0, cws, cs, ocw)
            ys, pi = d.batch_eval(party, key, xs, fold="reference")
            ys = np.asarray(ys)
            exp = _rows(case[f"ys{party}"])
            if not np.array_equal(ys[:len(xs)], exp):
                raise Mismatch(f"vdmpf[{_cid(case)}] party{party}: ys")
            if _as_bytes(pi) != _h2b(case[f"pi{party}"]):
                raise Mismatch(f"vdmpf[{_cid(case)}] party{party}: pi")
            pis[party] = np.asarray(pi)
            n_cfg += 1
        if not np.array_equal(pis[0], pis[1]):
            raise Mismatch(f"vdmpf[{_cid(case)}]: verify failed")
    return n_cfg


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

FULL_CHECKS = [
    ("dpf_eval", check_dpf_eval),
    ("dpf_eval_aes", check_dpf_eval_aes),
    ("dcf_eval", check_dcf_eval),
    ("ht_eval", check_ht_eval),
    ("vdpf_eval", check_vdpf_eval),
    ("gen_kernels", check_gen_kernels),
    ("eval_all", check_eval_all),
    ("hash_kernels", check_hash_kernels),
    ("grotto_prefix", check_grotto_prefix),
    ("vdmpf", check_vdmpf),
]

# One config per TIMED kernel family (bench.py registry): a faulting
# kernel must be caught by a 256-row byte check before the registry can
# hand it a 2^19 batch and lose the window to a worker crash (observed
# 2026-08-19 on the DCF-AES kernel, which the old 3-family gate skipped).
QUICK_CHECKS = [
    ("dpf_eval", lambda interpret: check_dpf_eval(interpret, quick=True)),
    ("dpf_eval_aes",
     lambda interpret: check_dpf_eval_aes(interpret, quick=True)),
    ("dcf_eval", lambda interpret: check_dcf_eval(interpret, quick=True)),
    ("ht_eval", lambda interpret: check_ht_eval(interpret, quick=True)),
    ("vdpf_eval",
     lambda interpret: check_vdpf_eval(interpret, quick=True)),
    ("gen_kernels",
     lambda interpret: check_gen_kernels(interpret, quick=True)),
    ("eval_all", lambda interpret: check_eval_all(interpret, quick=True)),
    ("grotto_prefix",
     lambda interpret: check_grotto_prefix(interpret, quick=True)),
    ("vdmpf", lambda interpret: check_vdmpf(interpret, quick=True)),
]


def run(quick: bool = False, interpret: bool = False,
        out=sys.stderr, families=None, deadline=None) -> int:
    """Run the golden sweep; returns the number of verified configs.
    Raises Mismatch on the first byte difference.

    ``families`` (iterable of QUICK_CHECKS/FULL_CHECKS names) restricts
    the sweep — bench.py gates its headline on ONLY the headline's own
    family so a contended window cannot burn the whole budget on
    unrelated compiles (the round-4 rc=124 failure mode). ``deadline``
    (time.time() epoch) stops BETWEEN families once passed; completed
    families stay verified, the rest are reported as skipped."""
    import time as _t

    import jax
    platform = jax.devices()[0].platform
    if not interpret and platform != "tpu":
        raise RuntimeError(
            f"verify_tpu must run on the real TPU (got platform="
            f"{platform!r}); use --interpret for a CPU self-test")
    total = 0
    checks = list(QUICK_CHECKS if quick else FULL_CHECKS)
    if families is not None:
        # An unknown family must be an error, and a family that exists
        # only in FULL_CHECKS (e.g. hash_kernels) must fall back to its
        # full check rather than silently verifying nothing — a gate
        # that skips a requested family would let its rows be timed
        # unverified.
        by_name = dict(checks)
        full_by_name = dict(FULL_CHECKS)
        checks = []
        for f in families:
            if f in by_name:
                checks.append((f, by_name[f]))
            elif f in full_by_name:
                checks.append((f, full_by_name[f]))
            else:
                raise ValueError(f"unknown verify family {f!r}; known: "
                                 f"{sorted(full_by_name)}")
    for name, fn in checks:
        if deadline is not None and _t.time() >= deadline:
            print(f"verify_tpu: {name}: SKIPPED (deadline)", file=out)
            continue
        n = fn(interpret)
        print(f"verify_tpu: {name}: {n} configs ok", file=out)
        total += n
    return total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="cut-down gate used by bench.py")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode self-test of this script")
    args = ap.parse_args()

    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")

    try:
        total = run(quick=args.quick, interpret=args.interpret)
    except Mismatch as e:
        print(f"verify_tpu: MISMATCH: {e}", file=sys.stderr)
        print(json.dumps({"verify_tpu": "FAIL", "error": str(e)[:400]}))
        return 1
    mode = "quick, " if args.quick else ""
    backend = "interpret" if args.interpret else "tpu"
    print(f"verify_tpu: {total} kernel configs byte-exact "
          f"({mode}backend={backend})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
