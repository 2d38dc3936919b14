"""High-level, jit-cached scheme API.

The reference's config surface is compile-time template parameters
instantiated per parameter set through a codegen cache
(fss_crypto/_jit.py:117-122). The TPU equivalent: frozen-dataclass configs
(PRG, group, in_bits, ...) passed as *static* jit arguments — each distinct
config compiles one specialized XLA executable, cached by jax.jit.

All methods are batched-first and device-resident; scalars (alpha, x) are
accepted as Python ints or arrays.
"""

from __future__ import annotations

import typing
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.prg.aes import Aes128Mmo
from fss_tpu.prg.chacha import ChaCha
from fss_tpu.schemes import dcf as _dcf
from fss_tpu.schemes import dpf as _dpf
from fss_tpu.schemes import grotto_dcf as _grotto
from fss_tpu.schemes import half_tree_dpf as _ht
from fss_tpu.schemes import vdpf as _vdpf
from fss_tpu.schemes import cuckoo as _cuckoo
from fss_tpu.schemes import vdmpf as _vdmpf
from fss_tpu.prp.feistel import ceil_log2
from fss_tpu.hash.blake3 import Blake3

DEFAULT_NONCE = (0x243F6A88, 0x85A308D3)  # pi digits; nothing up my sleeve


class PackedDpfKeys(typing.NamedTuple):
    """A DPF key batch in the eval kernel's native plane layout.

    ``Dpf.gen_batch(..., layout="packed")`` returns this instead of the
    wire-format [B, in_bits+1, 8] rows; ``Dpf.eval`` accepts it wherever
    wire keys go. Skips the gen-side wire-row assembly (~15% of gen —
    measured 105.3 vs 86.3 M keys/s, docs/benchmarks.md) and streams 5/8
    of the wire cw bytes on the eval side. Use for SAME-PROCESS gen->eval
    pipelines; keys that cross a process or network boundary need the
    wire layout (``layout="wire"``, the default — byte-compatible with
    the reference, whose bench always materializes wire keys,
    bench_gpu.cu:70-93). NamedTuples are pytrees, so this passes through
    jit/vmap/device_put unchanged.

    Fields: cws_t [in_bits, 5, T, 128] uint32 shared cw planes;
    ocw [B, 4] uint32 output CW.
    """

    cws_t: jax.Array
    ocw: jax.Array

    @property
    def batch(self):
        return self.ocw.shape[0]

    def to_wire(self, in_bits: int):
        """Materialize the standard [B, in_bits+1, 8] wire rows (the
        one shared assembly, ops.dpf_pallas.wire_rows)."""
        from fss_tpu.ops import dpf_pallas
        return dpf_pallas.wire_rows(in_bits, self.cws_t, self.ocw,
                                    self.ocw.shape[0])

    @classmethod
    def from_wire(cls, cws, in_bits: int,
                  block_rows: int = 32) -> "PackedDpfKeys":
        """Stage wire rows into the packed plane layout."""
        cws = jnp.asarray(cws)
        B = cws.shape[0]
        tile = block_rows * 128
        Bp = ((B + tile - 1) // tile) * tile
        T = Bp // 128
        cwsp = jnp.pad(cws[:, :in_bits, :5],
                       ((0, Bp - B), (0, 0), (0, 0)))
        cws_t = jnp.transpose(cwsp, (1, 2, 0)).reshape(in_bits, 5, T, 128)
        return cls(cws_t, cws[:, in_bits, 0:4])


def _use_tpu_kernels() -> bool:
    """Fused Pallas kernels auto-dispatch on TPU backends (escape hatch:
    FSS_TPU_NO_KERNELS=1). The kernels are bit-exact with the XLA paths
    (tests/test_dpf_pallas.py, tests/test_tree_kernels_pallas.py)."""
    import os
    if os.environ.get("FSS_TPU_NO_KERNELS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _plain_u32_inputs(xs, in_bits: int) -> bool:
    """True when xs is a flat uint32-representable batch (kernel layout)."""
    if in_bits > 32:
        return False
    arr = np.asarray(xs) if not isinstance(xs, jax.Array) else xs
    return (getattr(arr, "ndim", None) == 1
            and arr.dtype in (np.uint32, np.int32, np.int64, np.uint64))


def _kernel_inputs(xs, in_bits: int):
    """xs as the eval kernels expect it, or None when not kernel-eligible:
    a flat uint32 batch for in_bits <= 32, or packed [B, 4] uint32 lanes
    for wide (33..128-bit) domains."""
    if _plain_u32_inputs(xs, in_bits):
        return jnp.asarray(xs, dtype=jnp.uint32)
    if in_bits > 32:
        packed = blk.pack_inputs(xs, in_bits)
        if packed.ndim == 2:
            return packed
    return None


# --- jitted kernels, specialized on (prg, group, in_bits, party) -----------

# Largest key batch an XLA-fallback gen runs in ONE device dispatch:
# the bitsliced-AES/plane-transpose gen graphs crash the TPU worker in
# a single >= 2^19-instance dispatch even when chunked in-program
# (CLAUDE.md; scripts/artifacts/triage_dcf_aes.jsonl). gen_batch
# fallbacks split bigger batches into separate host dispatches.
import os as _os

_SAFE_DISPATCH_ROWS = int(_os.environ.get("FSS_TPU_SAFE_DISPATCH_ROWS",
                                          str(1 << 17)))


def _host_chunked(fn, args):
    rows = int(jnp.asarray(jax.tree_util.tree_leaves(args)[0]).shape[0])
    return blk.map_rows_host(fn, args, rows, _SAFE_DISPATCH_ROWS)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _dpf_gen(prg, group, in_bits, s0s, a_lanes, beta):
    return _dpf.gen(prg, group, in_bits, s0s, a_lanes, beta)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _dpf_gen_batch(prg, group, in_bits, s0s, a_lanes, betas):
    return jax.vmap(
        lambda s, al, be: _dpf.gen(prg, group, in_bits, s, al, be))(
            s0s, a_lanes, betas)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _dpf_eval(prg, group, in_bits, party, s0, cws, x_lanes):
    return _dpf.eval_points(prg, group, in_bits, party, s0, cws, x_lanes)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _dpf_eval_all(prg, group, in_bits, party, s0, cws):
    return _dpf.eval_all(prg, group, in_bits, party, s0, cws)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _dcf_gen(prg, group, in_bits, pred, s0s, a_lanes, beta):
    return _dcf.gen(prg, group, in_bits, pred, s0s, a_lanes, beta)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _dcf_eval(prg, group, in_bits, party, s0, cws, x_lanes):
    return _dcf.eval_points(prg, group, in_bits, None, party, s0, cws,
                            x_lanes)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _dcf_eval_all(prg, group, in_bits, party, s0, cws):
    return _dcf.eval_all(prg, group, in_bits, party, s0, cws)


@partial(jax.jit, static_argnums=(0, 1))
def _grotto_gen(prg, in_bits, s0s, a_lanes):
    return _grotto.gen(prg, groups.Bytes(), in_bits, s0s, a_lanes)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _grotto_eval_all(prg, in_bits, party, s0, cws):
    return _grotto.eval_all(prg, in_bits, party, s0, cws)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _grotto_preprocess(prg, in_bits, party, s0, cws):
    return _grotto.preprocess(prg, in_bits, party, s0, cws)


@jax.jit
def _grotto_eval(pt, x_lanes):
    return _grotto.eval_points(pt, x_lanes)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _ht_gen(prg, group, in_bits, hash_key, s0s, a_lanes, beta):
    return _ht.gen(prg, group, in_bits, hash_key, s0s, a_lanes, beta)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _ht_gen_batch(prg, group, in_bits, hash_key, s0s, a_lanes, betas):
    return jax.vmap(
        lambda s, al, be: _ht.gen(prg, group, in_bits, hash_key, s, al, be))(
            s0s, a_lanes, betas)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _ht_eval(prg, group, in_bits, party, hash_key, s0, cws, ocw, x_lanes):
    return _ht.eval_points(prg, group, in_bits, party, hash_key, s0, cws,
                           ocw, x_lanes)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _ht_eval_all(prg, group, in_bits, party, hash_key, s0, cws, ocw):
    return _ht.eval_all(prg, group, in_bits, party, hash_key, s0, cws, ocw)


class Dpf:
    """2-party DPF (reference include/fss/dpf.cuh, fss_crypto/dpf.py).

    Keys: cws (in_bits+1, 8) uint32 (layout-compatible with the reference's
    int32 tensors via bitcast).
    """

    def __init__(self, in_bits: int, group=None, prg=None):
        self.in_bits = in_bits
        self.group = group if group is not None else groups.Bytes()
        self.prg = prg if prg is not None else ChaCha(mul=2,
                                                      nonce=DEFAULT_NONCE)

    def gen(self, s0s, alpha, beta):
        a = blk.pack_inputs(alpha, self.in_bits)
        return _dpf_gen(self.prg, self.group, self.in_bits, s0s, a, beta)

    def gen_batch(self, s0s, alphas, betas, layout: str = "wire"):
        """Vectorized gen over a leading key-batch axis (fused Pallas
        kernels on TPU: ChaCha word-domain, AES-MMO plane-domain).

        ``layout="packed"`` returns :class:`PackedDpfKeys` (the eval
        kernel's native plane layout — faster gen AND eval for
        same-process pipelines; see its docstring for when wire format
        is required)."""
        assert layout in ("wire", "packed"), layout
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and _plain_u32_inputs(alphas, self.in_bits)):
            from fss_tpu.ops import dpf_pallas
            if layout == "packed":
                cws_t, ocw, _ = dpf_pallas.gen_batch_packed(
                    self.prg.nonce, self.group, self.in_bits,
                    jnp.asarray(s0s),
                    jnp.asarray(alphas, dtype=jnp.uint32),
                    jnp.asarray(betas), rounds=self.prg.rounds)
                return PackedDpfKeys(cws_t, ocw)
            return dpf_pallas.gen_batch(
                self.prg.nonce, self.group, self.in_bits,
                jnp.asarray(s0s), jnp.asarray(alphas, dtype=jnp.uint32),
                jnp.asarray(betas), rounds=self.prg.rounds)
        if layout == "packed":
            # No fused-gen path here (CPU backend / AES PRG / packed
            # alphas): stage the wire keys into the packed layout so the
            # API stays total; the eval side still streams 5/8 words.
            cws = self.gen_batch(s0s, alphas, betas)
            return PackedDpfKeys.from_wire(cws, self.in_bits)
        if (_use_tpu_kernels() and isinstance(self.prg, Aes128Mmo)
                and _plain_u32_inputs(alphas, self.in_bits)):
            from fss_tpu.ops import aes_pallas
            # Host-chunked: the plane-transpose gen graphs crash the TPU
            # worker above ~2^17 instances in one dispatch (CLAUDE.md).
            return _host_chunked(
                lambda t: aes_pallas.gen_batch(
                    self.prg.keys, self.group, self.in_bits, *t),
                (jnp.asarray(s0s), jnp.asarray(alphas, dtype=jnp.uint32),
                 jnp.asarray(betas)))
        a = blk.pack_inputs(alphas, self.in_bits)
        return _host_chunked(
            lambda t: _dpf_gen_batch(self.prg, self.group, self.in_bits,
                                     *t),
            (jnp.asarray(s0s), a, jnp.asarray(betas)))

    def eval(self, party: int, s0, cws, xs):
        if isinstance(cws, PackedDpfKeys):
            if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
                xk = _kernel_inputs(xs, self.in_bits)
                if xk is not None:
                    from fss_tpu.ops import dpf_pallas
                    return dpf_pallas.eval_points_packedkey(
                        self.prg.nonce, self.group, self.in_bits,
                        int(party), jnp.asarray(s0), cws.cws_t, cws.ocw,
                        xk, rounds=self.prg.rounds)
            return self.eval(party, s0, cws.to_wire(self.in_bits), xs)
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and jnp.asarray(cws).ndim == 3):
            xk = _kernel_inputs(xs, self.in_bits)
            if xk is not None:
                from fss_tpu.ops import dpf_pallas
                return dpf_pallas.eval_points(
                    self.prg.nonce, self.group, self.in_bits, int(party),
                    jnp.asarray(s0), jnp.asarray(cws), xk,
                    rounds=self.prg.rounds)
        if (_use_tpu_kernels() and isinstance(self.prg, Aes128Mmo)
                and _plain_u32_inputs(xs, self.in_bits)):
            from fss_tpu.ops import aes_pallas
            return aes_pallas.eval_points(
                self.prg.keys, self.group, self.in_bits, int(party),
                jnp.asarray(s0), jnp.asarray(cws),
                jnp.asarray(xs, dtype=jnp.uint32))
        x = blk.pack_inputs(xs, self.in_bits)
        return _dpf_eval(self.prg, self.group, self.in_bits, int(party),
                         s0, cws, x)

    def eval_all(self, party: int, s0, cws):
        if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
            from fss_tpu.ops import eval_all_pallas
            if self.in_bits >= eval_all_pallas.KERNEL_WORTHWHILE_BITS:
                return eval_all_pallas.eval_all(
                    self.prg, self.group, self.in_bits, int(party),
                    jnp.asarray(s0), jnp.asarray(cws),
                    rounds=self.prg.rounds)
        return _dpf_eval_all(self.prg, self.group, self.in_bits, int(party),
                             s0, cws)


class Dcf:
    """2-party DCF (reference include/fss/dcf.cuh, fss_crypto/dcf.py)."""

    def __init__(self, in_bits: int, group=None, prg=None, pred: str = "lt"):
        self.in_bits = in_bits
        self.group = group if group is not None else groups.Bytes()
        self.prg = prg if prg is not None else ChaCha(mul=4,
                                                      nonce=DEFAULT_NONCE)
        assert pred in ("lt", "gt")
        self.pred = pred

    def gen(self, s0s, alpha, beta):
        a = blk.pack_inputs(alpha, self.in_bits)
        return _dcf_gen(self.prg, self.group, self.in_bits, self.pred,
                        s0s, a, beta)

    def gen_batch(self, s0s, alphas, betas):
        """Vectorized gen over a leading key-batch axis (fused Pallas
        kernels on TPU: ChaCha word-domain for Bytes/wrapping-Uint
        groups, AES-MMO plane-domain for Bytes/<=64-bit Uint)."""
        from fss_tpu.ops import dcf_pallas
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and _plain_u32_inputs(alphas, self.in_bits)
                and dcf_pallas.gen_kernel_supports_group(self.group)):
            return dcf_pallas.gen_batch(
                self.prg.nonce, self.group, self.in_bits, self.pred,
                jnp.asarray(s0s),
                jnp.asarray(alphas, dtype=jnp.uint32),
                jnp.asarray(betas), rounds=self.prg.rounds)
        if (_use_tpu_kernels() and isinstance(self.prg, Aes128Mmo)
                and self.prg.mul == 4
                and _plain_u32_inputs(alphas, self.in_bits)):
            from fss_tpu.ops import aes_pallas
            if aes_pallas.dcf_gen_kernel_supports_group(self.group):
                # Host-chunked: same >2^17-instance dispatch crash class
                # as the DPF-AES gen (CLAUDE.md, triage_dcf_aes.jsonl).
                return _host_chunked(
                    lambda t: aes_pallas.dcf_gen_batch(
                        self.prg.keys, self.group, self.in_bits,
                        self.pred, *t),
                    (jnp.asarray(s0s),
                     jnp.asarray(alphas, dtype=jnp.uint32),
                     jnp.asarray(betas)))
        a = blk.pack_inputs(alphas, self.in_bits)
        return _host_chunked(
            lambda t: jax.vmap(lambda s, al, be: _dcf_gen(
                self.prg, self.group, self.in_bits, self.pred,
                s, al, be))(*t),
            (jnp.asarray(s0s), a, jnp.asarray(betas)))

    def eval(self, party: int, s0, cws, xs):
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and jnp.asarray(cws).ndim == 3):
            from fss_tpu.ops import dcf_pallas
            xk = _kernel_inputs(xs, self.in_bits)
            if xk is not None and dcf_pallas.kernel_supports_group(
                    self.group):
                return dcf_pallas.eval_points(
                    self.prg.nonce, self.group, self.in_bits, int(party),
                    jnp.asarray(s0), jnp.asarray(cws), xk,
                    rounds=self.prg.rounds)
        if (_use_tpu_kernels() and isinstance(self.prg, Aes128Mmo)
                and _plain_u32_inputs(xs, self.in_bits)):
            from fss_tpu.ops import aes_pallas
            if aes_pallas.dcf_kernel_supports_group(self.group):
                return aes_pallas.dcf_eval_points(
                    self.prg.keys, self.group, self.in_bits, int(party),
                    jnp.asarray(s0), jnp.asarray(cws),
                    jnp.asarray(xs, dtype=jnp.uint32))
        x = blk.pack_inputs(xs, self.in_bits)
        return _dcf_eval(self.prg, self.group, self.in_bits, int(party),
                         s0, cws, x)

    def eval_all(self, party: int, s0, cws):
        if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
            from fss_tpu.ops import eval_all_pallas
            if self.in_bits >= eval_all_pallas.KERNEL_WORTHWHILE_BITS:
                return eval_all_pallas.dcf_eval_all(
                    self.prg, self.group, self.in_bits, int(party),
                    jnp.asarray(s0), jnp.asarray(cws),
                    rounds=self.prg.rounds)
        return _dcf_eval_all(self.prg, self.group, self.in_bits, int(party),
                             s0, cws)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _vdpf_gen(prg, xor_hash, group, in_bits, s0s, a_lanes, beta):
    return _vdpf.gen(prg, xor_hash, group, in_bits, s0s, a_lanes, beta)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _vdpf_eval(prg, xor_hash, group, in_bits, party, s0, cws, cs, ocw,
               x_lanes):
    return _vdpf.eval_points(prg, xor_hash, group, in_bits, party, s0, cws,
                             cs, ocw, x_lanes)


@partial(jax.jit, static_argnums=(0,))
def _vdpf_prove(hash64, pi_tildes, cs):
    return _vdpf.prove(hash64, pi_tildes, cs)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _vdpf_eval_all(prg, xor_hash, hash64, group, in_bits, party, s0, cws,
                   cs, ocw):
    return _vdpf.eval_all(prg, xor_hash, hash64, group, in_bits, party, s0,
                          cws, cs, ocw)


DEFAULT_HASH_IV = (0x11111111, 0x22222222, 0x33333333, 0x44444444,
                   0x55555555, 0x66666666, 0x77777777, 0x88888888)


class Vdpf:
    """Verifiable DPF (reference include/fss/vdpf.cuh).

    Keys: (cws (in_bits, 8), cs (4, 4), ocw (4,)) uint32. ``gen`` returns an
    extra ``fail`` flag; callers resample seeds and retry while it is 1
    (vdpf.cuh:97, 167) — see ``gen_retry``.
    """

    def __init__(self, in_bits: int, group=None, prg=None, hash_iv=None,
                 hashes=None):
        """``hashes``: object exposing ``xor_hash(a, b)`` (the paper's H)
        and ``hash64(msg)`` (H'), e.g. hash.Blake3 or hash.Sha256; defaults
        to Blake3 keyed with ``hash_iv`` (or DEFAULT_HASH_IV)."""
        self.in_bits = in_bits
        self.group = group if group is not None else groups.Bytes()
        self.prg = prg if prg is not None else ChaCha(mul=2,
                                                      nonce=DEFAULT_NONCE)
        if hashes is None:
            hashes = Blake3(hash_iv if hash_iv is not None
                            else DEFAULT_HASH_IV)
        self.xor_hash = hashes.xor_hash
        self.hash64 = hashes.hash64

    def gen(self, s0s, alpha, beta):
        a = blk.pack_inputs(alpha, self.in_bits)
        return _vdpf_gen(self.prg, self.xor_hash, self.group, self.in_bits,
                         s0s, a, beta)

    def gen_retry(self, rng, alpha, beta, max_tries: int = 64):
        """Sample seeds with ``rng`` and re-run gen until fail == 0."""
        for _ in range(max_tries):
            s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
            cws, cs, ocw, fail = self.gen(s0s, alpha, beta)
            if not int(fail):
                return s0s, cws, cs, ocw
        raise RuntimeError("vdpf gen retry budget exhausted")

    def gen_batch(self, rng, alphas, betas, max_rounds: int = 64):
        """Batched key generation with per-lane retry.

        VDPF Gen fails whenever the final control bits collide
        (vdpf.cuh:167) — about half of all seed choices — so scalable key
        generation must retry per lane, not per batch: each round re-runs
        Gen only for the still-failed lanes (padded to a power of two to
        bound jit specializations) with fresh seeds, and scatters the
        successes back. Expected ~2 attempts per key.

        Returns (s0s [B, 2, 4], cws [B, n, 8], cs [B, 4, 4], ocw [B, 4]).
        """
        alphas = np.asarray(alphas)
        B = alphas.shape[0]
        betas = jnp.asarray(betas)
        a_lanes = blk.pack_inputs(alphas, self.in_bits)

        if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
            from fss_tpu.ops import vdpf_pallas

            def gen_v(s, a, b):
                a_u32 = a[..., 0]  # pack_inputs lanes -> plain uint32
                return vdpf_pallas.gen_batch(
                    self.prg.nonce, self.xor_hash, self.group,
                    self.in_bits, s, a_u32, b, rounds=self.prg.rounds)
        else:
            gen_inner = jax.jit(jax.vmap(
                lambda s, a, b: _vdpf.gen(self.prg, self.xor_hash,
                                          self.group, self.in_bits, s, a,
                                          b)))

            def gen_v(s, a, b):
                return _host_chunked(lambda t: gen_inner(*t), (s, a, b))

        s0s = np.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
        cws, cs, ocw, fail = gen_v(jnp.asarray(s0s), a_lanes, betas)
        cws, cs, ocw = (np.asarray(x) for x in (cws, cs, ocw))
        fail = np.asarray(fail).astype(bool)

        # Retry rounds regenerate at the FULL batch size with fresh seeds
        # and scatter back only the still-failed lanes: one compiled shape
        # for the whole loop (a shape per round would recompile ~log2(B)
        # kernels), and failures halve each round so ~log2(B)+margin
        # rounds clear everything at ~B extra gen work total.
        for _ in range(max_rounds):
            idx = np.nonzero(fail)[0]
            if idx.size == 0:
                return (jnp.asarray(s0s), jnp.asarray(cws),
                        jnp.asarray(cs), jnp.asarray(ocw))
            new_seeds = np.asarray(
                blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
            ncws, ncs, nocw, nfail = gen_v(
                jnp.asarray(new_seeds), a_lanes, betas)
            nfail = np.asarray(nfail).astype(bool)
            tgt = idx[~nfail[idx]]
            s0s[tgt] = new_seeds[tgt]
            cws[tgt] = np.asarray(ncws)[tgt]
            cs[tgt] = np.asarray(ncs)[tgt]
            ocw[tgt] = np.asarray(nocw)[tgt]
            fail[tgt] = False
        raise RuntimeError("vdpf gen_batch retry budget exhausted")

    def eval(self, party: int, s0, cws, cs, ocw, xs):
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and jnp.asarray(cws).ndim == 3):
            xk = _kernel_inputs(xs, self.in_bits)
            if xk is not None:
                from fss_tpu.ops import vdpf_pallas
                return vdpf_pallas.eval_points(
                    self.prg.nonce, self.xor_hash, self.group,
                    self.in_bits, int(party), jnp.asarray(s0),
                    jnp.asarray(cws), cs, ocw, xk, rounds=self.prg.rounds)
        if (_use_tpu_kernels() and isinstance(self.prg, Aes128Mmo)
                and _plain_u32_inputs(xs, self.in_bits)):
            from fss_tpu.ops import aes_pallas
            return aes_pallas.vdpf_eval_points(
                self.prg.keys, self.xor_hash, self.group, self.in_bits,
                int(party), jnp.asarray(s0), jnp.asarray(cws), cs, ocw,
                jnp.asarray(xs, dtype=jnp.uint32))
        x = blk.pack_inputs(xs, self.in_bits)
        return _vdpf_eval(self.prg, self.xor_hash, self.group, self.in_bits,
                          int(party), s0, cws, cs, ocw, x)

    def prove(self, pi_tildes, cs):
        return _vdpf_prove(self.hash64, pi_tildes, cs)

    @staticmethod
    def verify(pi0, pi1) -> bool:
        return bool(_vdpf.verify(jnp.asarray(pi0), jnp.asarray(pi1)))

    def eval_all(self, party: int, s0, cws, cs, ocw,
                 fold: str = "reference"):
        """``fold``: "reference" keeps the reference's flat sequential
        proof chain (byte-compatible, O(2^n) dependent hashes); "tree"
        (log-depth Merkle fold) and "chunked" (two-level chain) are the
        documented batched variants running the hybrid tree kernel on
        TPU — both parties must pick the same fold."""
        if fold in ("tree", "chunked"):
            from fss_tpu.ops import eval_all_pallas
            return eval_all_pallas.vdpf_eval_all_chunked(
                self.prg, self.xor_hash, self.hash64, self.group,
                self.in_bits, int(party), jnp.asarray(s0),
                jnp.asarray(cws), jnp.asarray(cs), jnp.asarray(ocw),
                rounds=getattr(self.prg, "rounds", 20), fold=fold)
        return _vdpf_eval_all(self.prg, self.xor_hash, self.hash64,
                              self.group, self.in_bits, int(party), s0, cws,
                              cs, ocw)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def _vdmpf_batch_eval(prg, xor_hash, hash64, group, in_bits, bucket_bits,
                      party, kappa, fold, sigma, m_b, s0, cws, cs, ocw, xs):
    key = _vdmpf.VdmpfKey(sigma, m_b[0], m_b[1], s0, cws, cs, ocw)
    return _vdmpf.batch_eval(prg, xor_hash, hash64, group, in_bits,
                             bucket_bits, party, key, xs, kappa, fold)


class Vdmpf:
    """Verifiable multi-point function (reference include/fss/vdmpf.cuh).

    ``max_points`` sizes the bucket array (>= 30); ``bucket_bits`` bounds
    the inner VDPF domain (defaults to the smallest size that fits the
    worst-case runtime bucket size at t = 30).
    """

    def __init__(self, in_bits: int, max_points: int = 30,
                 bucket_bits: int | None = None, group=None, prg=None,
                 hash_iv=None, hashes=None, kappa: int = 3,
                 ch_lambda: int = 80):
        self.in_bits = in_bits
        self.max_points = max_points
        self.kappa = kappa
        self.ch_lambda = ch_lambda
        self.m = _cuckoo.ch_bucket(max_points, ch_lambda)
        if bucket_bits is None:
            n = 1 << in_bits
            m_min = _cuckoo.ch_bucket(30, ch_lambda)
            bucket_bits = max(1, ceil_log2(
                (n * kappa + m_min - 1) // m_min + 1))
        self.bucket_bits = bucket_bits
        self.group = group if group is not None else groups.Bytes()
        self.prg = prg if prg is not None else ChaCha(mul=2,
                                                      nonce=DEFAULT_NONCE)
        if hashes is None:
            hashes = Blake3(hash_iv if hash_iv is not None
                            else DEFAULT_HASH_IV)
        self.xor_hash = hashes.xor_hash
        self.hash64 = hashes.hash64

    def gen(self, sigma, s0s, alphas, betas, ch_retry: int = 1000):
        """s0s: [m, 2, 4]; alphas: t ints (t >= 30); betas: [t, 4].
        Returns (key0, key1, fail)."""
        return _vdmpf.gen(self.prg, self.xor_hash, self.group, self.in_bits,
                          self.bucket_bits, self.max_points, sigma, s0s,
                          alphas, betas, self.kappa, self.ch_lambda,
                          ch_retry)

    def gen_retry(self, rng, alphas, betas, max_tries: int = 16):
        """Sample sigma + seeds with ``rng`` until gen succeeds
        (vdmpf.cuh:133 retry contract)."""
        for _ in range(max_tries):
            sigma = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
            s0s = blk.block(rng.integers(0, 2**32, size=(self.m, 2, 4)))
            k0, k1, fail = self.gen(sigma, s0s, alphas, betas)
            if not fail:
                return k0, k1
        raise RuntimeError("vdmpf gen retry budget exhausted")

    def batch_eval(self, party: int, key: "_vdmpf.VdmpfKey", xs,
                   fold: str = "tree"):
        """``fold``: "tree" (default, log-depth batched fold) or
        "reference" (the reference's sequential chain, byte-compatible
        with vdmpf.cuh:242-268) — both parties must pick the same."""
        if self.in_bits <= 32:
            xs = jnp.asarray(xs, dtype=jnp.uint32)
        else:  # wide domains: packed [eta, 4] uint32 lanes
            xs = blk.pack_inputs(xs, self.in_bits)
        return _vdmpf_batch_eval(
            self.prg, self.xor_hash, self.hash64, self.group, self.in_bits,
            self.bucket_bits, int(party), self.kappa, fold, key.sigma,
            (key.m_rt, key.b_size_rt), key.s0, key.cws, key.cs, key.ocw, xs)

    @staticmethod
    def verify(pi0, pi1) -> bool:
        return bool(_vdmpf.verify(jnp.asarray(pi0), jnp.asarray(pi1)))


class HalfTreeDpf:
    """Half-Tree DPF (reference include/fss/half_tree_dpf.cuh).

    Keys: (cws (in_bits, 8) uint32, ocw (4,) uint32). ``hash_key`` is the
    public CCR-hash tweak, a [4] uint32 block shared by both parties
    (half_tree_dpf.cuh:44-45).
    """

    def __init__(self, in_bits: int, group=None, prg=None, hash_key=None):
        self.in_bits = in_bits
        self.group = group if group is not None else groups.Bytes()
        self.prg = prg if prg is not None else ChaCha(mul=1,
                                                      nonce=DEFAULT_NONCE)
        if hash_key is None:
            hash_key = np.zeros(4, dtype=np.uint32)
        self.hash_key = jnp.asarray(hash_key, dtype=jnp.uint32)

    def gen(self, s0s, alpha, beta):
        a = blk.pack_inputs(alpha, self.in_bits)
        return _ht_gen(self.prg, self.group, self.in_bits, self.hash_key,
                       s0s, a, beta)

    def gen_batch(self, s0s, alphas, betas):
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and self.in_bits >= 2
                and _plain_u32_inputs(alphas, self.in_bits)):
            from fss_tpu.ops import ht_pallas
            return ht_pallas.gen_batch(
                self.prg.nonce, self.group, self.in_bits,
                np.asarray(self.hash_key), jnp.asarray(s0s),
                jnp.asarray(alphas, dtype=jnp.uint32),
                jnp.asarray(betas), rounds=self.prg.rounds)
        a = blk.pack_inputs(alphas, self.in_bits)
        return _host_chunked(
            lambda t: _ht_gen_batch(self.prg, self.group, self.in_bits,
                                    self.hash_key, *t),
            (jnp.asarray(s0s), a, jnp.asarray(betas)))

    def eval(self, party: int, s0, cws, ocw, xs):
        if (_use_tpu_kernels() and isinstance(self.prg, ChaCha)
                and jnp.asarray(cws).ndim == 3):
            xk = _kernel_inputs(xs, self.in_bits)
            if xk is not None:
                from fss_tpu.ops import ht_pallas
                return ht_pallas.eval_points(
                    self.prg.nonce, self.group, self.in_bits, int(party),
                    np.asarray(self.hash_key), jnp.asarray(s0),
                    jnp.asarray(cws), jnp.asarray(ocw), xk,
                    rounds=self.prg.rounds)
        if (_use_tpu_kernels() and isinstance(self.prg, Aes128Mmo)
                and _plain_u32_inputs(xs, self.in_bits)):
            from fss_tpu.ops import aes_pallas
            return aes_pallas.ht_eval_points(
                self.prg.keys, self.group, self.in_bits, int(party),
                np.asarray(self.hash_key), jnp.asarray(s0),
                jnp.asarray(cws), jnp.asarray(ocw),
                jnp.asarray(xs, dtype=jnp.uint32))
        x = blk.pack_inputs(xs, self.in_bits)
        return _ht_eval(self.prg, self.group, self.in_bits, int(party),
                        self.hash_key, s0, cws, ocw, x)

    def eval_all(self, party: int, s0, cws, ocw):
        if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
            from fss_tpu.ops import eval_all_pallas
            if self.in_bits >= eval_all_pallas.KERNEL_WORTHWHILE_BITS:
                return eval_all_pallas.ht_eval_all(
                    self.prg, self.group, self.in_bits, int(party),
                    np.asarray(self.hash_key), jnp.asarray(s0),
                    jnp.asarray(cws), jnp.asarray(ocw),
                    rounds=self.prg.rounds)
        return _ht_eval_all(self.prg, self.group, self.in_bits, int(party),
                            self.hash_key, s0, cws, ocw)


class GrottoDcf:
    """Grotto DCF over F2 (reference include/fss/grotto_dcf.cuh)."""

    def __init__(self, in_bits: int, prg=None):
        self.in_bits = in_bits
        self.prg = prg if prg is not None else ChaCha(mul=2,
                                                      nonce=DEFAULT_NONCE)

    def gen(self, s0s, alpha):
        a = blk.pack_inputs(alpha, self.in_bits)
        return _grotto_gen(self.prg, self.in_bits, s0s, a)

    def preprocess(self, party: int, s0, cws):
        if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
            from fss_tpu.ops import eval_all_pallas
            if self.in_bits >= eval_all_pallas.KERNEL_WORTHWHILE_BITS:
                _, leaf = eval_all_pallas.expand_leaves(
                    self.prg, self.in_bits, int(party), jnp.asarray(s0),
                    jnp.asarray(cws)[:self.in_bits],
                    rounds=self.prg.rounds)
                return _grotto.build_parity_tree(leaf, int(party))
        return _grotto_preprocess(self.prg, self.in_bits, int(party), s0, cws)

    def preprocess_prefix(self, party: int, s0, cws):
        """Packed full-domain prefix table: the TPU-fast preprocess whose
        point queries are one gather each (schemes.grotto_dcf.PrefixTable;
        the ParityTree from ``preprocess`` stays for reference parity)."""
        bits = self.eval_all(party, s0, cws)
        return _grotto.build_prefix_table(jnp.asarray(bits), int(party))

    def eval(self, pt, xs):
        if isinstance(pt, _grotto.PrefixTable):
            return _grotto.eval_prefix(pt, xs)
        x = blk.pack_inputs(xs, self.in_bits)
        return _grotto_eval(pt, x)

    def eval_all(self, party: int, s0, cws):
        if _use_tpu_kernels() and isinstance(self.prg, ChaCha):
            from fss_tpu.ops import eval_all_pallas
            if self.in_bits >= eval_all_pallas.KERNEL_WORTHWHILE_BITS:
                return eval_all_pallas.grotto_eval_all(
                    self.prg, self.in_bits, int(party), jnp.asarray(s0),
                    jnp.asarray(cws), rounds=self.prg.rounds)
        return _grotto_eval_all(self.prg, self.in_bits, int(party), s0, cws)
