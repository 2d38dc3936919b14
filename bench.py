"""Headline benchmark: batched DPF Eval throughput on one TPU chip.

Mirrors the reference's GPU benchmark shape (src/bench_gpu.cu:70-93): 2^20
independent keys, each evaluated at one point, 16-bit domain, ChaCha PRG,
Uint group. Keys are staged on device before the timed region (as the CUDA
bench stages via cudaMemcpy, bench_gpu.cu:245-278); the timed region is the
fused Pallas eval kernel plus group finalize. A scalar checksum is fetched
after the iteration loop so the measurement covers real device execution
(device timers are not exposed through the TPU tunnel).

Prints ONE JSON line. vs_baseline is relative to the north-star floor of
1e8 evals/s/chip (BASELINE.json). `python bench.py --all` adds per-domain
numbers on stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_EVALS_PER_S = 1e8
IN_BITS = 16
LOG2_BATCH = 20
INNER = 8  # on-device iterations per dispatch (see _loopify)


def _loopify(fn, inner: int):
    """Run ``inner`` iterations of ``fn`` inside ONE jitted dispatch.

    Each executable launch travels the network tunnel to the TPU and does
    not fully pipeline: measured fixed cost is ~2 ms per dispatch, which
    at 2^19-2^20 batch is 30-50% of a tree-kernel step. Looping on device
    amortizes that to <1/inner. ``optimization_barrier`` keeps the inputs
    loop-carried so XLA cannot hoist the (otherwise loop-invariant) body
    out of the fori_loop.
    """
    import jax

    @jax.jit
    def run(*args):
        acc0 = fn(*args)

        def body(_, carry):
            a, acc = carry
            a = jax.lax.optimization_barrier(a)
            return (a, acc + fn(*a))

        _, acc = jax.lax.fori_loop(
            0, inner - 1, body,
            (jax.lax.optimization_barrier(tuple(args)), acc0))
        return acc

    return run


def _bench_dpf_eval(in_bits: int, log2_batch: int, iters: int = 16):
    import jax
    import jax.numpy as jnp
    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.ops import dpf_pallas
    from fss_tpu.prg.chacha import ChaCha
    from fss_tpu.schemes import dpf as _dpf

    B = 1 << log2_batch
    nonce = (0x0F0F0F0F, 0xF0F0F0F0)
    g = groups.Uint(32)
    prg = ChaCha(mul=2, nonce=nonce)
    rng = np.random.default_rng(42)

    s0s = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 4))))
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)

    # Key generation on device (batched scan), outside the timed region.
    gen = jax.jit(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b)))
    cws = gen(s0s, alphas, betas)
    seeds4, cws_t, xs2, ocw, _ = jax.jit(
        dpf_pallas.pack_keys, static_argnames=("in_bits", "block_rows"))(
            s0s[:, 0], cws, xs, in_bits=in_bits)

    @jax.jit
    def step1(seeds4, cws_t, xs2, ocw):
        so, t = dpf_pallas.eval_packed(seeds4, cws_t, xs2, in_bits=in_bits,
                                       party=0, nonce=nonce)
        y = dpf_pallas.finalize(g, 0, so, t, ocw, B)
        return jnp.sum(y[:, 0])

    step = _loopify(step1, INNER)
    chk = step(seeds4, cws_t, xs2, ocw)
    _ = int(chk)  # warm-up: compile + one full execution

    # The device queue is FIFO: fetching the LAST iteration's checksum
    # forces completion of all prior iterations. Per-iteration fetches
    # would add a host<->device round trip to every iteration (the TPU
    # here sits behind a network tunnel, so that RTT is large).
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = step(seeds4, cws_t, xs2, ocw)
    _ = int(chk)
    dt = (time.perf_counter() - t0) / (iters * INNER)
    return B / dt, dt


def _timeit(step, args, per_iter_items: int, iters: int = 8,
            inner: int = INNER):
    """Throughput of a jitted scalar-checksum step; one end-of-queue fetch.

    ``inner`` on-device iterations per dispatch (see _loopify), ``iters``
    dispatches enqueued back-to-back with a single trailing fetch."""
    import time as _t
    if inner > 1:
        step = _loopify(step, inner)
    chk = step(*args)
    _ = int(chk)
    t0 = _t.perf_counter()
    for _ in range(iters):
        chk = step(*args)
    _ = int(chk)
    dt = (_t.perf_counter() - t0) / (iters * inner)
    return per_iter_items / dt


def _bench_registry(deadline: float | None = None):
    """Secondary metrics mirroring the reference bench registry
    (src/bench_cpu.cu / bench_gpu.cu shapes), emitted on stderr.

    A generator: each row is yielded as soon as it is measured, so a
    crash or timeout partway through a long registry run (TPU windows
    on the shared pool are precious) still surfaces every completed
    row instead of losing the whole batch.

    ``FSS_BENCH_ONLY`` (comma-separated metric-name prefixes) restricts
    the registry to matching rows — the focused-window inverse of
    ``FSS_BENCH_SKIP`` (comma-separated metric-name prefixes), which skips
    matching rows: a row whose kernel faults the shared TPU worker
    (observed 2026-08-19 on dcf_eval_aes) poisons the process backend,
    so a rerun must be able to route around it without losing the
    other twenty rows. Skipping covers the row's device-side setup too
    (gen + key staging run inside ``_lazy`` closures that only fire
    when a non-skipped row needs them); the pre-headline verify gate is
    NOT covered — use scripts/verify_tpu.py's own family granularity
    if a gate config itself faults."""
    import os as _os
    _skips = tuple(s for s in
                   _os.environ.get("FSS_BENCH_SKIP", "").split(",") if s)
    _onlys = tuple(s for s in
                   _os.environ.get("FSS_BENCH_ONLY", "").split(",") if s)

    def _skip(name: str) -> bool:
        if _onlys and not any(name.startswith(p) for p in _onlys):
            return True
        if any(name.startswith(p) for p in _skips):
            print(f"bench: skipping {name} (FSS_BENCH_SKIP)",
                  file=sys.stderr)
            return True
        return False

    def _row(name, unit, thunk):
        # Lazy row: the measurement only runs if the row isn't skipped.
        # A raising row is reported and dropped instead of killing the
        # whole registry (a Mosaic lowering error in one kernel voided
        # 14 rows + roofline + full verify on 2026-08-19).
        if deadline is not None and time.time() >= deadline:
            print(f"bench: skipping {name} (deadline passed)",
                  file=sys.stderr)
            return ()
        if _skip(name):
            return ()
        try:
            return ((name, thunk(), unit),)
        except Exception as e:
            print(f"bench: row {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            return ()

    def _lazy(fn):
        """Memoized zero-arg setup closure: device-side row setup only
        executes when the first row that needs it is actually timed."""
        box = []

        def get():
            if not box:
                box.append(fn())
            return box[0]
        return get
    import jax
    import jax.numpy as jnp
    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.prg.chacha import ChaCha
    from fss_tpu.schemes import dcf as _dcf
    from fss_tpu.schemes import dpf as _dpf
    from fss_tpu.schemes import grotto_dcf as _gr
    from fss_tpu.schemes import half_tree_dpf as _ht

    g = groups.Uint(32)
    rng = np.random.default_rng(42)
    nonce = (1, 2)

    # Per-domain Pallas eval numbers.
    for ib in (14, 16, 20):
        yield from _row(
            f"dpf_eval_chacha_uint_{ib}bit", "evals/s/chip",
            lambda ib=ib: _bench_dpf_eval(ib, LOG2_BATCH, iters=8)[0])

    # DPF gen, batched keys (bench_gpu.cu BM_DpfGen shape).
    prg2 = ChaCha(mul=2, nonce=nonce)
    B = 1 << 19
    ib = 16
    s0sb = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
    alphas_u32 = rng.integers(0, 2**ib, size=B, dtype=np.uint32)
    a_l = blk.pack_inputs(alphas_u32, ib)
    betas = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 4))))

    # DPF eval with the AES-MMO PRG: fused bitsliced plane-domain kernel
    # (ops/aes_pallas.py; the reference's GPU soft-AES does 50.3 M/s,
    # its README.md:374).
    from fss_tpu.ops import aes_pallas as _aesk
    from fss_tpu.prg.aes import Aes128Mmo
    aes_keys = (bytes(range(16)), bytes(range(16, 32)))
    prga = Aes128Mmo(mul=2, keys=aes_keys)
    Ba = 1 << 19
    xsa_np = rng.integers(0, 2**ib, size=Ba, dtype=np.uint32)
    L_xsa = _lazy(lambda: jnp.asarray(xsa_np))

    @_lazy
    def L_dpf_aes():
        cwsa = jax.jit(jax.vmap(
            lambda s, a, b: _dpf.gen(prga, g, ib, s, a, b)))(
                s0sb[:Ba], a_l[:Ba], betas[:Ba])
        asp, acwp, axp, aocw, _ = jax.jit(
            _aesk.pack_eval, static_argnames=("in_bits", "block_rows"))(
                s0sb[:Ba, 0], cwsa, L_xsa(), in_bits=ib)
        return asp, acwp, axp, aocw

    @jax.jit
    def fae(sp, cwp, xp, ocw):
        so, to = _aesk.eval_packed(sp, cwp, xp, in_bits=ib, party=0,
                                   keys=aes_keys)
        s, t = _aesk.unpack_out(so, to, Ba)
        y = g.from_block(s)
        y = jnp.where(t.astype(jnp.bool_)[:, None],
                      g.add(y, g.from_block(ocw)), y)
        return jnp.sum(g.into_block(y)[:, 0])

    yield from _row(
        "dpf_eval_aes_uint_16bit", "evals/s/chip",
        lambda: _timeit(fae, L_dpf_aes(), Ba))

    # Half-Tree eval with the AES-MMO CCR hash (1 AES/level kernel).
    from fss_tpu.schemes import half_tree_dpf as _hts
    prgh = Aes128Mmo(mul=1, keys=aes_keys[:1])
    htk_a = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    hkb = blk.block(htk_a)
    hk_bytes = htk_a.tobytes()

    @_lazy
    def L_ht_aes():
        hcw_a, hocw_a = jax.jit(jax.vmap(
            lambda s, a, b: _hts.gen(prgh, g, ib, hkb, s, a, b)))(
            s0sb[:Ba], a_l[:Ba], betas[:Ba])
        hsp, hcwp, hxp, _ = jax.jit(
            _aesk.ht_pack_eval,
            static_argnames=("in_bits", "block_rows"))(
                s0sb[:Ba, 0], hcw_a, L_xsa(), in_bits=ib)
        return hsp, hcwp, hxp, hocw_a

    @jax.jit
    def fha(sp, cwp, xp, ocws):
        ho, lo = _aesk.ht_eval_packed(sp, cwp, xp, in_bits=ib, party=0,
                                      keys=(aes_keys[0],),
                                      hash_key=hk_bytes)
        sw, low = _aesk.unpack_out(ho, lo, Ba)
        y = g.from_block(sw)
        y = jnp.where(low.astype(jnp.bool_)[:, None],
                      g.add(y, g.from_block(ocws)), y)
        return jnp.sum(g.into_block(y)[:, 0])

    yield from _row(
        "half_tree_eval_aes_uint_16bit", "evals/s/chip",
        lambda: _timeit(fha, L_ht_aes(), Ba))

    # DCF eval with the AES-MMO PRG (4-lane plane-domain kernel with
    # in-kernel bitsliced value accumulation; staged keys).
    aes_keys4 = tuple(bytes(range(16 * i, 16 * (i + 1))) for i in range(4))
    from fss_tpu.schemes import dcf as _dcfs
    prgd4 = Aes128Mmo(mul=4, keys=aes_keys4)

    @_lazy
    def L_dcf_aes():
        # Host-chunked gen: the 2^19 mul=4 bitsliced-AES gen crashes
        # the TPU worker in ONE dispatch even lax.map-chunked; four
        # 2^17 dispatches run fine (triage_dcf_aes.jsonl step gen).
        genj = jax.jit(jax.vmap(
            lambda s, a, b: _dcfs.gen(prgd4, g, ib, "lt", s, a, b)))
        cwsda = blk.map_rows_host(
            lambda t: genj(*t), (s0sb[:Ba], a_l[:Ba], betas[:Ba]),
            Ba, 1 << 17)
        dasp, dacwp, daxp, davl, _ = jax.jit(
            _aesk.dcf_pack_eval,
            static_argnames=("in_bits", "block_rows"))(
                s0sb[:Ba, 0], cwsda, L_xsa(), in_bits=ib)
        return dasp, dacwp, daxp, davl

    @jax.jit
    def fdca(sp, cwp, xp, vl):
        vo, so, to = _aesk.dcf_eval_packed(
            sp, cwp, xp, in_bits=ib, party=0, keys=aes_keys4,
            group_is_xor=False, group_bits=32)
        v_raw, _ = _aesk.unpack_out(vo, to, Ba)
        s, tb = _aesk.unpack_out(so, to, Ba)
        vlb = vl if vl.shape[0] == 1 else vl[:Ba]
        term = g.from_block(s)
        term = jnp.where(tb.astype(jnp.bool_)[:, None],
                         g.add(term, g.from_block(vlb)), term)
        y = g.add(g.from_block(v_raw), term)
        return jnp.sum(g.into_block(y)[:, 0])

    yield from _row(
        "dcf_eval_aes_uint_16bit", "evals/s/chip",
        lambda: _timeit(fdca, L_dcf_aes(), Ba))

    # DCF gen with the AES-MMO PRG on the fused plane-domain kernel
    # (ops/aes_pallas.dcf_gen_batch): 8 bitsliced AES per level + the
    # ripple-carry value chain in one Pallas program. Same 2^16 batch
    # as the DPF-AES gen row (per-level cw planes are [ib, 258, T, 128]).
    Bga = 1 << 16
    fdga = jax.jit(lambda s, a, b: jnp.sum(_aesk.dcf_gen_batch(
        aes_keys4, g, ib, "lt", s, a, b)[:, 0, 0]))
    yield from _row(
        "dcf_gen_aes_uint_16bit", "keys/s/chip",
        lambda: _timeit(fdga, (s0sb[:Bga], jnp.asarray(alphas_u32[:Bga]),
                         betas[:Bga]), Bga, inner=4))

    # VDPF eval with the AES-MMO PRG + SHA-256 (staged keys; the hash and
    # finalize run per point outside the kernel, as in the reference's
    # Eval -> pi-tilde shape, vdpf.cuh:189-242).
    from fss_tpu.hash.sha256 import Sha256
    from fss_tpu.schemes import vdpf as _vdpfs
    sh = Sha256((0xA1B2C3D4, 0x11223344, 0x55667788, 0x99AABBCC))

    @_lazy
    def L_vdpf_aes():
        # Host-chunked gen (this row sat after round 3's crash point and
        # has never run at 2^19; same insurance as the DCF-AES row).
        vgenj = jax.jit(jax.vmap(
            lambda s, a, b: _vdpfs.gen(prga, sh.xor_hash, g, ib,
                                       s, a, b)))
        vcwa, vcsa, vocwa, _vf = blk.map_rows_host(
            lambda t: vgenj(*t), (s0sb[:Ba], a_l[:Ba], betas[:Ba]),
            Ba, 1 << 17)
        zrow = jnp.zeros((Ba, 1, 8), dtype=jnp.uint32)
        vasp, vacwp, vaxp, _, _ = jax.jit(
            _aesk.pack_eval,
            static_argnames=("in_bits", "block_rows"))(
                s0sb[:Ba, 0], jnp.concatenate([vcwa, zrow], axis=1),
                L_xsa(), in_bits=ib)
        return vasp, vacwp, vaxp, vcsa, vocwa, L_xsa()

    sh_key = tuple(int(w) for w in sh.key)

    @jax.jit
    def fvaes(sp, cwp, xp, cs, ocw, xs):
        from fss_tpu.ops import planes as _planes
        from fss_tpu.ops import sha256_pallas as _shk
        so, to = _aesk.eval_packed(sp, cwp, xp, in_bits=ib, party=0,
                                   keys=aes_keys)
        s, t = _aesk.unpack_out(so, to, Ba)
        y = g.from_block(s)
        y = jnp.where(t.astype(jnp.bool_)[:, None],
                      g.add(y, g.from_block(ocw)), y)
        # pi~ plane-direct: word planes feed the SHA kernel without the
        # [B, 4] row round trip (XLA CSEs the transposes with unpack).
        s4 = _aesk.unpack_word_planes(so)
        Bp = s4.shape[1] * 128
        x_lanes = blk.pack_inputs(xs, ib)
        xp4 = jnp.pad(x_lanes, ((0, Bp - Ba), (0, 0)))
        x4 = jnp.transpose(xp4, (1, 0)).reshape(4, Bp // 128, 128)
        pi_planes = _shk.xor_hash_planes(x4, s4, sh_key)
        pi = _planes.untile_blocks(pi_planes, Ba, 4)
        pi = jnp.where(t.astype(jnp.bool_)[:, None, None],
                       jnp.bitwise_xor(pi, cs), pi)
        return jnp.sum(g.into_block(y)[:, 0]) + jnp.sum(pi[:, 0, 0])

    yield from _row(
        "vdpf_eval_aes_sha256_uint_16bit", "evals/s/chip",
        lambda: _timeit(fvaes, L_vdpf_aes(), Ba))
    from fss_tpu.ops import dpf_pallas as _dpfk

    # Gen emitting the PACKED (plane) key layout the fused eval kernel
    # consumes directly — the gen->eval pipeline shape, with no
    # wire-format word-layout assembly (that conversion costs ~15%;
    # scripts/artifacts/gen_sweep.out).
    @_lazy
    def L_gen_packed():
        s8, a2, _ = jax.jit(
            _dpfk.pack_gen_inputs,
            static_argnames=("in_bits", "block_rows"))(
                s0sb, alphas_u32, in_bits=ib)
        return jax.device_put(s8), jax.device_put(a2)

    @jax.jit
    def fgp(s8, a2):
        outs = _dpfk.gen_packed(s8, a2, ib, nonce)
        return jnp.sum(outs[0][0, 0, 0]) + jnp.sum(outs[3][0])

    yield from _row(
        "dpf_gen_packed_chacha_uint_16bit", "keys/s/chip",
        lambda: _timeit(fgp, L_gen_packed(), B))

    # Eval consuming the PACKED key (api.PackedDpfKeys): the same fused
    # walk but streaming 5/8 of the wire-format cw bytes per level —
    # the eval half of the packed gen->eval pipeline.
    @_lazy
    def L_packedkey():
        cws_t, ocw, _ = _dpfk.gen_batch_packed(
            nonce, g, ib, s0sb, jnp.asarray(alphas_u32), betas)
        tile_rows = cws_t.shape[2] * 128
        s0p = jnp.pad(s0sb[:, 0], ((0, tile_rows - B), (0, 0)))
        seeds4 = jnp.transpose(s0p, (1, 0)).reshape(4, -1, 128)
        xs2 = jnp.pad(jnp.asarray(alphas_u32),
                      (0, tile_rows - B)).reshape(-1, 128)
        return (jax.device_put(seeds4), jax.device_put(cws_t),
                jax.device_put(xs2), jax.device_put(ocw))

    @jax.jit
    def fpk(seeds4, cws_t, xs2, ocw):
        so, t = _dpfk.eval_packed(seeds4, cws_t, xs2, in_bits=ib,
                                  party=0, nonce=nonce)
        y = _dpfk.finalize(g, 0, so, t, ocw, B)
        return jnp.sum(y[:, 0])

    yield from _row(
        "dpf_eval_packedkey_chacha_uint_16bit", "evals/s/chip",
        lambda: _timeit(fpk, L_packedkey(), B))

    fg = jax.jit(lambda s, a, b: jnp.sum(_dpfk.gen_batch(
        nonce, g, ib, s, a, b)[:, 0, 0]))
    yield from _row(
        "dpf_gen_chacha_uint_16bit", "keys/s/chip",
        lambda: _timeit(fg, (s0sb, jnp.asarray(alphas_u32), betas), B))

    # DPF gen with the AES-MMO PRG on the fused plane-domain kernel
    # (ops/aes_pallas.gen_batch). 2^16 batch: the per-level cw planes are
    # [in_bits, 130, T, 128] — ~0.5 GB at this size.
    Bg = 1 << 16
    fga = jax.jit(lambda s, a, b: jnp.sum(_aesk.gen_batch(
        aes_keys, g, ib, s, a, b)[:, 0, 0]))
    yield from _row(
        "dpf_gen_aes_uint_16bit", "keys/s/chip",
        lambda: _timeit(fga, (s0sb[:Bg], jnp.asarray(alphas_u32[:Bg]),
                         betas[:Bg]), Bg, inner=4))

    # DPF full-domain EvalAll, one key, 2^20 (no GPU analog in reference;
    # its CPU number is 6.29 M items/s).
    ib20 = 20
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    L_cws20 = _lazy(lambda: jax.jit(lambda s, b: _dpf.gen(
        prg2, g, ib20, s, blk.pack_inputs(12345, ib20), b))(s0s, beta))
    from fss_tpu.ops import eval_all_pallas as _eak
    fa = jax.jit(lambda s, c: jnp.sum(
        _eak.eval_all(prg2, g, ib20, 0, s, c)[:, 0]))
    yield from _row(
        "dpf_eval_all_chacha_uint_20bit", "items/s/chip",
        lambda: _timeit(fa, (jnp.asarray(s0s[0]), L_cws20()), 2**ib20))
    L_cws24 = _lazy(lambda: jax.jit(lambda s, b: _dpf.gen(
        prg2, g, 24, s, blk.pack_inputs(777777, 24), b))(s0s, beta))
    fa24 = jax.jit(lambda s, c: jnp.sum(
        _eak.eval_all(prg2, g, 24, 0, s, c)[:, 0]))
    yield from _row(
        "dpf_eval_all_chacha_uint_24bit", "items/s/chip",
        lambda: _timeit(fa24, (jnp.asarray(s0s[0]), L_cws24()), 2**24,
                   iters=4))

    # End-to-end two-server PIR lookup (samples/pir_tpu.py at scale):
    # EvalAll selector shares + wraparound-int32 contraction against a
    # 2^20-row x 16-word (64 MiB) database, all on device.
    db_np = rng.integers(0, 2**32, size=(2**ib20, 16),
                         dtype=np.uint32).astype(np.int32)
    fp = jax.jit(lambda s, c, d: jnp.sum(
        (_eak.eval_all(prg2, g, ib20, 0, s, c)[:, 0]
         .astype(jnp.int32)[:, None] * d).sum(axis=0, dtype=jnp.int32)))
    yield from _row(
        "pir_lookup_2e20rows_64B", "lookups/s/chip",
        lambda: _timeit(fp, (jnp.asarray(s0s[0]), L_cws20(),
                             jnp.asarray(db_np)), 1, iters=4))

    # DCF eval, per-instance keys (fused Pallas kernel).
    from fss_tpu.ops import dcf_pallas, ht_pallas
    prg4 = ChaCha(mul=4, nonce=nonce)
    Bd = 1 << 19
    xsd_np = rng.integers(0, 2**ib, size=Bd, dtype=np.uint32)
    L_xsd = _lazy(lambda: jnp.asarray(xsd_np))

    @_lazy
    def L_dcf_chacha():
        cwsd = jax.jit(jax.vmap(
            lambda s, a, b: _dcf.gen(prg4, g, ib, "lt", s, a, b)))(
                s0sb, a_l[:Bd], betas[:Bd])
        dseeds, dcws_t, dxs2, dvlast, _ = jax.jit(
            dcf_pallas.pack_keys,
            static_argnames=("in_bits", "block_rows"))(
                s0sb[:Bd, 0], cwsd, L_xsd(), in_bits=ib)
        return dseeds, dcws_t, dxs2, dvlast

    @jax.jit
    def fd(seeds4, cws_t, xs2, v_last):
        vo, so, t = dcf_pallas.eval_packed(seeds4, cws_t, xs2, in_bits=ib,
                                           party=0, nonce=nonce,
                                           group_mode="wrap")
        y = dcf_pallas.finalize(g, 0, vo, so, t, v_last, Bd)
        return jnp.sum(y[:, 0])

    yield from _row(
        "dcf_eval_chacha_uint_16bit", "evals/s/chip",
        lambda: _timeit(fd, L_dcf_chacha(), Bd))

    # DCF gen on the fused kernel (reference GPU: 176.9 M keys/s).
    fdg = jax.jit(lambda s, a, b: jnp.sum(dcf_pallas.gen_batch(
        nonce, g, ib, "lt", s, a, b)[:, 0, 0]))
    yield from _row(
        "dcf_gen_chacha_uint_16bit", "keys/s/chip",
        lambda: _timeit(fdg, (s0sb[:Bd], jnp.asarray(alphas_u32[:Bd]),
                         betas[:Bd]), Bd))

    # Half-Tree gen on the fused kernel (reference GPU: 174.9 M keys/s).
    htk_b = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    fhg = jax.jit(lambda s, a, b: jnp.sum(ht_pallas.gen_batch(
        nonce, g, ib, tuple(int(v) for v in htk_b), s, a, b)[0][:, 0, 0]))
    yield from _row(
        "half_tree_gen_chacha_uint_16bit", "keys/s/chip",
        lambda: _timeit(fhg, (s0sb[:Bd], jnp.asarray(alphas_u32[:Bd]),
                         betas[:Bd]), Bd))

    # Half-Tree eval, per-instance keys (fused Pallas kernel).
    prg1 = ChaCha(mul=1, nonce=nonce)
    hk_np = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    hk = jnp.asarray(hk_np)
    hk_t = tuple(int(v) for v in hk_np)

    @_lazy
    def L_ht_chacha():
        cwsh, ocwh = jax.jit(jax.vmap(
            lambda s, a, b: _ht.gen(prg1, g, ib, hk, s, a, b)))(
                s0sb, a_l[:Bd], betas[:Bd])
        hseeds, hcws_t, hxs2, _, _ = jax.jit(
            ht_pallas.pack_keys,
            static_argnames=("in_bits", "block_rows"))(
                s0sb[:Bd, 0], cwsh, ocwh, L_xsd(), in_bits=ib)
        return hseeds, hcws_t, hxs2, ocwh

    @jax.jit
    def fh(seeds4, cws_t, xs2, ocw):
        ho, lo = ht_pallas.eval_packed(seeds4, cws_t, xs2, in_bits=ib,
                                       party=0, nonce=nonce,
                                       hash_key=hk_t)
        y = ht_pallas.finalize(g, 0, ho, lo, ocw, Bd)
        return jnp.sum(y[:, 0])

    yield from _row(
        "half_tree_eval_chacha_uint_16bit", "evals/s/chip",
        lambda: _timeit(fh, L_ht_chacha(), Bd))

    # VDPF eval (per-instance keys, BLAKE3 hash; ref GPU: 262.7 M/s).
    from fss_tpu.hash.blake3 import Blake3
    from fss_tpu.ops import vdpf_pallas
    from fss_tpu.schemes import vdpf as _vdpf
    h3 = Blake3((0x11111111, 0x22222222, 0x33333333, 0x44444444,
                 0x55555555, 0x66666666, 0x77777777, 0x88888888))

    # Staged keys (like every other eval row — the methodology stages
    # keys on device before the timed region); the timed step is the
    # fused walk+hash kernel plus finalize/untile/cs-mix. One factory
    # builds both hash configs so the timed bodies cannot drift apart.
    def _vdpf_row(hashes, hash_kind, hash_const):
        @_lazy
        def L_keys():
            vcws, vcs, vocw, _ = jax.jit(jax.vmap(
                lambda s, a, b: _vdpf.gen(prg2, hashes.xor_hash, g, ib,
                                          s, a, b)))(s0sb, a_l, betas)
            vseeds, vcws_t, vxs2, _ = jax.jit(
                vdpf_pallas.pack_keys,
                static_argnames=("in_bits", "block_rows"))(
                    s0sb[:, 0], vcws, L_xsd(), in_bits=ib)
            return vseeds, vcws_t, vxs2, vcs, vocw

        @jax.jit
        def fstep(seeds4, cws_t, xs2, cs, ocw):
            from fss_tpu.ops import planes as _planes
            so, t, pi_planes = vdpf_pallas.fused_eval_packed(
                seeds4, cws_t, xs2, in_bits=ib, party=0, nonce=nonce,
                hash_kind=hash_kind, hash_const=hash_const)
            Bv = cs.shape[0]
            s = jnp.transpose(so.reshape(4, -1), (1, 0))[:Bv]
            tb = t.reshape(-1)[:Bv]
            y = g.from_block(s)
            y = jnp.where(tb.astype(jnp.bool_)[:, None],
                          g.add(y, g.from_block(ocw)), y)
            pi = _planes.untile_blocks(pi_planes, Bv, 4)
            pi = jnp.where(tb.astype(jnp.bool_)[:, None, None],
                           jnp.bitwise_xor(pi, cs), pi)
            return jnp.sum(g.into_block(y)[:, 0]) + jnp.sum(pi[:, 0, 0])

        return fstep, L_keys

    fv, L_vdpf_chacha = _vdpf_row(
        h3, "blake3", tuple(int(w) for w in h3.iv))
    yield from _row(
        "vdpf_eval_chacha_blake3_uint_16bit", "evals/s/chip",
        lambda: _timeit(fv, L_vdpf_chacha(), B))

    # Same walk, SHA-256 hash fused in-kernel (the reference cannot run
    # SHA-256 on device at all — hash/sha256.cuh __trap()s; host CPU
    # VDPF+SHA is its only analog, ~0.34 M/s).
    shc = Sha256((0xA1B2C3D4, 0x11223344, 0x55667788, 0x99AABBCC))
    fvs, L_vdpf_chacha_sha = _vdpf_row(
        shc, "sha256", tuple(int(w) for w in shc.key))
    yield from _row(
        "vdpf_eval_chacha_sha256_uint_16bit", "evals/s/chip",
        lambda: _timeit(fvs, L_vdpf_chacha_sha(), B))

    # VDPF full-domain with the tree proof fold (ref CPU: 736k items/s).
    L_vdpf_all = _lazy(lambda: jax.jit(
        lambda s, a, b: _vdpf.gen(prg2, h3.xor_hash, g, ib20, s, a, b))(
            s0s, blk.pack_inputs(12345, ib20), beta)[:3])

    @jax.jit
    def fva(s0, cws, cs, ocw):
        from fss_tpu.ops import eval_all_pallas as _eak2
        ys, pi = _eak2.vdpf_eval_all_chunked(
            prg2, h3.xor_hash, h3.hash64, g, ib20, 0, s0, cws, cs, ocw,
            fold="tree")
        return jnp.sum(ys[:, 0]) + jnp.sum(pi[:, 0])

    yield from _row(
        "vdpf_eval_all_tree_blake3_uint_20bit", "items/s/chip",
        lambda: _timeit(fva, (jnp.asarray(s0s[0]), *L_vdpf_all()),
                   2**ib20, iters=4))

    # DCF full-domain (ref CPU: 3.93 M items/s).
    L_dcf_all = _lazy(lambda: jax.jit(lambda s, b: _dcf.gen(
        prg4, g, ib20, "lt", s,
        blk.pack_inputs(12345, ib20), b))(s0s, beta))

    @jax.jit
    def fda(s0, cws):
        from fss_tpu.ops import eval_all_pallas as _eak4
        return jnp.sum(_eak4.dcf_eval_all(prg4, g, ib20, 0, s0,
                                          cws)[:, 0])

    yield from _row(
        "dcf_eval_all_chacha_uint_20bit", "items/s/chip",
        lambda: _timeit(fda, (jnp.asarray(s0s[0]), L_dcf_all()),
                        2**ib20))

    # Half-Tree full-domain (ref CPU: 10.74 M items/s, its best EvalAll).
    L_ht_all = _lazy(lambda: jax.jit(lambda s, b: _ht.gen(
        prg1, g, ib20, hk, s,
        blk.pack_inputs(12345, ib20), b))(s0s, beta))
    hk_t2 = tuple(int(v) for v in hk_np)

    @jax.jit
    def fha(s0, cws, ocw):
        from fss_tpu.ops import eval_all_pallas as _eak3
        return jnp.sum(_eak3.ht_eval_all(prg1, g, ib20, 0, hk_t2, s0,
                                         cws, ocw)[:, 0])

    yield from _row(
        "half_tree_eval_all_chacha_uint_20bit", "items/s/chip",
        lambda: _timeit(fha, (jnp.asarray(s0s[0]), *L_ht_all()),
                   2**ib20))

    # VDMPF batch evaluation, 2^14 points, t=30 (host-only in the
    # reference; vdmpf.cuh:202-270).
    from fss_tpu.api import Vdmpf as _VdmpfApi
    vm = _VdmpfApi(16, group=g, prg=prg2)
    vrng = np.random.default_rng(7)
    vm_alphas = sorted(vrng.choice(1 << 16, size=30,
                                   replace=False).tolist())
    vm_betas_np = blk.block(np.concatenate(
        [vrng.integers(0, 2**31, size=(30, 1)),
         np.zeros((30, 3), np.uint32)], axis=1))

    @_lazy
    def L_vdmpf():
        vk0, _vk1 = vm.gen_retry(vrng, vm_alphas,
                                 jnp.asarray(vm_betas_np))
        vm_xs = jnp.asarray(vrng.integers(0, 1 << 16, size=1 << 14,
                                          dtype=np.uint32))
        return vk0, vm_xs

    def fvm(xs):
        ys, pi = vm.batch_eval(0, L_vdmpf()[0], xs)
        return jnp.sum(ys[:, 0]) + jnp.sum(pi[0])

    yield from _row(
        "vdmpf_batch_eval_2e14pts_t30_16bit", "pts/s/chip",
        lambda: _timeit(fvm, (L_vdmpf()[1],), 1 << 14))

    # Grotto post-preprocess point queries against the packed prefix
    # table (reference CPU: 46.9 ns/query, its README.md:356).
    gxs_np = rng.integers(0, 2**ib20, size=1 << 20, dtype=np.uint32)

    @_lazy
    def L_grotto_tbl():
        gr_cws = jax.jit(lambda s: _gr.gen(
            prg2, groups.Bytes(), ib20, s,
            blk.pack_inputs(123456, ib20)))(s0s)
        gr_tbl = jax.jit(lambda s, c: _gr.preprocess_prefix(
            prg2, ib20, 0, s, c).words)(jnp.asarray(s0s[0]), gr_cws)
        return gr_tbl, jnp.asarray(gxs_np)

    def fgq(words, xs):
        tbl = _gr.PrefixTable(words=words, party=0, in_bits=ib20)
        return jnp.sum(_gr.eval_prefix(tbl, xs))

    yield from _row(
        "grotto_eval_batch_20bit", "queries/s/chip",
        lambda: _timeit(jax.jit(fgq), L_grotto_tbl(), 1 << 20))

    # Grotto full-domain (preprocess+eval_all shape).
    L_grotto_cws = _lazy(lambda: jax.jit(lambda s: _gr.gen(
        prg2, groups.Bytes(), ib20, s,
        blk.pack_inputs(500, ib20)))(s0s))
    fgr = jax.jit(lambda s, c: jnp.sum(
        _eak.grotto_eval_all(prg2, ib20, 0, s, c)))
    yield from _row(
        "grotto_eval_all_20bit", "items/s/chip",
        lambda: _timeit(fgr, (s0s[0], L_grotto_cws()), 2**ib20))



def _verify_gate(families=None, deadline: float | None = None) -> bool:
    """Byte-check hot kernels against reference-produced golden vectors
    ON THE DEVICE before timing anything (scripts/verify_tpu.py --quick).
    A silent XLA:TPU/Mosaic miscompile would otherwise time garbage; no
    headline is printed on mismatch.

    ``families`` restricts the gate: the HEADLINE only needs its own
    family verified (2 configs) — gating it on all ~31 quick configs let
    a contended window burn the whole driver budget before any number
    was printed (BENCH_r04: rc=124, parsed=null). The remaining families
    are verified later, as the REGISTRY's gate, with a ``deadline``."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    import jax
    import verify_tpu
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError as e:
        # Backend init failed even after _wait_for_device's budget (the
        # shared pool can be down for hours). Emit an honest JSON line
        # instead of a traceback so the driver records the outage.
        print(json.dumps({"metric": "TPU_UNAVAILABLE", "value": 0,
                          "unit": "evals/s/chip", "vs_baseline": 0,
                          "error": str(e)[:300]}))
        return False
    try:
        n = verify_tpu.run(quick=True, interpret=not on_tpu,
                           families=families, deadline=deadline)
    except verify_tpu.Mismatch as e:
        print(json.dumps({"metric": "VERIFY_FAILED", "value": 0,
                          "unit": "configs", "vs_baseline": 0,
                          "error": str(e)[:300]}))
        return False
    scope = "all families" if families is None else ",".join(families)
    print(f"verify gate [{scope}]: {n} kernel configs byte-exact "
          f"({'tpu' if on_tpu else 'cpu-interpret'})", file=sys.stderr)
    return True


def _wait_for_device(budget_s: float) -> None:
    """The tunneled TPU pool intermittently returns UNAVAILABLE (a claim
    can also queue for minutes). Retry backend init for up to
    ``budget_s`` so a transient outage doesn't void a bench run; give up
    and proceed (CPU fallback will fail loudly) once exhausted."""
    import subprocess
    deadline = time.time() + budget_s
    while True:
        # Probe in a subprocess: jax caches a failed backend init for the
        # life of the process, so the probe must not be this process.
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=max(60.0, budget_s / 2))
            ok, err = r.returncode == 0, r.stderr.decode()[-200:]
        except subprocess.TimeoutExpired:
            ok, err = False, "probe timed out (claim queued?)"
        if ok:
            return
        if time.time() >= deadline:
            print(f"bench: device wait exhausted: {err}", file=sys.stderr)
            return
        pause = min(60.0, max(1.0, deadline - time.time()))
        print(f"bench: TPU unavailable, retrying in {pause:.0f}s",
              file=sys.stderr)
        time.sleep(pause)


HEADLINE_METRIC = f"dpf_eval_chacha_uint_{IN_BITS}bit_batch2e{LOG2_BATCH}"


def main():
    """Budget discipline (the round-4 lesson — BENCH_r04 recorded rc=124
    with no number despite a completed on-chip campaign the day before):

    1. An OVERALL deadline (FSS_TPU_BENCH_DEADLINE_S, default 35 min)
       bounds everything: the device wait shrinks to fit it, the
       headline runs extra noise-rejection passes only while time
       remains, and the registry gate + registry stop at it.
    2. The headline is gated on ONLY its own kernel family (2 golden
       configs), not the full ~31-config quick sweep; the remaining
       families gate the registry, after the headline is out.
    3. SIGTERM/SIGINT flush the best measurement so far as the honest
       JSON line before dying, so a driver timeout can no longer erase
       a completed measurement."""
    import os
    import signal
    deadline = time.time() + float(
        os.environ.get("FSS_TPU_BENCH_DEADLINE_S", 2100))
    state = {"best": None, "printed": False}

    def _emit(partial=False):
        if state["printed"]:
            return
        state["printed"] = True
        if state["best"] is None:
            res = {"metric": "BENCH_INCOMPLETE", "value": 0,
                   "unit": "evals/s/chip", "vs_baseline": 0,
                   "partial": True}
        else:
            res = {"metric": HEADLINE_METRIC,
                   "value": round(state["best"], 1),
                   "unit": "evals/s/chip",
                   "vs_baseline": round(
                       state["best"] / BASELINE_EVALS_PER_S, 4)}
            if partial:
                res["partial"] = True
        print(json.dumps(res), flush=True)

    def _on_term(signum, frame):
        _emit(partial=True)
        sys.stdout.flush()
        os._exit(1 if state["best"] is None else 0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # The device wait must leave room for gate + at least one measured
    # pass (~8 min cold on a quiet chip) inside the overall deadline.
    reserve_s = 600.0
    _wait_for_device(min(
        float(os.environ.get("FSS_TPU_BENCH_WAIT_S", 1200)),
        max(60.0, deadline - time.time() - reserve_s)))
    if not _verify_gate(families=("dpf_eval",)):
        sys.exit(1)
    # Noise rejection: throughput over the tunneled chip has ~+-8%
    # run-to-run noise from unrelated host activity; the max over up to
    # 3 passes is the least-interference estimate (the same reason
    # latency benches report min). Pass 1 always runs; later passes only
    # if their (conservatively pass-1-cost-estimated) time fits the
    # deadline. state["best"] updates after every pass so a SIGTERM
    # mid-pass-2 still flushes pass 1's number.
    for _ in range(3):
        t_pass = time.time()
        try:
            v = _bench_dpf_eval(IN_BITS, LOG2_BATCH)[0]
        except Exception as e:
            # A transient device loss mid-pass must not erase a number
            # already measured — emit the best so far (or the honest
            # zero) instead of dying with a traceback and no JSON.
            print(f"bench: headline pass FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            break
        state["best"] = max(state["best"] or 0.0, v)
        pass_cost = time.time() - t_pass
        if time.time() + 1.2 * pass_cost >= deadline:
            break
    _emit()
    if state["best"] is None:
        sys.exit(1)

    if "--all" in sys.argv:
        # Registry gate: the families the headline gate skipped, still
        # before anything else is timed, still under the deadline.
        rest = ("dpf_eval_aes", "dcf_eval", "ht_eval", "vdpf_eval",
                "gen_kernels", "eval_all", "grotto_prefix", "vdmpf")
        if not _verify_gate(families=rest, deadline=deadline):
            sys.exit(1)
        for metric, value, unit in _bench_registry(deadline=deadline):
            print(json.dumps({
                "metric": metric, "value": round(value, 1), "unit": unit,
                "vs_baseline": round(value / BASELINE_EVALS_PER_S, 4)}),
                file=sys.stderr)


if __name__ == "__main__":
    main()
