"""Mesh-level parallelism: sharded full-domain evaluation and key batches.

The reference has no multi-device story at all (SURVEY.md 2.7): CPU
full-domain expansion uses OpenMP subtree tasks (dpf.cuh:287-296) and the
GPU path is single-device batch parallelism. Here both become first-class
mesh axes:

  - ``data``: independent keys / eval points shard trivially (pjit on the
    leading batch axis) — the throughput workhorse.
  - ``domain``: full-domain expansion of one key. The first log2(n_shards)
    tree levels are computed replicated (they are tiny), then each device
    expands its own subtree locally — the same decomposition the reference's
    OpenMP par_depth performs across threads, lifted onto the ICI mesh.

Cross-party reconstruction stays out of band (two parties are distinct trust
domains); in-test reconstruction is an elementwise op plus psum/XOR-reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fss_tpu import block as blk
from fss_tpu.schemes import _tree, dpf as _dpf
from fss_tpu.schemes import dcf as _dcf
from fss_tpu.schemes import half_tree_dpf as _ht
from fss_tpu.schemes import vdpf as _vdpf


def data_sharding(mesh: Mesh, axis: str = "data"):
    """Sharding for [B, ...] batches: shard the leading axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, arr, axis: str = "data"):
    ndim = jnp.asarray(arr).ndim
    spec = P(axis, *([None] * (ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def dpf_eval_all_sharded(prg2, group, in_bits: int, party: int,
                         s0: jax.Array, cws: jax.Array, mesh: Mesh,
                         axis: str = "domain") -> jax.Array:
    """Full-domain DPF evaluation sharded over the mesh ``axis``.

    Returns [2^in_bits, 4] sharded on the leading (domain) axis. The first
    k = log2(axis_size) levels run replicated; each device then expands its
    subtree with the dense doubling kernel.
    """
    n_shards = mesh.shape[axis]
    k = int(np.log2(n_shards))
    assert 2**k == n_shards, "axis size must be a power of two"
    assert k <= in_bits

    def run(s0, cws):
        # Replicated prefix: expand to 2^k subtree roots.
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
        for i in range(k):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)

        def subtree(s_roots, t_roots, cws):
            idx = jax.lax.axis_index(axis)
            s_l = jax.lax.dynamic_slice_in_dim(s_roots, idx, 1, 0)
            t_l = jax.lax.dynamic_slice_in_dim(t_roots, idx, 1, 0)
            for i in range(k, in_bits):
                s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
                s_l, t_l = _tree.expand_level(prg2, s_l, t_l,
                                              s_cw, tl_cw, tr_cw)
            return _dpf.finalize_leaves(group, in_bits, party, s_l, t_l, cws)

        body = jax.shard_map(
            subtree, mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(axis, None))
        return body(s, t, cws)

    return jax.jit(run)(s0, cws)


def pir_lookup_sharded(prg2, in_bits: int, party: int, s0: jax.Array,
                       cws: jax.Array, db: jax.Array, mesh: Mesh,
                       axis: str = "domain") -> jax.Array:
    """One two-server PIR answer share over a mesh-sharded database.

    The application-level composition of the domain axis (see
    samples/pir_tpu.py for the single-chip flow): ``db`` is
    [2^in_bits, D] int32 sharded on its leading axis; the DPF key must
    encode beta = (1, 0, 0, 0) at the private index. Each device
    expands its own subtree (the dpf_eval_all_sharded decomposition),
    contracts its local selector shares against its local DB rows with
    wraparound-int32 arithmetic — multiplication distributes over
    additive shares mod 2^32 — and a ``psum`` over ``axis`` folds the
    partial answers. Returns the [D] int32 answer share, replicated;
    the DB rows never move between devices, only the D-word partials
    ride the ICI.
    """
    k = _shard_prefix(mesh, axis, in_bits)
    from fss_tpu import groups as _groups
    g32 = _groups.Uint(32)

    def run(s0, cws, db):
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
        for i in range(k):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)

        def subtree(s_roots, t_roots, cws, db_l):
            idx = jax.lax.axis_index(axis)
            s_l = jax.lax.dynamic_slice_in_dim(s_roots, idx, 1, 0)
            t_l = jax.lax.dynamic_slice_in_dim(t_roots, idx, 1, 0)
            for i in range(k, in_bits):
                s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
                s_l, t_l = _tree.expand_level(prg2, s_l, t_l,
                                              s_cw, tl_cw, tr_cw)
            ys = _dpf.finalize_leaves(g32, in_bits, party, s_l, t_l, cws)
            sel = ys[:, 0].astype(jnp.int32)
            part = (sel[:, None] * db_l).sum(axis=0, dtype=jnp.int32)
            return jax.lax.psum(part, axis)

        body = jax.shard_map(
            subtree, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis, None)),
            out_specs=P())
        return body(s, t, cws, db)

    return jax.jit(run)(s0, cws, db)


def _shard_prefix(mesh: Mesh, axis: str, in_bits: int):
    n_shards = mesh.shape[axis]
    k = int(np.log2(n_shards))
    assert 2**k == n_shards, "axis size must be a power of two"
    assert k <= in_bits
    return k


def dcf_eval_all_sharded(prg4, group, in_bits: int, party: int,
                         s0: jax.Array, cws: jax.Array, mesh: Mesh,
                         axis: str = "domain") -> jax.Array:
    """Full-domain DCF evaluation sharded over ``axis``: the partial value
    v threads through the replicated prefix levels into each shard's local
    subtree expansion (the OpenMP value-threading of dcf.cuh:294-385 lifted
    onto the mesh)."""
    k = _shard_prefix(mesh, axis, in_bits)

    def run(s0, cws):
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
        v = group.zero((1,))
        for i in range(k):
            s, t, v = _dcf.expand_level(prg4, group, party, s, t, v, cws[i])

        def subtree(s_r, t_r, v_r, cws):
            idx = jax.lax.axis_index(axis)
            s_l = jax.lax.dynamic_slice_in_dim(s_r, idx, 1, 0)
            t_l = jax.lax.dynamic_slice_in_dim(t_r, idx, 1, 0)
            v_l = jax.lax.dynamic_slice_in_dim(v_r, idx, 1, 0)
            for i in range(k, in_bits):
                s_l, t_l, v_l = _dcf.expand_level(prg4, group, party, s_l,
                                                  t_l, v_l, cws[i])
            return _dcf.finalize_leaves(group, in_bits, party, s_l, t_l,
                                        v_l, cws)

        body = jax.shard_map(subtree, mesh=mesh,
                             in_specs=(P(), P(), P(), P()),
                             out_specs=P(axis, None))
        return body(s, t, v, cws)

    return jax.jit(run)(s0, cws)


def grotto_eval_all_sharded(prg2, in_bits: int, party: int, s0: jax.Array,
                            cws: jax.Array, mesh: Mesh,
                            axis: str = "domain") -> jax.Array:
    """Sharded Grotto full-domain comparison shares: local tree expansion
    plus a two-level prefix-XOR — per-shard associative_scan, then an
    exclusive XOR of lower shards' totals via all_gather over ICI (the
    running-XOR of grotto_dcf.cuh:160-162 distributed)."""
    k = _shard_prefix(mesh, axis, in_bits)

    def run(s0, cws):
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
        for i in range(k):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)

        def subtree(s_r, t_r, cws):
            idx = jax.lax.axis_index(axis)
            s_l = jax.lax.dynamic_slice_in_dim(s_r, idx, 1, 0)
            t_l = jax.lax.dynamic_slice_in_dim(t_r, idx, 1, 0)
            for i in range(k, in_bits):
                s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
                s_l, t_l = _tree.expand_level(prg2, s_l, t_l, s_cw, tl_cw,
                                              tr_cw)
            local = jax.lax.associative_scan(jnp.bitwise_xor, t_l)
            totals = jax.lax.all_gather(local[-1], axis)  # [n_shards]
            lower = jax.lax.broadcasted_iota(jnp.uint32, totals.shape,
                                             0) < idx
            masked = jnp.where(lower, totals, jnp.zeros_like(totals))
            offset = jax.lax.associative_scan(jnp.bitwise_xor, masked)[-1]
            return local ^ offset

        body = jax.shard_map(subtree, mesh=mesh,
                             in_specs=(P(), P(), P()),
                             out_specs=P(axis))
        return body(s, t, cws)

    return jax.jit(run)(s0, cws)


def half_tree_eval_all_sharded(prg1, group, in_bits: int, party: int,
                               hash_key: jax.Array, s0: jax.Array,
                               cws: jax.Array, ocw: jax.Array, mesh: Mesh,
                               axis: str = "domain") -> jax.Array:
    """Sharded Half-Tree full-domain evaluation: replicated prefix to the
    shard roots, local expansion to level n-1, local batched last-level
    conversion (half_tree_dpf.cuh:241-276 on the mesh)."""
    k = _shard_prefix(mesh, axis, in_bits)
    assert k <= in_bits - 1, "need at least one local level before convert"

    def run(s0, cws, ocw):
        node = blk.set_lsb(s0, np.uint32(party))[None, :]
        for i in range(k):
            t = blk.get_lsb(node)
            h = prg1(jnp.bitwise_xor(hash_key, node))[0]
            left = blk.masked_xor(t, h, cws[i, 0:4])
            right = jnp.bitwise_xor(left, node)
            m = node.shape[0]
            node = jnp.stack([left, right], axis=1).reshape(2 * m, 4)

        def subtree(nodes, cws, ocw):
            idx = jax.lax.axis_index(axis)
            n_l = jax.lax.dynamic_slice_in_dim(nodes, idx, 1, 0)
            for i in range(k, in_bits - 1):
                t = blk.get_lsb(n_l)
                h = prg1(jnp.bitwise_xor(hash_key, n_l))[0]
                left = blk.masked_xor(t, h, cws[i, 0:4])
                right = jnp.bitwise_xor(left, n_l)
                m = n_l.shape[0]
                n_l = jnp.stack([left, right], axis=1).reshape(2 * m, 4)
            return _ht.convert_last_level(prg1, group, in_bits, party,
                                          hash_key, n_l, cws, ocw)

        body = jax.shard_map(subtree, mesh=mesh,
                             in_specs=(P(), P(), P()),
                             out_specs=P(axis, None))
        return body(node, cws, ocw)

    return jax.jit(run)(s0, cws, ocw)


def vdpf_eval_all_sharded(prg2, xor_hash, hash64, group, in_bits: int,
                          party: int, s0: jax.Array, cws: jax.Array,
                          cs: jax.Array, ocw: jax.Array, mesh: Mesh,
                          axis: str = "domain"):
    """Sharded VDPF full-domain evaluation + proof.

    Outputs and per-point hashes are local; the order-dependent proof fold
    (vdpf.cuh:253-263) becomes the framework's documented two-level chain:
    each shard folds its own points in index order seeded from cs, then the
    shard proofs are folded in shard order (again seeded from cs). Both
    parties compute the identical structure, which is all Verify needs;
    the single-device eval_all keeps the reference's flat order.
    """
    k = _shard_prefix(mesh, axis, in_bits)

    def run(s0, cws, cs, ocw):
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
        for i in range(k):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)

        def subtree(s_r, t_r, cws, cs, ocw):
            idx = jax.lax.axis_index(axis)
            s_l = jax.lax.dynamic_slice_in_dim(s_r, idx, 1, 0)
            t_l = jax.lax.dynamic_slice_in_dim(t_r, idx, 1, 0)
            for i in range(k, in_bits):
                s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
                s_l, t_l = _tree.expand_level(prg2, s_l, t_l, s_cw, tl_cw,
                                              tr_cw)
            local_n = s_l.shape[0]
            y = group.from_block(s_l)
            y = jnp.where(t_l.astype(jnp.bool_)[..., None],
                          group.add(y, jnp.broadcast_to(
                              group.from_block(ocw), y.shape)), y)
            if party:
                y = group.neg(y)
            ys = group.into_block(y)

            base = idx.astype(jnp.uint32) * np.uint32(local_n)
            xs = base + jax.lax.broadcasted_iota(
                jnp.uint32, (local_n, 1), 0)[:, 0]
            x_lanes = blk.pack_inputs(xs, min(in_bits, 32))
            pts = xor_hash(x_lanes, s_l)
            pts = jnp.where(t_l.astype(jnp.bool_)[..., None, None],
                            jnp.bitwise_xor(pts, cs), pts)
            # shard_map carry typing: mark cs varying over the mesh axis
            cs_v = jax.lax.pcast(cs, (axis,), to="varying")
            pi_local = _vdpf.prove(hash64, pts, cs_v)
            # Ordered shard merge: chain over shard proofs, seeded at cs.
            all_pi = jax.lax.all_gather(pi_local, axis)  # [n_shards, 4, 4]
            pi = _vdpf.prove(hash64, all_pi, cs_v)
            # Every shard computed the same merged proof; emit each shard's
            # copy (sharded on axis) and take shard 0's outside.
            return ys, pi[None]

        body = jax.shard_map(subtree, mesh=mesh,
                             in_specs=(P(), P(), P(), P(), P()),
                             out_specs=(P(axis, None), P(axis, None, None)))
        ys, pi_all = body(s, t, cws, cs, ocw)
        return ys, pi_all[0]

    return jax.jit(run)(s0, cws, cs, ocw)


def vdmpf_batch_eval_sharded(prg2, xor_hash, hash64, group, in_bits: int,
                             bucket_bits: int, party: int, key, xs,
                             mesh: Mesh, axis: str = "data",
                             kappa: int = 3):
    """Data-sharded VDMPF BatchEval: the eta x kappa Locate routing and
    inner VDPF evals shard on ``axis`` (the natural axis — each point's
    work is independent); the bucket keys are replicated. Per-shard tree
    proofs merge with an ordered cross-shard chain seeded at zero — both
    parties compute the identical structure from public data (sigma, xs),
    which is all Verify needs. Returns (ys [eta, 4], pi [4, 4]).

    Proof comparability: xs is padded to a shard multiple and the padded
    lanes are dropped from ys but their pi-tildes DO fold into each
    shard's proof, so the merged proof depends on the shard count and
    padding. Both parties computing with the same mesh shape produce
    identical proofs (padding is public), which is what Verify checks —
    but a sharded proof is not byte-comparable to the unsharded fold or
    to a different mesh shape.
    """
    from fss_tpu.schemes import vdmpf as _vdmpf

    n_shards = mesh.shape[axis]
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    eta = xs.shape[0]
    pad = (-eta) % n_shards
    # Padded lanes evaluate, are dropped from ys, and fold into the proof
    # (see the docstring's comparability note).
    xs_p = jnp.pad(xs, (0, pad))

    def shard_fn(xs_l, s0, cws, cs, ocw):
        k_l = _vdmpf.VdmpfKey(key.sigma, key.m_rt, key.b_size_rt, s0, cws,
                              cs, ocw)
        ys, pi = _vdmpf.batch_eval(prg2, xor_hash, hash64, group, in_bits,
                                   bucket_bits, party, k_l, xs_l, kappa)
        all_pi = jax.lax.all_gather(pi, axis)  # [n_shards, 4, 4]

        def step(p, q):
            h = hash64(jnp.bitwise_xor(p, q))
            return p.at[:2].set(jnp.bitwise_xor(p[:2], h)), None

        merged, _ = jax.lax.scan(step,
                                 jnp.zeros((4, 4), dtype=jnp.uint32),
                                 all_pi)
        return ys, merged[None]

    # check_vma off: batch_eval mixes shard-varying values (from xs) with
    # replicated key constants throughout its internal scans; the manual
    # collectives here (one all_gather) are correct by construction.
    body = jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(axis), P(), P(), P(), P()),
                         out_specs=(P(axis, None), P(axis, None, None)),
                         check_vma=False)
    ys, pi_all = jax.jit(body)(xs_p, key.s0, key.cws, key.cs, key.ocw)
    return ys[:eta], pi_all[0]


def reconstruct_uint_psum(group, y_lanes: jax.Array, axis: str) -> jax.Array:
    """In-mesh reconstruction helper for additively-shared Uint outputs:
    group-add across the named axis (used by tests/benches only; real
    deployments reconstruct out of band)."""
    # XOR groups reduce with XOR; additive groups with carry-aware adds.
    # jax.lax.psum works lane-wise for wrap-free cases; general case gathers.
    gathered = jax.lax.all_gather(y_lanes, axis)  # [n_shards, ..., 4]

    def fold(acc, nxt):
        return group.add(acc, nxt)

    return jax.lax.associative_scan(fold, gathered)[-1]


def make_mesh(n_devices: int | None = None,
              axis_names=("data",)) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs[:n_devices]).reshape(shape), axis_names)


def make_multihost_mesh(axis_names=("data", "domain"),
                        data_axis_hosts: bool = True) -> Mesh:
    """Mesh for a multi-host slice (run under ``jax.distributed``).

    Lays the host (DCN) dimension on the FIRST axis and keeps the
    intra-host (ICI) chips on the remaining axes, so that the high-traffic
    collectives of the domain axis (all_gathers of subtree leaves, proof
    merges) ride ICI while only the embarrassingly-parallel data axis
    crosses DCN — the layout BASELINE's >=85% linear multi-host scaling
    target assumes. Example on 4 hosts x 8 chips:
    ``Mesh((4, 8), ("data", "domain"))``.

    Call ``jax.distributed.initialize()`` on every host first; all hosts
    must call this identically (jax.devices() is globally consistent).
    """
    import jax.experimental.mesh_utils as mesh_utils

    n_hosts = jax.process_count()
    per_host = len(jax.local_devices())
    if len(axis_names) == 1:
        shape = (n_hosts * per_host,)
    else:
        shape = (n_hosts, per_host) + (1,) * (len(axis_names) - 2)
    devs = mesh_utils.create_device_mesh(shape) if data_axis_hosts else \
        np.array(jax.devices()).reshape(shape)
    return Mesh(devs, axis_names)
