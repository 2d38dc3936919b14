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
