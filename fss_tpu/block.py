"""L0 block utilities: the 128-bit block as 4 little-endian uint32 lanes.

TPU-native re-design of the reference's ``int4`` datum (reference:
include/fss/util.cuh:16-64). A *block* is a jnp array of shape ``[..., 4]``
and dtype uint32; lane 0 is the least-significant 32 bits ("x" in the
reference), lane 3 ("w") holds the *clamped bit* in its LSB, which smuggles
the FSS control bit ``t`` alongside a 127-bit seed.

All ops are shape-polymorphic over leading (batch) dims, jit/vmap friendly,
and pure. Hot kernels unpack blocks into per-word arrays (structure-of-
arrays) so that every VPU op runs over a full batch axis; helpers here are
the thin boundary layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
BLOCK_LANES = 4

_ONE = np.uint32(1)
_NOT_ONE = np.uint32(0xFFFFFFFE)


def block(vals) -> jax.Array:
    """Build a block (or batch of blocks) from a [..., 4] int-like array."""
    arr = np.asarray(vals, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    return jnp.asarray(arr.astype(np.uint32))


def zeros(shape=()) -> jax.Array:
    return jnp.zeros((*shape, BLOCK_LANES), dtype=U32)


def xor(lhs: jax.Array, rhs: jax.Array) -> jax.Array:
    """XOR of blocks (reference util.cuh:16)."""
    return jnp.bitwise_xor(lhs, rhs)


def set_lsb(blk: jax.Array, bit) -> jax.Array:
    """Set the clamped bit (LSB of lane 3) to ``bit`` (reference util.cuh:30).

    ``bit`` may be a bool scalar or a broadcastable uint32/bool array of the
    block's batch shape.
    """
    blk = jnp.asarray(blk)
    bitv = jnp.asarray(bit, dtype=U32) & _ONE
    w = (blk[..., 3] & _NOT_ONE) | bitv
    return blk.at[..., 3].set(w)


def get_lsb(blk: jax.Array) -> jax.Array:
    """Read the clamped bit as uint32 0/1 (reference util.cuh:36)."""
    return blk[..., 3] & _ONE


def clear_lsb(blk: jax.Array) -> jax.Array:
    blk = jnp.asarray(blk)
    return blk.at[..., 3].set(blk[..., 3] & _NOT_ONE)


def select(cond, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-element block select: cond ? a : b, with cond of batch shape."""
    c = jnp.asarray(cond, dtype=jnp.bool_)
    return jnp.where(c[..., None], a, b)


def masked_xor(cond, blk: jax.Array, delta: jax.Array) -> jax.Array:
    """blk ^ (cond ? delta : 0) — the FSS correction-word application."""
    c = jnp.asarray(cond, dtype=jnp.bool_)
    return jnp.where(c[..., None], jnp.bitwise_xor(blk, delta), blk)


# ---------------------------------------------------------------------------
# Input-domain packing: alpha / x values as blocks (reference util.cuh:47-64)
# ---------------------------------------------------------------------------

def pack_int(val: int) -> np.ndarray:
    """Python int (up to 128 bits) -> numpy [4] uint32 little-endian lanes."""
    v = int(val)
    return np.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(4)],
                    dtype=np.uint32)


def unpack_int(lanes) -> int:
    """[4] uint32 lanes -> Python int."""
    lanes = np.asarray(lanes, dtype=np.uint64)
    return int(sum(int(lanes[i]) << (32 * i) for i in range(4)))


def pack_inputs(xs, in_bits: int) -> jax.Array:
    """Pack a batch of input-domain values into [..., 4] uint32 lane arrays.

    Accepts: a Python int / list of ints (any width up to 128), or a uint32/
    int array for in_bits <= 32, or an already-packed [..., 4] uint32 array.
    """
    if isinstance(xs, (int, np.integer)):
        return jnp.asarray(pack_int(int(xs)))
    if (isinstance(xs, (list, tuple)) and xs
            and isinstance(xs[0], (int, np.integer))):
        return jnp.asarray(np.stack([pack_int(int(v)) for v in xs]))
    arr = jnp.asarray(xs)
    if arr.ndim >= 1 and arr.shape[-1] == 4 and arr.dtype == U32:
        return arr
    if in_bits > 32:
        raise ValueError(
            f"in_bits={in_bits} > 32 requires pre-packed [..., 4] uint32 "
            f"inputs or Python ints, got array of dtype {arr.dtype}")
    lane0 = arr.astype(U32)
    rest = jnp.zeros((*lane0.shape, 3), dtype=U32)
    return jnp.concatenate([lane0[..., None], rest], axis=-1)


def input_bits_msb_first(x_lanes: jax.Array, in_bits: int) -> jax.Array:
    """Extract [..., in_bits] uint32 0/1 bits of the input, MSB first.

    Bit j of the output is bit (in_bits - 1 - j) of the integer, matching the
    reference's per-level ``(x >> (in_bits - 1 - i)) & 1`` (dpf.cuh:190).
    """
    positions = np.arange(in_bits - 1, -1, -1)  # MSB-first bit positions
    lanes = positions // 32
    shifts = np.uint32(positions % 32)
    gathered = x_lanes[..., lanes]  # [..., in_bits]
    return (gathered >> jnp.asarray(shifts)) & _ONE


# ---------------------------------------------------------------------------
# int32 <-> uint32 boundary (reference tensors are int32)
# ---------------------------------------------------------------------------

def from_i32(arr: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(jnp.asarray(arr, dtype=jnp.int32), U32)


def to_i32(arr: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(arr, jnp.int32)


# ---------------------------------------------------------------------------
# Structure-of-arrays helpers for hot kernels
# ---------------------------------------------------------------------------

def to_words(blk: jax.Array):
    """[..., 4] block -> tuple of 4 per-word arrays (SoA for the VPU)."""
    return blk[..., 0], blk[..., 1], blk[..., 2], blk[..., 3]


def from_words(w0, w1, w2, w3) -> jax.Array:
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def map_rows(fn, args, rows: int, max_rows: int):
    """Apply a batched function over leading-axis chunks via lax.map.

    Very large single fusions of the bitsliced AES / plane-transpose
    graphs can crash the TPU worker (observed 2026-08-19 at B=2^19 on
    the vmapped mul=4 AES DCF gen; scripts/artifacts/
    triage_dcf_aes.jsonl). ``fn`` takes the pytree ``args`` whose arrays
    all have leading dim ``rows``; when rows exceeds ``max_rows`` (and
    divides evenly) the call runs as sequential max_rows-sized chunks
    inside one device program. Bit-exact: chunks are independent rows.
    """
    if rows <= max_rows or rows % max_rows:
        return fn(args)
    c = rows // max_rows
    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape((c, max_rows) + a.shape[1:]), args)
    out = jax.lax.map(fn, chunked)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), out)


def map_rows_host(fn, args, rows: int, max_rows: int):
    """Like :func:`map_rows` but each chunk is a SEPARATE device
    dispatch (host loop + concatenate).

    Needed when even the lax.map-chunked program crashes the worker:
    the 2^19-instance mul=4 AES DCF gen faults inside ONE dispatch
    regardless of in-program chunking, but runs fine as four 2^17
    dispatches (triage_dcf_aes.jsonl, 2026-08-19). ``fn`` should be
    jitted by the caller so all chunks share one compilation.
    """
    if rows <= max_rows or rows % max_rows:
        return fn(args)
    c = rows // max_rows
    outs = []
    for i in range(c):
        chunk = jax.tree_util.tree_map(
            lambda a: a[i * max_rows:(i + 1) * max_rows], args)
        outs.append(fn(chunk))
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *outs)
