"""The canonical word-plane tiling used by every batched hash/tree
kernel: a batch of 16-byte blocks rides [4k, T, 128] uint32 word planes
(lane = instance, row tile = 128 instances), so kernel layouts compose
without SoA<->row round trips. One implementation — blake3_pallas,
sha256_pallas, and the fused-kernel call sites all share it."""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128


def tile_blocks(words: jax.Array, block_rows: int):
    """[N, k, 4] word blocks -> ([4k, T, 128] planes, N). Pads N up to
    a block_rows*128 multiple."""
    n = words.shape[0]
    k4 = words.shape[1] * 4
    tile = block_rows * LANES
    npad = ((n + tile - 1) // tile) * tile
    w = jnp.pad(words.reshape(n, k4), ((0, npad - n), (0, 0)))
    return jnp.transpose(w, (1, 0)).reshape(k4, npad // LANES, LANES), n


def untile_blocks(planes: jax.Array, n: int, out_blocks: int):
    """[4k, T, 128] planes -> [N, k, 4] word blocks (inverse of
    tile_blocks up to padding)."""
    k4 = planes.shape[0]
    flat = jnp.transpose(planes.reshape(k4, -1), (1, 0))[:n]
    return flat.reshape(n, out_blocks, 4)
