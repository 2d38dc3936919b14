"""Same-process gen->eval pipeline with PACKED keys (TPU-first shortcut).

When the same process generates keys and evaluates them (e.g. a dealer
simulating both parties, or offline preprocessing feeding an online
phase on one host), the wire-format [B, in_bits+1, 8] key rows are pure
overhead: the fused gen kernel natively produces — and the fused eval
kernel natively consumes — cw bit-planes. ``layout="packed"`` keeps keys
in that layout end to end: gen skips the word<->plane wire assembly
(measured ~18% of gen) and eval streams 5/8 of the wire cw bytes.

The reference has no analog — its bench always materializes wire keys
(src/bench_gpu.cu:70-93). Keys that must cross a process or network
boundary still need ``gen_batch(...)``'s default wire layout (bit-exact
with the reference); ``PackedDpfKeys.to_wire()`` converts.

Run: python samples/dpf_packed_pipeline.py
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dpf, PackedDpfKeys
from fss_tpu.prg.chacha import ChaCha

IN_BITS = 16
B = 1024
NONCE = (0x12345678, 0x9ABCDEF0)


def main():
    g = groups.Uint(32)
    dpf = Dpf(IN_BITS, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    rng = np.random.default_rng(1)

    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**IN_BITS, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))

    # One call, packed layout: on TPU this is the fused gen kernel with
    # no wire-row assembly; on CPU it falls back to wire + staging.
    keys = dpf.gen_batch(s0s, alphas, betas, layout="packed")
    assert isinstance(keys, PackedDpfKeys)

    # eval() accepts the packed keys wherever wire keys go.
    y0 = dpf.eval(0, s0s[:, 0], keys, alphas)
    y1 = dpf.eval(1, s0s[:, 1], keys, alphas)

    rec = np.asarray(g.add(g.from_block(np.asarray(y0)),
                           g.from_block(np.asarray(y1))))
    exp = np.asarray(g.from_block(blk.clear_lsb(betas)))
    assert np.array_equal(rec, exp)

    # Interop escape hatch: the packed key materializes to the exact
    # reference wire bytes when it must leave the process.
    wire = np.asarray(keys.to_wire(IN_BITS))
    wire2 = np.asarray(dpf.gen_batch(s0s, alphas, betas))
    assert np.array_equal(wire, wire2)
    print(f"{B} instances through the packed gen->eval pipeline: "
          f"reconstruct OK; to_wire() matches the wire-format gen. OK")


if __name__ == "__main__":
    main()
