"""End-to-end DPF + DCF example (mirror of reference samples/dpf_dcf_cpu.cu).

8-bit domain, AES-128-MMO PRG, Bytes group, fixed seeds — the canonical
correctness configuration. Run: python samples/dpf_dcf_basic.py
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dcf, Dpf
from fss_tpu.prg.aes import Aes128Mmo

IN_BITS = 8
ALPHA = 42
KEY0 = bytes(range(1, 17))
KEY1 = bytes(range(16, 0, -1))
KEY2 = bytes([2] * 16)
KEY3 = bytes([3] * 16)

# Fixed party seeds (clamped bit zero), as in the reference sample.
SEEDS = blk.block([[0x11111111, 0x22222222, 0x33333333, 0x44444440],
                   [0x55555555, 0x66666666, 0x77777777, 0x88888880]])
BETA = blk.block([7, 0, 0, 0])


def dpf_sample():
    g = groups.Bytes()
    dpf = Dpf(IN_BITS, group=g, prg=Aes128Mmo(mul=2, keys=(KEY0, KEY1)))
    cws = dpf.gen(SEEDS, ALPHA, BETA)

    xs = np.arange(2**IN_BITS, dtype=np.uint32)
    y0 = np.asarray(dpf.eval(0, SEEDS[0], cws, xs))
    y1 = np.asarray(dpf.eval(1, SEEDS[1], cws, xs))
    rec = y0 ^ y1  # Bytes group reconstruction is XOR

    assert np.array_equal(rec[ALPHA], np.asarray(BETA))
    assert np.count_nonzero(rec.any(axis=-1)) == 1
    print(f"DPF: f({ALPHA}) = {rec[ALPHA].tolist()}; zero elsewhere. OK")


def dcf_sample():
    g = groups.Uint(32)
    dcf = Dcf(IN_BITS, group=g,
              prg=Aes128Mmo(mul=4, keys=(KEY0, KEY1, KEY2, KEY3)),
              pred="lt")
    beta = blk.block([604, 0, 0, 0])
    cws = dcf.gen(SEEDS, ALPHA, beta)

    xs = np.arange(2**IN_BITS, dtype=np.uint32)
    y0 = dcf.eval(0, SEEDS[0], cws, xs)
    y1 = dcf.eval(1, SEEDS[1], cws, xs)
    rec = np.asarray(g.add(g.from_block(y0), g.from_block(y1)))

    assert np.all(rec[:ALPHA, 0] == 604), "x < alpha must give beta"
    assert np.all(rec[ALPHA:] == 0), "x >= alpha must give 0"
    print(f"DCF: f(x) = 604 for x < {ALPHA}, 0 otherwise. OK")


if __name__ == "__main__":
    dpf_sample()
    dcf_sample()
