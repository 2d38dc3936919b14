"""DCF over modular output groups, including 128-bit non-power-of-two
moduli (reference group/uint.cuh:27-93 generality; every mode runs the
fused value-threaded kernel on TPU — ops/dcf_pallas.py module docstring).

Secret-shared interval counting is the classic use: with beta = 1 in
Z_m, sum_x Eval(x) over a query set counts how many x satisfy x < alpha
— shares stay in [0, m) and never overflow. Run:
python samples/dcf_mod_groups.py
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dcf
from fss_tpu.prg.chacha import ChaCha

IN_BITS = 10
ALPHA = 600
SEEDS = blk.block([[0x11111111, 0x22222222, 0x33333333, 0x44444440],
                   [0x55555555, 0x66666666, 0x77777777, 0x88888880]])

GROUPS = [
    ("Z_(1e9+7)  (prime field, mod64 kernel mode)",
     groups.Uint(32, mod=10**9 + 7), [1, 0, 0, 0]),
    ("Z_(2^61-1) (Mersenne, 64-bit lanes)",
     groups.Uint(64, mod=(1 << 61) - 1), [123456789, 7, 0, 0]),
    ("Z_(2^127)  (pow2 mod128 kernel mode)",
     groups.Uint(128, mod=1 << 127), [1, 2, 3, 4]),
    ("Z_(2^127-1) (NON-pow2 128-bit, mod128np 160-bit accumulator)",
     groups.Uint(128, mod=(1 << 127) - 1), [5, 6, 7, 8]),
]


def main():
    xs = np.array([0, 1, ALPHA - 1, ALPHA, ALPHA + 1, 2**IN_BITS - 1],
                  dtype=np.uint32)
    for label, g, beta_lanes in GROUPS:
        beta = blk.block(beta_lanes)
        dcf = Dcf(IN_BITS, group=g, prg=ChaCha(mul=4, nonce=(9, 9)),
                  pred="lt")
        cws = dcf.gen(SEEDS, ALPHA, beta)
        y0 = dcf.eval(0, SEEDS[0], cws, xs)
        y1 = dcf.eval(1, SEEDS[1], cws, xs)
        rec = np.asarray(g.add(g.from_block(y0), g.from_block(y1)))
        want = np.asarray(g.from_block(blk.clear_lsb(beta)))
        for i, x in enumerate(xs):
            exp = want if x < ALPHA else np.zeros_like(want)
            assert np.array_equal(rec[i], exp), (label, int(x))
        print(f"DCF over {label}: beta below alpha, zero above. OK")


if __name__ == "__main__":
    main()
