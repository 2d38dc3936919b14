"""Two-server private information retrieval (PIR) on one chip.

The flagship FSS application: a client reads row ``idx`` of a database
replicated on two non-colluding servers without either server learning
``idx``. Built entirely from this framework's primitives, the way the
reference's DPF is meant to be deployed (myl7/fss README "FSS-based
PIR" motivation; dpf.cuh Gen/EvalAll are the two hot calls):

  dealer   — one DPF key pair for the point function f(idx) = 1
  servers  — EvalAll over the whole domain (the fused tree kernel on
             TPU), then contract the share vector against the database:
             ans_p = sum_j y_p[j] * DB[j]  (mod 2^32, wraparound int32)
  client   — ans_0 + ans_1 = DB[idx]; each server saw only a random
             share vector.

Multiplication distributes over additive shares mod 2^32, so the
contraction runs directly on the uint32 shares — on TPU the EvalAll is
the Pallas level-expansion kernel and the contraction is one fused
multiply + reduce over the domain axis (both stay on device; the only
host fetch is the D-word answer). Domain-sharded EvalAll
(`parallel/mesh.py`) scales the same two calls across a chip mesh with
a trailing psum.

Run: python samples/pir_tpu.py
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dpf

IN_BITS = 14
N = 1 << IN_BITS  # database rows
D = 16            # uint32 words per row (64-byte records)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    db = rng.integers(0, 2**32, size=(N, D), dtype=np.uint32)
    idx = int(rng.integers(0, N))

    # Dealer: one DPF key pair, beta = 1 in word 0 of the Uint group.
    g = groups.Uint(32)
    dpf = Dpf(IN_BITS, group=g)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    cws = dpf.gen(s0s, idx, blk.block([1, 0, 0, 0]))

    # Server p: EvalAll -> [N] selector shares, contract against the DB.
    # (a + b mod 2^32) * d == a*d + b*d mod 2^32, so each server works
    # on its share alone; int32 matmul semantics are wraparound.
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def server(s0, db_dev, party):
        ys = dpf.eval_all(party, s0, cws)        # [N, 4] uint32 shares
        sel = ys[:, 0].astype(jnp.int32)         # beta lives in word 0
        return (sel[:, None] * db_dev.astype(jnp.int32)).sum(
            axis=0, dtype=jnp.int32)

    db_dev = jnp.asarray(db)
    ans0 = server(jnp.asarray(s0s[0]), db_dev, 0)
    ans1 = server(jnp.asarray(s0s[1]), db_dev, 1)

    # Client: add the two answers; nothing else ever leaves a server.
    row = (np.asarray(ans0).astype(np.uint32)
           + np.asarray(ans1).astype(np.uint32))
    assert np.array_equal(row, db[idx]), "PIR reconstruction failed"
    print(f"PIR: row {idx} of a {N}x{D}-word database retrieved "
          f"privately ({row[:4].tolist()}...). OK")


if __name__ == "__main__":
    main()
