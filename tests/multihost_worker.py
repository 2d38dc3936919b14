"""Worker process for the 2-process jax.distributed test.

Run as: python multihost_worker.py <proc_id> <n_procs> <port> <out_dir>

Each process owns 4 virtual CPU devices (8 global). Exercises the
multi-host surface the reference never had (SURVEY §2.7 "new surface"):
``make_multihost_mesh`` + data-sharded batched gen/eval + domain-sharded
full-domain EvalAll with the domain axis spanning BOTH processes, and
cross-checks results bit-exactly against a single-device run. Writes
"ok" to <out_dir>/proc<i>.ok on success (the pytest wrapper asserts).
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

proc_id, n_procs, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n_procs, process_id=proc_id)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from fss_tpu import block as blk  # noqa: E402
from fss_tpu import groups  # noqa: E402
from fss_tpu.parallel import mesh as pmesh  # noqa: E402
from fss_tpu.prg.chacha import ChaCha  # noqa: E402
from fss_tpu.schemes import dpf as _dpf  # noqa: E402

assert jax.process_count() == n_procs
assert len(jax.devices()) == 4 * n_procs

in_bits = 8
g = groups.Uint(32)
prg = ChaCha(mul=2, nonce=(11, 22))
rng = np.random.default_rng(123)  # same stream on every process

# ---- 2D multihost mesh: data axis = hosts (DCN), domain axis = local ----
mesh2d = pmesh.make_multihost_mesh(axis_names=("data", "domain"))
assert dict(zip(mesh2d.axis_names, mesh2d.devices.shape)) == {
    "data": n_procs, "domain": 4}
# The DCN (host) dimension must be the data axis: each data row's devices
# live on one process, so domain collectives never cross hosts.
for row in range(n_procs):
    owners = {d.process_index for d in mesh2d.devices[row].ravel()}
    assert len(owners) == 1, "domain axis crosses hosts"

# ---- data-sharded batched gen + eval over a flat 8-device mesh ----
mesh = pmesh.make_multihost_mesh(axis_names=("data",))
B = 16
s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
a_lanes = blk.pack_inputs(alphas, in_bits)


def sh(a):
    # Every process holds the same global numpy array (same rng seed), so
    # each just serves the shards it owns.
    a = np.asarray(a)
    sharding = jax.NamedSharding(
        mesh, pmesh.P("data", *([None] * (a.ndim - 1))))
    return jax.make_array_from_callback(a.shape, sharding,
                                        lambda idx: a[idx])


@jax.jit
def gen_eval_step(s0s, a_lanes, betas):
    cws = jax.vmap(lambda s, a, b: _dpf.gen(prg, g, in_bits, s, a, b))(
        s0s, a_lanes, betas)
    y0 = _dpf.eval_points(prg, g, in_bits, 0, s0s[:, 0], cws, a_lanes)
    y1 = _dpf.eval_points(prg, g, in_bits, 1, s0s[:, 1], cws, a_lanes)
    return g.add(g.from_block(y0), g.from_block(y1))


rec = multihost_utils.process_allgather(
    gen_eval_step(sh(s0s), sh(a_lanes), sh(betas)), tiled=True)
exp = np.asarray(g.from_block(blk.clear_lsb(betas)))
assert np.array_equal(rec, exp), "multihost data-sharded reconstruction"

# ---- domain-sharded EvalAll spanning both processes ----
dmesh = pmesh.make_multihost_mesh(axis_names=("domain",),
                                  data_axis_hosts=False)
s01 = blk.block(rng.integers(0, 2**32, size=(2, 4)))
beta1 = blk.block(rng.integers(0, 2**32, size=(4,)))
cws1 = _dpf.gen(prg, g, in_bits, s01, blk.pack_inputs(99, in_bits), beta1)

ys = [multihost_utils.process_allgather(
    pmesh.dpf_eval_all_sharded(prg, g, in_bits, p, s01[p], cws1, dmesh,
                               axis="domain"), tiled=True)
      for p in (0, 1)]
rec1 = np.asarray(g.add(g.from_block(ys[0]), g.from_block(ys[1])))
nz = np.nonzero(rec1.any(axis=-1))[0]
assert list(nz) == [99], "multihost domain-sharded eval_all"

# Bit-exact vs the single-device path on this process alone.
local = np.asarray(_dpf.eval_all(prg, g, in_bits, 0, s01[0], cws1))
assert np.array_equal(ys[0], local), "multihost eval_all != single-device"

pathlib.Path(out_dir, f"proc{proc_id}.ok").write_text("ok")
print(f"proc {proc_id}: multihost checks OK", flush=True)
