"""Multi-device scaling-efficiency measurement (BASELINE.md target 3:
">= 85% linear scaling of keys-evaluated/s from 1 chip -> 1 host -> N
hosts"). The reference has no analog (it is single-process, SURVEY
§2.7); this measures OUR mesh-parallel paths.

Two axes, mirroring the deployment layout (parallel/mesh.py
make_multihost_mesh):

- data axis:   a batch of per-instance DPF keys, each evaluated at one
               point, sharded on the leading batch axis (embarrassingly
               parallel — the axis that crosses hosts/DCN).
- domain axis: one key's full-domain EvalAll (2^in_bits leaves) sharded
               over subtrees (the axis with real collectives — subtree
               root broadcast + leaf all_gather — that must ride ICI).

Modes:

- CPU virtual mesh (default): n in {1, 2, 4, 8} virtual devices via
  ``xla_force_host_platform_device_count``, one fresh subprocess per n
  (the flag is fixed at process start). All virtual devices share this
  VM's single physical core, so wall time CANNOT drop with n; what the
  proxy measures is SHARDING OVERHEAD: efficiency_proxy = t_1 / t_n
  (1.0 = the sharded program does no extra work; a drop = collective /
  partitioning overhead that WOULD eat into real-pod scaling). This
  validates the measurement protocol and catches collective-overhead
  regressions in CI without TPU-pod hardware.
- ``--tpu-pod``: the same steps on the real device set (run under
  ``jax.distributed`` on every host of a pod slice). There
  efficiency = throughput_n / (n * throughput_1) — the true
  BASELINE.md figure. Single-chip environments (this one) can only run
  n=1, which still yields the t_1 anchor for a later pod run.

Writes scripts/artifacts/scaling_cpu.json (or scaling_tpu.json) and
prints one JSON summary line to stdout.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "scripts", "artifacts")

# Small-problem knob for the CI plumbing test (tests/test_scaling_bench).
SMALL = bool(int(os.environ.get("FSS_SCALING_SMALL", "0")))
DATA_LOG2_BATCH = 10 if SMALL else 14
DATA_IN_BITS = 12 if SMALL else 16
DOMAIN_IN_BITS = 12 if SMALL else 20
ITERS = 2 if SMALL else 4


def _measure(n_devices: int) -> dict:
    """Measure both axes at ``n_devices`` in THIS process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.parallel import mesh as pmesh
    from fss_tpu.prg.chacha import ChaCha
    from fss_tpu.schemes import dpf as _dpf

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    g = groups.Uint(32)
    nonce = (3, 7)
    prg = ChaCha(mul=2, nonce=nonce)
    rng = np.random.default_rng(42)

    def timeit(step, args, per_iter_items):
        chk = step(*args)
        _ = jax.block_until_ready(chk)  # compile + warm-up
        t0 = time.perf_counter()
        for _i in range(ITERS):
            chk = step(*args)
        _ = int(np.asarray(chk).ravel()[0])  # FIFO queue: one fetch
        dt = (time.perf_counter() - t0) / ITERS
        return {"time_s": dt, "per_s": per_iter_items / dt}

    out = {"n": n_devices}

    # --- data axis: B per-instance keys, one eval each ----------------
    B = 1 << DATA_LOG2_BATCH
    ib = DATA_IN_BITS
    mesh = pmesh.make_mesh(n_devices, axis_names=("data",))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**ib, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_l = blk.pack_inputs(alphas, ib)
    cws = jax.jit(jax.vmap(
        lambda s, al, be: _dpf.gen(prg, g, ib, s, al, be)))(
            jnp.asarray(s0s), a_l, jnp.asarray(betas))
    s0_sh = pmesh.shard_batch(mesh, s0s[:, 0])
    cws_sh = pmesh.shard_batch(mesh, np.asarray(cws))
    xl_sh = pmesh.shard_batch(mesh, np.asarray(a_l))

    @jax.jit
    def data_step(s0, cws, xl):
        y = _dpf.eval_points(prg, g, ib, 0, s0, cws, xl)
        return jnp.sum(y[:, 0])

    out["data_axis"] = timeit(data_step, (s0_sh, cws_sh, xl_sh), B)

    # --- domain axis: one key, full-domain EvalAll sharded -------------
    dib = DOMAIN_IN_BITS
    dmesh = pmesh.make_mesh(n_devices, axis_names=("domain",))
    s0s1 = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta1 = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws1 = jax.jit(lambda s, b: _dpf.gen(
        prg, g, dib, s, blk.pack_inputs(12345, dib), b))(s0s1, beta1)
    s0_r = pmesh.replicate(dmesh, s0s1[0])
    cws_r = pmesh.replicate(dmesh, np.asarray(cws1))

    @jax.jit
    def domain_step(s0, cws):
        ys = pmesh.dpf_eval_all_sharded(prg, g, dib, 0, s0, cws, dmesh,
                                        axis="domain")
        return jnp.sum(ys[:, 0])

    out["domain_axis"] = timeit(domain_step, (s0_r, cws_r), 1 << dib)
    return out


def _single(n: int) -> None:
    print(json.dumps(_measure(n)))


def _orchestrate(device_counts, tpu_pod: bool) -> dict:
    runs = []
    if tpu_pod:
        # Real devices: measure every requested n in THIS process (the
        # mesh just uses the first n of jax.devices(); on a multi-host
        # slice run this under jax.distributed on every host).
        import jax
        avail = len(jax.devices())
        for n in device_counts:
            if n > avail:
                print(f"scaling: skipping n={n} (only {avail} devices)",
                      file=sys.stderr)
                continue
            runs.append(_measure(n))
    else:
        for n in device_counts:
            env = dict(os.environ)
            flags = env.get("XLA_FLAGS", "")
            flags = " ".join(f for f in flags.split()
                             if "host_platform_device_count" not in f)
            env["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n}"
            ).strip()
            env["JAX_PLATFORMS"] = "cpu"
            # Persistent XLA:CPU compile cache (same one the tests use):
            # each per-n subprocess compiles its own shard shapes once.
            env.setdefault("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(REPO, ".jax_cache"))
            env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                           "0.5")
            # Keep the axon sitecustomize entry (CLAUDE.md): a scripted
            # PYTHONPATH that drops it breaks jax init in this env.
            path = env.get("PYTHONPATH", "")
            entries = [REPO] + [p for p in path.split(":") if p]
            env["PYTHONPATH"] = ":".join(dict.fromkeys(entries))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--single", str(n), "--force-cpu"],
                capture_output=True, text=True, env=env, timeout=3600)
            if r.returncode != 0:
                print(f"scaling: n={n} FAILED:\n{r.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            runs.append(json.loads(r.stdout.strip().splitlines()[-1]))

    if not runs:
        raise SystemExit("scaling: no successful runs")
    base = runs[0]
    mode = "tpu-pod" if tpu_pod else "cpu-virtual"
    result = {
        "mode": mode,
        "data_axis": {"log2_batch": DATA_LOG2_BATCH,
                      "in_bits": DATA_IN_BITS, "unit": "evals/s"},
        "domain_axis": {"in_bits": DOMAIN_IN_BITS, "unit": "items/s"},
    }
    for axis in ("data_axis", "domain_axis"):
        rows = {}
        for r in runs:
            m = r[axis]
            n = r["n"]
            if tpu_pod:
                # True linear-scaling efficiency vs the n=1 anchor.
                eff = m["per_s"] / (n * base[axis]["per_s"])
            else:
                # Single-core proxy: sharding/collective overhead only.
                eff = base[axis]["time_s"] / m["time_s"]
            rows[str(n)] = {"time_s": round(m["time_s"], 6),
                            "per_s": round(m["per_s"], 1),
                            "efficiency_vs_1": round(eff, 4)}
        result[axis]["runs"] = rows
    return result


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma-separated device counts")
    ap.add_argument("--single", type=int, default=None,
                    help=argparse.SUPPRESS)  # internal per-n subprocess
    ap.add_argument("--force-cpu", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--tpu-pod", action="store_true",
                    help="measure on the real device set (true scaling)")
    ap.add_argument("--out", default=None, help="artifact JSON path")
    args = ap.parse_args()

    if args.force_cpu:
        # The axon plugin overrides JAX_PLATFORMS at interpreter start;
        # the config update is the reliable override (CLAUDE.md).
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.single is not None:
        _single(args.single)
        return

    counts = [int(x) for x in args.devices.split(",")]
    result = _orchestrate(counts, args.tpu_pod)
    out_path = args.out or os.path.join(
        ART, "scaling_tpu.json" if args.tpu_pod else "scaling_cpu.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
