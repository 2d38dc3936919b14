"""Profiling helpers.

The reference's observability is tooling-level: `make flamegraph` (perf),
`make profile_gpu` (nsys), `make ptx_info` (ptxas register report), and
Google-Benchmark items/s counters (Makefile:27-46, bench_gpu.cu:306
there). TPU equivalents: xprof traces via jax.profiler (view in
TensorBoard/Perfetto) and the throughput timer below, which uses the
end-of-queue checksum methodology described in docs/benchmarks.md.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/fss_tpu_trace"):
    """Capture an xprof trace around a block:

        with profile_trace("/tmp/trace"):
            run_step()
        # then: tensorboard --logdir /tmp/trace  (or open in Perfetto)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def throughput(step, args, items_per_iter: int, iters: int = 8,
               warmup: bool = True) -> float:
    """items/s of a jitted step returning a scalar checksum.

    Enqueues ``iters`` iterations and fetches only the last checksum — the
    device queue is FIFO, so this measures sustained execution without a
    host round trip per iteration (crucial behind a network TPU tunnel).
    """
    if warmup:
        chk = step(*args)
        _ = int(chk)
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = step(*args)
    _ = int(chk)
    dt = (time.perf_counter() - t0) / iters
    return items_per_iter / dt
