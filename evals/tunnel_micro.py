"""Tunnel transfer micro-benchmark: push/pull fixed cost + bandwidth.

The axon tunnel is the engine's host<->device boundary; every batching
decision (pack vs split, planes-per-pull) keys off these numbers.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# platform={dev.platform}")

    tiny = jax.jit(lambda a: a.reshape(-1)[:1] * 0)

    def force(x):
        np.asarray(tiny(x))

    def t_push(label, arr, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            a = jax.device_put(arr)
            force(a)
            best = min(best, time.perf_counter() - t0)
            del a
        mb = arr.nbytes / 1e6
        print(f"push {label:32s} {best*1e3:8.1f} ms  {mb/best:7.1f} MB/s")

    def t_push_jitarg(label, arr, reps=3):
        f = jax.jit(lambda a: a + 1 if arr.dtype != np.uint8 else a ^ 1)
        f(arr)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force(f(arr))
            best = min(best, time.perf_counter() - t0)
        mb = arr.nbytes / 1e6
        print(f"push {label:32s} {best*1e3:8.1f} ms  {mb/best:7.1f} MB/s (jit arg)")

    # round-trip floor
    z = np.zeros(8, np.int32)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        force(jax.device_put(z))
        best = min(best, time.perf_counter() - t0)
    print(f"# round-trip floor (32B push+force): {best*1e3:.1f} ms")

    for mb, dtype in [(1, np.uint8), (4, np.uint8), (16, np.uint8),
                      (4, np.int32), (16, np.int32)]:
        n = mb << 20
        arr = np.random.default_rng(0).integers(
            0, 100, n // np.dtype(dtype).itemsize).astype(dtype)
        t_push(f"{mb}MB {np.dtype(dtype).name} flat", arr)
    arr2d = np.random.default_rng(0).integers(0, 5, (512, 8192)).astype(np.uint8)
    t_push("4MB uint8 [512,8192]", arr2d)
    t_push_jitarg("4MB uint8 [512,8192]", arr2d)
    # zeros (compressible?)
    t_push("16MB uint8 zeros", np.zeros(16 << 20, np.uint8))

    # pulls: fresh array each rep
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen(x, n):
        return (jnp.arange(n, dtype=jnp.int32) + x).astype(jnp.int32)

    def t_pull(label, n, reps=3):
        best = float("inf")
        for r in range(reps):
            a = gen(jnp.int32(r), n=n)
            force(a)
            t0 = time.perf_counter()
            np.asarray(a)
            best = min(best, time.perf_counter() - t0)
        mb = n * 4 / 1e6
        print(f"pull {label:32s} {best*1e3:8.1f} ms  {mb/best:7.1f} MB/s")

    for mb in (1, 4, 16, 64):
        t_pull(f"{mb}MB int32 flat", (mb << 20) // 4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
