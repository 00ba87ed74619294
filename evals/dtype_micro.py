"""VPU dtype/op-throughput microbenchmark — settles VERDICT r2 weak #3.

The reference packs 16 DP problems into 8-bit SSE lanes
(/root/reference/ksw2/ksw2_extz2_sse.c:70) because x86 offers per-element
8-bit ALUs (PADDB/PMAXSB): 16 lanes per 128-bit op.  Whether the analogous
lever exists on a TPU depends on the VPU's native rate for sub-32-bit
elementwise ops and on the cost of SWAR emulation inside int32 lanes.
This microbenchmark measures, on the real chip:

  1. the DP-core op mix (add + max + compare-select chain, the
     wavefront/MSA inner recurrence shape) at int32 / int16 / int8 /
     float32 / bfloat16 element types, in Gelem-op/s;
  2. the same mix SWAR-packed 4x8-bit into int32 lanes (packed add with
     guard-bit masking + emulated per-field max), in effective
     Gfield-op/s.

If (1) shows no rate gain below int32 and (2) shows the emulated max
eating the 4x packing factor, the lane-packing lever is a CPU-ism that
does not transfer — the kernels stay int32 and the decision is recorded
with numbers rather than assertion.

Usage: python evals/dtype_micro.py   (prints one line per variant)
"""

from __future__ import annotations

import time

import numpy as np


def _bench(fn, args, n_iter=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main() -> int:
    import jax
    import jax.numpy as jnp

    B, L = 512, 1024          # (sublane-rich, lane-aligned) working set
    CHAIN = 64                # recurrence steps per kernel call
    rng = np.random.default_rng(0)

    print(f"# backend={jax.default_backend()} shape=({B},{L}) chain={CHAIN}")

    # --- 1. native dtype ladder: x = max(x + a, y); y = select(x > y, x, y)
    for dt in (jnp.int32, jnp.int16, jnp.int8, jnp.float32, jnp.bfloat16):
        if dt in (jnp.float32, jnp.bfloat16):
            a = jnp.asarray(rng.integers(-3, 4, (B, L)), dt)
            x = jnp.asarray(rng.integers(0, 8, (B, L)), dt)
            y = jnp.asarray(rng.integers(0, 8, (B, L)), dt)
        else:
            a = jnp.asarray(rng.integers(-3, 4, (B, L)).astype(np.int32), dt)
            x = jnp.asarray(rng.integers(0, 8, (B, L)).astype(np.int32), dt)
            y = jnp.asarray(rng.integers(0, 8, (B, L)).astype(np.int32), dt)

        @jax.jit
        def step(x, y, a):
            for _ in range(CHAIN):
                x = jnp.maximum(x + a, y)
                y = jnp.where(x > y, x - a, y)
            return x, y

        dt_s = _bench(step, (x, y, a))
        # 3 elementwise ops per chain step per element
        gops = B * L * CHAIN * 3 / dt_s / 1e9
        print(f"native {jnp.dtype(dt).name:9s} {gops:8.1f} Gelem-op/s "
              f"({dt_s * 1e3:.3f} ms/call)")

    # --- 2. SWAR 4x8-bit in int32: packed add (guard-bit mask) + emulated max
    H = jnp.int32(np.int32(np.uint32(0x80808080)))   # field msbs
    M7 = jnp.int32(0x7F7F7F7F)

    def pmax(a, b):
        # per-field unsigned max via borrow detection (guard-bit SWAR):
        # msb of each field in d flags a_field >= b_field
        d = ((a | H) - (b & M7)) & H
        sel = (d >> 7) * jnp.int32(0xFF) & jnp.int32(-1)  # field mask
        return (a & sel) | (b & ~sel)

    def padd(a, b):
        # fields are kept in [0, 127]: mask guard bits, add, restore
        return ((a & M7) + (b & M7)) & M7 | ((a ^ b) & H)

    xp = jnp.asarray(
        rng.integers(0, 100, (B, L), dtype=np.int32)
        | (rng.integers(0, 100, (B, L), dtype=np.int32) << 8)
        | (rng.integers(0, 100, (B, L), dtype=np.int32) << 16)
        | (rng.integers(0, 100, (B, L), dtype=np.int32) << 24))
    yp = jnp.asarray(
        rng.integers(0, 100, (B, L), dtype=np.int32)
        | (rng.integers(0, 100, (B, L), dtype=np.int32) << 8))
    ap = jnp.asarray(
        rng.integers(0, 4, (B, L), dtype=np.int32)
        | (rng.integers(0, 4, (B, L), dtype=np.int32) << 16))

    @jax.jit
    def swar_step(x, y, a):
        for _ in range(CHAIN):
            x = pmax(padd(x, a), y)
            y = pmax(x, y)
        return x, y

    dt_s = _bench(swar_step, (xp, yp, ap))
    # per chain step: 2 field-ops (add+max, max) x 4 fields per element
    gfops = B * L * CHAIN * 3 * 4 / dt_s / 1e9
    print(f"swar   4x8-in-32 {gfops:8.1f} Gfield-op/s "
          f"({dt_s * 1e3:.3f} ms/call; raw int32 ops ~{23 * CHAIN} /elem)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
