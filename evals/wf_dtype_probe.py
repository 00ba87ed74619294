"""Mosaic-level dtype probe for the wavefront row loop.

evals/dtype_micro.py measured XLA elementwise chains at int16 ~3.5x the
int32 element rate; this probe checks whether that transfers INSIDE a
Pallas kernel with the wavefront's actual row structure (rolls, iota
masks, selects, double-buffered scratch) before committing to a
narrow-dtype kernel rewrite.

Runs a _dp_row-shaped loop (same op mix: 2 rolls, compares, selects,
adds, clamps) over a [BT, T] tile for NR*K rows at int32 / int16 / int8
and prints rows/s and cell rates.

Usage: python evals/wf_dtype_probe.py [T] [BT]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    BT = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 4
    n_rows = 2 * T - 1
    NR = (n_rows + K - 1) // K
    print(f"# platform={jax.devices()[0].platform} T={T} BT={BT} "
          f"rows={NR * K}")

    def make_kernel(dt, iota_dt):
        def kernel(tb_ref, out_ref, u_ref, v_ref, x_ref, y_ref):
            rk = pl.program_id(0)
            ti = jax.lax.broadcasted_iota(iota_dt, (BT, T), 1)

            @pl.when(rk == 0)
            def _init():
                for ref in (u_ref, v_ref, x_ref, y_ref):
                    ref[:] = jnp.zeros((BT, T), dt)
                out_ref[:] = jnp.zeros((BT, T), dt)

            tb = tb_ref[:]
            for kk in range(K):
                r = (rk * K + kk).astype(iota_dt)
                u_p = u_ref[:]
                v_p = v_ref[:]
                x_p = x_ref[:]
                y_p = y_ref[:]
                is_r = ti == r
                qb = jnp.where(is_r, tb, pltpu.roll(u_p, 1, 1) & dt(3))
                s = jnp.where(qb == tb, dt(1), dt(-2))
                y_b = jnp.where(is_r, dt(0), y_p)
                u_b = jnp.where(is_r, dt(2), u_p)
                x_sh = jnp.where(ti == 0, dt(0), pltpu.roll(x_p, 1, 1))
                v_sh = jnp.where(ti == 0, dt(2), pltpu.roll(v_p, 1, 1))
                a = x_sh + v_sh
                b = y_b + u_b
                z = s + dt(6)
                d = (a > z).astype(dt)
                z = jnp.maximum(z, a)
                d = jnp.where(b > z, dt(2), d)
                z = jnp.maximum(z, b)
                z = jnp.minimum(z, dt(7))
                u_new = z - v_sh
                v_new = z - u_b
                a2 = a - (z - dt(2))
                b2 = b - (z - dt(2))
                mask = is_r | (ti < r)
                u_ref[:] = jnp.where(mask, u_new, u_p)
                v_ref[:] = jnp.where(mask, v_new, v_p)
                x_ref[:] = jnp.where(mask, jnp.maximum(a2, dt(0)), x_p)
                y_ref[:] = jnp.where(mask, jnp.maximum(b2, dt(0)), y_p)
                out_ref[:] = out_ref[:] + d + u_new

        return kernel

    tiny = jax.jit(lambda a: a.reshape(-1)[:1].astype(jnp.int32) * 0)

    def force(x):
        # block_until_ready is unreliable over the axon tunnel (see
        # evals/seed_chain_micro.py); force with a 1-element pull
        np.asarray(tiny(x))

    results = {}
    for name, dt, iota_dt in (
        ("int32", jnp.int32, jnp.int32),
        ("int16", jnp.int16, jnp.int16),
        ("int16/i32iota", jnp.int16, jnp.int32),
        ("int8/i32iota", jnp.int8, jnp.int32),
    ):
        try:
            kern = make_kernel(dt, iota_dt)
            tb = np.random.default_rng(0).integers(
                0, 4, (BT, T)).astype(dt)

            CHAIN = 8  # chained calls so kernel time dwarfs the tunnel's
            # fixed per-dispatch cost (~50-450 ms depending on epoch)

            @jax.jit
            def run(tbv):
                def call(x):
                    return pl.pallas_call(
                        kern,
                        grid=(NR,),
                        in_specs=[pl.BlockSpec(
                            (BT, T), lambda r: (0, 0),
                            memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec(
                            (BT, T), lambda r: (0, 0),
                            memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((BT, T), dt),
                        scratch_shapes=[pltpu.VMEM((BT, T), dt)
                                        for _ in range(4)],
                    )(x)

                x = tbv
                for _ in range(CHAIN):
                    x = call(x) & 3  # data dependency chains the calls
                return x

            force(run(tb))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                force(run(tb))
                best = min(best, time.perf_counter() - t0)
            best /= CHAIN
            cells = BT * T * NR * K
            results[name] = best
            print(f"{name:14s}: {best * 1e3:8.3f} ms/call  "
                  f"{cells / best / 1e9:7.2f} Gcell/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
    for k in results:
        if k != "int32" and "int32" in results:
            print(f"# {k} speedup vs int32: "
                  f"{results['int32'] / results[k]:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
