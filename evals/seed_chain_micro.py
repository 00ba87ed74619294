"""Micro-profile of the device seed+chain path on real hardware.

Decomposes evals/hw_r04/ab_offload_and_chunk.log config C's device_seed
(4.7 ms/read) and device_chain (2.2 ms/read) into:
  encode+pad (host) / upload / seed compute / hits pull / chain compute /
  score+from pull
so round-5 optimization targets the measured cost, not a guess.

Timing discipline (the axon tunnel makes this subtle):
  * compute timings force completion with a 1-element pull of the result
    (block_until_ready alone proved unreliable over the tunnel);
  * pull timings regenerate a FRESH jax.Array each rep — jax caches the
    host copy per Array object, so re-pulling the same object is free.

Usage:  python evals/seed_chain_micro.py [n_reads]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from bench import synth_read
    from tidehunter_tpu.io.codec import encode
    from tidehunter_tpu.ops.seeding_jax import collect_hits_batch
    from tidehunter_tpu.ops.chaining_jax import chain_dp_batch
    from tidehunter_tpu.params import Params

    mtp = Params()
    rng = np.random.default_rng(42)
    seqs = [synth_read(rng) for _ in range(n_reads)]
    print(f"# platform={jax.devices()[0].platform} n={n_reads}")

    def report(label, best):
        print(f"{label:30s} {best*1e3:9.1f} ms  ({best/n_reads*1e3:6.3f} ms/read)")

    def tmin(label, fn, reps=3):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        report(label, best)
        return out

    def force(x):
        """Force completion + round trip of a tiny slice."""
        np.asarray(jax.jit(lambda a: a[:1, :1])(x))

    # --- stage 1: host encode + pad (mirrors engine._device_seed) ---
    g = 64
    B = max(g, -(-n_reads // g) * g)
    maxL = max(len(s) for s in seqs)
    L = 1024
    while L < maxL:
        L *= 2
    print(f"# B={B} L={L} maxL={maxL} (pad waste {1-maxL/L:.0%})")

    def encode_pad():
        batch = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seqs):
            b = encode(s)
            batch[i, : len(b)] = b
            lens[i] = len(b)
        return batch, lens

    batch, lens = tmin("encode+pad (host)", encode_pad)

    # --- stage 2: upload ---
    def upload():
        a = jax.device_put(batch)
        l = jax.device_put(lens)
        force(a)
        return a, l

    dbatch, dlens = tmin(f"upload bseq ({B*L/1e6:.0f}MB)", upload)

    # --- stage 3: seed compute (inputs resident, forced) ---
    kw = dict(k=mtp.k, use_hpc=bool(mtp.hpc), min_p=mtp.min_p,
              max_p=mtp.max_p, w=mtp.w)

    def seed():
        out = collect_hits_batch(dbatch, dlens, **kw)
        force(out[0])
        return out

    seed()  # compile
    ends_d, periods_d, cnt_d, fb_d = tmin("seed compute (resident)", seed)

    cnt = np.asarray(cnt_d)
    print(f"# hits: mean={cnt.mean():.0f} max={cnt.max()}")

    max_hits = int(cnt.max())
    Lh = 512
    while Lh < max_hits:
        Lh *= 2

    # --- stage 4: pulls (fresh array per rep) ---
    @jax.jit
    def fresh_full(e, p, s):
        return e + s, p + s  # s varies -> new arrays, no host-copy cache

    def pull_full(rep=[0]):
        rep[0] += 1
        e, p = fresh_full(ends_d, periods_d, jnp.int32(rep[0] * 0))
        force(e)
        t0 = time.perf_counter()
        a, b = np.asarray(e), np.asarray(p)
        return time.perf_counter() - t0

    pull_full()
    report(f"pull hits full [B,{L}] i32 x2",
           min(pull_full() for _ in range(3)))

    @jax.jit
    def trunc16(e, p):
        return (e[:, :Lh].astype(jnp.int16), p[:, :Lh].astype(jnp.int16))

    def pull_trunc():
        e16, p16 = trunc16(ends_d + 0, periods_d)
        force(e16)
        t0 = time.perf_counter()
        np.asarray(e16), np.asarray(p16)
        return time.perf_counter() - t0

    pull_trunc()
    report(f"pull hits [B,{Lh}] i16 x2", min(pull_trunc() for _ in range(3)))

    # --- stage 5: chain compute (forced) ---
    def chain():
        out = chain_dp_batch(
            ends_d[:, :Lh], periods_d[:, :Lh], jnp.minimum(cnt_d, Lh),
            k=mtp.k, window=Lh)
        force(out[0])
        return out

    chain()
    score_d, from_d, fbc_d = tmin(f"chain compute W={Lh} (forced)", chain)

    # --- stage 6: pull score/from ---
    def pull_chain():
        s, f = fresh_full(score_d, from_d, jnp.int32(0))
        force(s)
        t0 = time.perf_counter()
        np.asarray(s), np.asarray(f)
        return time.perf_counter() - t0

    pull_chain()
    report(f"pull score+from [B,{Lh}] i32 x2",
           min(pull_chain() for _ in range(3)))

    @jax.jit
    def pack16(s, f):
        return s.astype(jnp.int16), f.astype(jnp.int16)

    def pull_chain16():
        s, f = pack16(score_d + 0, from_d)
        force(s)
        t0 = time.perf_counter()
        np.asarray(s), np.asarray(f)
        return time.perf_counter() - t0

    pull_chain16()
    report("pull score+from i16 x2", min(pull_chain16() for _ in range(3)))

    # --- raw tunnel bandwidth reference (fresh buffers) ---
    @jax.jit
    def mk(x):
        return jnp.zeros((16 << 20) // 4, jnp.int32) + x

    def pull_probe(rep=[0]):
        rep[0] += 1
        a = mk(jnp.int32(rep[0]))
        force(a.reshape(1, -1))
        t0 = time.perf_counter()
        np.asarray(a)
        return time.perf_counter() - t0

    pull_probe()
    dt = min(pull_probe() for _ in range(3))
    print(f"# tunnel pull bw: {64 / dt:.1f} MB/s (64MB probe)")
    up = np.zeros((16 << 20), np.uint8)
    t0 = time.perf_counter()
    a = jax.device_put(up)
    force(a.reshape(1, -1))
    print(f"# tunnel push bw: {16 / (time.perf_counter()-t0):.1f} MB/s (16MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
