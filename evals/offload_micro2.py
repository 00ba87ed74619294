"""Stage decomposition of the fused offload path on hardware.

Usage: python evals/offload_micro2.py [n_reads]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from bench import synth_read
    from tidehunter_tpu.io.codec import encode
    from tidehunter_tpu.ops import offload
    from tidehunter_tpu.ops.seeding_jax import (
        collect_hits_packed, pos_bits)
    from tidehunter_tpu.ops.chaining_jax import chain_dp_batch
    from tidehunter_tpu.params import Params

    mtp = Params()
    rng = np.random.default_rng(42)
    seqs = [synth_read(rng) for _ in range(n)]
    bseqs = [encode(s) for s in seqs]
    maxL = max(len(b) for b in bseqs)
    L = offload.len_bucket(maxL)
    B = max(64, -(-n // 64) * 64)
    pb = pos_bits(L)
    print(f"# platform={jax.devices()[0].platform} n={n} L={L} "
          f"maxL={maxL} pb={pb}")

    def tmin(label, fn, reps=3):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:34s} {best*1e3:9.1f} ms  ({best/n*1e3:6.3f} ms/read)")
        return out

    def force(x):
        np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(x))

    packed, lens, has_n = tmin(
        "pack 4/byte (host)", lambda: offload.pack_reads(bseqs, B, L))

    def upload():
        a = jax.device_put(packed)
        b = jax.device_put(lens)
        force(a)
        return a, b

    pk_d, lens_d = tmin(f"upload ({B*L/4/1e6:.1f}MB)", upload)

    @jax.jit
    def unpack(b, length):
        # quarter-block layout: unpack = lane concat (matches
        # offload.pack_reads; the old interleaved stack/reshape was a
        # 0.8 ms/read relayout)
        bases = jnp.concatenate(
            [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=1)
        idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        return jnp.where(idx < length[:, None], bases, jnp.uint8(4))

    def do_unpack():
        out = unpack(pk_d, lens_d)
        force(out)
        return out

    do_unpack()
    bases_d = tmin("unpack (device)", do_unpack)

    kw = dict(k=mtp.k, use_hpc=bool(mtp.hpc), min_p=mtp.min_p,
              max_p=mtp.max_p, w=mtp.w)
    seed_j = jax.jit(lambda b, l: collect_hits_packed(b, l, **kw))

    def seed():
        out = seed_j(bases_d, lens_d)
        force(out[0])
        return out

    seed()
    ph_d, n_d, fb_d = tmin("seed packed (resident)", seed)
    cnt = np.asarray(n_d)
    print(f"# hits: mean={cnt.mean():.0f} max={cnt.max()}")

    # --- seed sub-decomposition: keys / sort1 / bsearch / sort2 ---
    from tidehunter_tpu.ops.seeding_jax import _keys_valid_positions

    @jax.jit
    def s_keys(b, l):
        key, positions, valid, fb = _keys_valid_positions(
            b, l, k=mtp.k, use_hpc=bool(mtp.hpc), w=mtp.w)
        posu = positions.astype(jnp.uint32)
        pk = jnp.where(valid, (key << pb) | posu, jnp.uint32(0xFFFFFFFF))
        return pk, key, positions, valid

    def keys():
        out = s_keys(bases_d, lens_d)
        force(out[0])
        return out

    keys()
    pk_dd, key_d, pos_d, valid_d = tmin("  seed: keys+pack", keys)

    from jax import lax

    @jax.jit
    def s_sort(pk):
        (so,) = lax.sort((pk,), num_keys=1)
        return so

    def sort1():
        out = s_sort(pk_dd)
        force(out)
        return out

    sort1()
    so_d = tmin("  seed: sort L x u32", sort1)

    @jax.jit
    def s_bsearch(so, key, positions, valid):
        posu = positions.astype(jnp.uint32)
        q_ok = valid & (positions >= mtp.min_p)
        tgt = jnp.where(
            q_ok, (key << pb) | (posu - jnp.uint32(mtp.min_p)),
            jnp.uint32(0))
        cnt2 = jnp.zeros(so.shape, jnp.int32)
        step = 1 << (L - 1).bit_length()
        while step:
            cand = cnt2 + step
            v = jnp.take_along_axis(so, jnp.minimum(cand, L) - 1, axis=1)
            ok = (cand <= L) & (v <= tgt)
            cnt2 = jnp.where(ok, cand, cnt2)
            step >>= 1
        return cnt2

    def bs():
        out = s_bsearch(so_d, key_d, pos_d, valid_d)
        force(out)
        return out

    bs()
    tmin("  seed: bsearch (14 gathers)", bs)
    hit_cap = L // 2

    @jax.jit
    def prep(ph, nh):
        phc = ph[:, :hit_cap]
        ends = (phc >> pb).astype(jnp.int32)
        periods = phc.astype(jnp.int32) & ((1 << pb) - 1)
        return ends, periods, jnp.minimum(nh, hit_cap)

    ends_d, per_d, ncl_d = prep(ph_d, n_d)
    force(ends_d)

    for W in (512, 2048, hit_cap):
        chain_j = jax.jit(
            lambda e, p, c, W=W: chain_dp_batch(e, p, c, k=mtp.k, window=W))

        def chain():
            out = chain_j(ends_d, per_d, ncl_d)
            force(out[0])
            return out

        chain()
        sc_d, fr_d, fbc_d = tmin(f"chain W={W} (resident)", chain)
        nfb = int(np.asarray(fbc_d).sum())
        print(f"#   chain fallback rows: {nfb}/{n}")

    @jax.jit
    def packpull(ph, sc, fr, r):
        return ph[:, :hit_cap].astype(jnp.int32) + r, sc + r, fr + r

    def pull(rep=[0]):
        rep[0] += 1
        a, b, c = packpull(ph_d, sc_d, fr_d, jnp.int32(0 * rep[0]))
        force(a)
        t0 = time.perf_counter()
        for x in (a, b, c):
            x.copy_to_host_async()
        jax.device_get((a, b, c))
        return time.perf_counter() - t0

    pull()
    best = min(pull() for _ in range(3))
    print(f"{'pull 3 planes async':34s} {best*1e3:9.1f} ms  "
          f"({best/n*1e3:6.3f} ms/read)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
