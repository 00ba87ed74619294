"""Fused device seed+chain offload (ops/offload.py) vs the host oracles.

The packed-key seeder must be bit-exact with ops/seeding.py wherever its
static envelope admits it (packed_ok), and device_seed_chain must hand
back hits and chains identical to the host seeder + native chainer —
including the reroute rows (N-containing reads, w>1 fallbacks, chain
window escalations).
"""

import numpy as np
import pytest

from tidehunter_tpu.ops import offload
from tidehunter_tpu.ops.chaining_native import tandem_chain_native
from tidehunter_tpu.ops.seeding import collect_tandem_repeat_hits
from tidehunter_tpu.ops.seeding_jax import (
    collect_hits_packed,
    packed_ok,
    pos_bits,
)
from tidehunter_tpu.params import Params


def _random_reads(rng, n, max_len, n_frac=0.02):
    reads = []
    for _ in range(n):
        L = int(rng.integers(5, max_len))
        if L > 60 and rng.random() < 0.7:
            p = int(rng.integers(20, max(21, L // 3)))
            unit = rng.integers(0, 4, p)
            seq = np.tile(unit, L // p + 1)[:L]
            err = rng.random(L) < 0.1
            seq = np.where(err, rng.integers(0, 4, L), seq)
        else:
            seq = rng.integers(0, 4, L)
        ns = rng.random(L) < n_frac
        reads.append(np.where(ns, 4, seq).astype(np.uint8))
    return reads


@pytest.mark.parametrize("k,w,hpc,min_p,max_p", [
    (8, 1, False, 30, 10000),
    (8, 1, True, 30, 10000),
    (5, 1, False, 2, 50),
    (8, 5, False, 30, 10000),
    (8, 2, True, 30, 10000),
])
def test_packed_seeder_matches_oracle(k, w, hpc, min_p, max_p):
    import jax.numpy as jnp

    rng = np.random.default_rng(k * 991 + w)
    reads = _random_reads(rng, 20, 600, n_frac=0.0)
    reads += [np.zeros(3, np.uint8), np.full(90, 3, np.uint8)]
    B = len(reads)
    L = 1024
    assert packed_ok(k, L)
    pb = pos_bits(L)
    batch = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        batch[i, : len(r)] = r
        lens[i] = len(r)
    ph, n, fb = collect_hits_packed(
        jnp.asarray(batch), jnp.asarray(lens),
        k=k, use_hpc=hpc, min_p=min_p, max_p=max_p, w=w)
    ph, n, fb = np.asarray(ph), np.asarray(n), np.asarray(fb)
    for i, r in enumerate(reads):
        we, wp = collect_tandem_repeat_hits(r, k, w, hpc, min_p, max_p)
        if fb[i]:
            continue  # caller reroutes; no claim on the row
        row = ph[i, : n[i]].astype(np.int64)
        np.testing.assert_array_equal(row >> pb, we, err_msg=f"read {i}")
        np.testing.assert_array_equal(
            row & ((1 << pb) - 1), wp, err_msg=f"read {i}")


def test_len_bucket_ladder():
    assert offload.len_bucket(1) == 1024
    assert offload.len_bucket(1024) == 1024
    assert offload.len_bucket(1025) == 1536
    assert offload.len_bucket(4395) == 6144
    assert offload.len_bucket(8193) == 12288


@pytest.mark.parametrize("chain_mode", ["host", "device"])
def test_device_seed_chain_matches_host(chain_mode):
    mtp = Params()
    rng = np.random.default_rng(7)
    reads = _random_reads(rng, 24, 900, n_frac=0.01)
    reads += [np.full(120, 4, np.uint8), np.zeros(4, np.uint8)]
    bseqs = [r if len(r) >= mtp.k else None for r in reads]
    hits, chains = offload.device_seed_chain(
        bseqs, mtp, chain_mode=chain_mode)
    for i, r in enumerate(reads):
        if bseqs[i] is None:
            assert chains[i] == (None, [])
            continue
        we, wp = collect_tandem_repeat_hits(
            r, mtp.k, mtp.w, mtp.hpc, mtp.min_p, mtp.max_p)
        np.testing.assert_array_equal(hits[i][0], we, err_msg=f"read {i}")
        np.testing.assert_array_equal(hits[i][1], wp, err_msg=f"read {i}")
        wdp, wch = tandem_chain_native(we, wp, mtp.k)
        gc_entry = chains[i]
        if gc_entry is None:
            # None = caller runs the host chainer on the hits (the hybrid
            # default for every row; reroute rows in device mode).  The
            # hits were already verified identical above, so the caller's
            # chain equals the oracle's by construction.
            continue
        gdp, gch = gc_entry
        assert len(gch) == len(wch), f"read {i}"
        for gc, wc in zip(gch, wch):
            np.testing.assert_array_equal(gc.cells, wc.cells)
            assert (gc.est_period, gc.est_start, gc.est_ch_i) == (
                wc.est_period, wc.est_start, wc.est_ch_i)


def test_supported_gate():
    # k=8 fits at any ladder length up to 32k reads
    assert offload.supported(8, 4400)
    assert offload.supported(8, 30000)
    # k=16 blows the packed budget (32 key bits + positions)
    assert not offload.supported(16, 4400)
