"""Device-resident profile-POA (ops/msa_device.py) vs host oracle.

The DP/backtrack kernels are TPU Pallas kernels; this test only runs when a
real TPU backend is present (tests force JAX_PLATFORMS=cpu, so it is skipped
in the CPU suite — run with JAX_PLATFORMS= to exercise it on hardware).
Bit-exactness contract: ops/poa_profile.profile_consensus (consensus bases
AND coverage; coverage feeds the -r filter and FASTQ quals, reference
src/abpoa_cons.c:92-107).
"""

import numpy as np
import pytest


def _tpu_available():
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(
    not _tpu_available(), reason="requires a TPU backend"
)


def _mutate(rng, u, err):
    out = []
    for c in u:
        r = rng.random()
        if r < err / 3:
            continue
        elif r < 2 * err / 3:
            out.extend([rng.integers(0, 4), c])
        elif r < err:
            out.append(rng.integers(0, 4))
        else:
            out.append(c)
    return np.array(out, np.uint8)


def _regions(seed=7, n_regions=40):
    # unit lengths span exactly two T buckets (128 and 384): every extra
    # bucket costs ~1 min of Mosaic kernel compilation on this platform
    rng = np.random.default_rng(seed)
    regions = []
    for _ in range(n_regions):
        L = int(rng.integers(20, 250))
        unit = rng.integers(0, 4, L).astype(np.uint8)
        n = int(rng.integers(3, 12))
        regions.append([_mutate(rng, unit, 0.12) for _ in range(n)])
    return regions


def test_device_msa_bit_exact_vs_host():
    from tidehunter_tpu.ops.msa_device import DeviceMSA
    from tidehunter_tpu.ops.poa_profile import banded_profile_consensus

    regions = _regions()
    msa = DeviceMSA(2, 4, 4, 2)
    dev = msa.consensus_batch(regions)
    for ri, r in enumerate(dev):
        hb, hcov = banded_profile_consensus(regions[ri], 2, 4, 4, 2)
        assert r is not None, f"region {ri} unexpectedly fell back"
        cb, cov = r
        assert np.array_equal(cb, hb), f"region {ri} bases differ"
        assert np.array_equal(cov, hcov), f"region {ri} coverage differs"


def test_device_msa_polish_bit_exact_vs_host():
    from tidehunter_tpu.ops.msa_device import DeviceMSA
    from tidehunter_tpu.ops.poa_profile import banded_profile_consensus

    regions = _regions(seed=11, n_regions=20)
    msa = DeviceMSA(2, 4, 4, 2, polish=1)
    dev = msa.consensus_batch(regions)
    for ri, r in enumerate(dev):
        hb, hcov = banded_profile_consensus(
            regions[ri], 2, 4, 4, 2, polish=1)
        assert r is not None, f"region {ri} unexpectedly fell back"
        cb, cov = r
        assert np.array_equal(cb, hb), f"region {ri} polished bases differ"
        assert np.array_equal(cov, hcov), f"region {ri} coverage differs"


def test_device_msa_banded_bucket_hardware():
    """Banded (>=1024) buckets on the chip vs the banded host mirror —
    incl. the sliding window, the convex gap model, and a band-touching
    region retried through the full kernels."""
    from tidehunter_tpu.ops.msa_device import DeviceMSA
    from tidehunter_tpu.ops.poa_profile import banded_profile_consensus

    rng = np.random.default_rng(31)
    regions = []
    for i in range(6):
        p = int(rng.integers(900, 1600))
        unit = rng.integers(0, 4, p)
        us = []
        for _ in range(4):
            u = list(np.where(rng.random(p) < 0.08,
                              rng.integers(0, 4, p), unit))
            if i == 0 and len(us) == 1:
                del u[100:420]  # force a band touch -> full retry
            us.append(np.array(u, np.uint8))
        regions.append(us)
    dm = DeviceMSA(2, 4, 4, 2, gap_open2=24, gap_ext2=1)
    got = dm.consensus_batch(regions)
    for reg, r in zip(regions, got):
        want = banded_profile_consensus(reg, 2, 4, 4, 2,
                                        gap_open2=24, gap_ext2=1)
        assert r is not None
        np.testing.assert_array_equal(r[0], want[0])
        np.testing.assert_array_equal(r[1], want[1])
