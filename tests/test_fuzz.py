"""Randomized engine-vs-oracle equality fuzz.

The batched device engine (tidehunter_tpu/engine.py) must produce exactly
the records of the sequential host oracle (pipeline/core.tidehunter_core)
for any input — same batching-invariance guarantee the reference gets
from per-read independence (reference src/main.c:273-291). Fuzzes random
tandem-ish reads across output formats and parameter variations on the
CPU kernel path.
"""

import io

import numpy as np
import pytest

from tidehunter_tpu.engine import Engine
from tidehunter_tpu.io.codec import decode
from tidehunter_tpu.io.fastx import FastxRecord
from tidehunter_tpu.io.output import write_read_output
from tidehunter_tpu.params import Params
from tidehunter_tpu.pipeline.core import tidehunter_core


def _random_read(rng):
    kind = rng.integers(0, 4)
    if kind == 0:   # pure random (usually no TR)
        return decode(rng.integers(0, 4, int(rng.integers(50, 800))
                                   ).astype(np.uint8))
    unit_len = int(rng.integers(30, 300))
    copies = int(rng.integers(2, 8))
    err = float(rng.choice([0.0, 0.05, 0.15]))
    unit = rng.integers(0, 4, unit_len).astype(np.uint8)
    parts = [rng.integers(0, 4, int(rng.integers(0, 80))).astype(np.uint8)]
    for _ in range(copies):
        out = []
        for c in unit:
            r = rng.random()
            if r < err / 3:
                continue
            elif r < 2 * err / 3:
                out.extend([int(rng.integers(0, 4)), int(c)])
            elif r < err:
                out.append(int(rng.integers(0, 4)))
            else:
                out.append(int(c))
        parts.append(np.array(out, np.uint8))
    parts.append(rng.integers(0, 4, int(rng.integers(0, 80))).astype(np.uint8))
    return decode(np.concatenate(parts))


def _serialize(reads, results, mtp):
    buf = io.StringIO()
    for rec, res in zip(reads, results):
        write_read_output(buf, rec.name, rec.seq, res, mtp)
    return buf.getvalue()


@pytest.mark.parametrize(
    "seed,fmt,extra",
    [
        (1, 2, {}),
        (2, 3, {}),
        (3, 1, {"min_copy": 3}),
        (4, 2, {"only_unit": True}),
        (5, 4, {"min_frac": 0.6}),
    ],
)
def test_engine_matches_oracle_fuzz(seed, fmt, extra):
    rng = np.random.default_rng(seed)
    mtp = Params()
    mtp.out_fmt = fmt
    for k, v in extra.items():
        setattr(mtp, k, v)
    reads = [
        FastxRecord(name=f"f{i}", comment="", seq=_random_read(rng))
        for i in range(12)
    ]
    eng = Engine(mtp, platform="cpu")
    got = _serialize(reads, eng.process_chunk(reads, mtp), mtp)
    want = _serialize(
        reads, [tidehunter_core(r.seq, mtp) for r in reads], mtp
    )
    assert got == want
