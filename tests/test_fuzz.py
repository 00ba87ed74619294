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


def _adapter_read(rng, five, three_rc, tandem: bool):
    """Read whose repeat unit (or single copy, tandem=False) embeds the
    adapters — the R2C2 shape the full-length logic targets (reference
    src/gen_cons.c:227-291 doubled-consensus search, src/gen_cons.c:89-171
    single-copy path)."""
    def _mut(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.02:
                continue
            if r < 0.04:
                out.append("ACGT"[rng.integers(0, 4)])
            out.append(ch)
        return "".join(out)

    insert = decode(rng.integers(0, 4, int(rng.integers(60, 200))
                                 ).astype(np.uint8))
    unit = five + insert + three_rc
    copies = int(rng.integers(3, 6)) if tandem else 1
    flank = decode(rng.integers(0, 4, int(rng.integers(10, 60))
                                ).astype(np.uint8))
    body = "".join(_mut(unit) for _ in range(copies))
    return flank + body + flank[::-1]


@pytest.mark.parametrize(
    "seed,fmt,extra",
    [
        (11, 2, {}),
        (12, 3, {"only_full_length": True}),
        (13, 1, {"only_full_length": True, "single_copy": True}),
        (14, 2, {"only_longest": True}),
    ],
)
def test_engine_matches_oracle_adapter_fuzz(seed, fmt, extra, tmp_path):
    """Adapter / full-length / single-copy flag family through the BATCHED
    engine (its Myers 'hws' device rounds) vs the host oracle."""
    from tidehunter_tpu.pipeline.runner import load_adapters

    rng = np.random.default_rng(seed)
    five = decode(rng.integers(0, 4, 24).astype(np.uint8))
    three = decode(rng.integers(0, 4, 22).astype(np.uint8))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    three_rc = "".join(comp[c] for c in reversed(three))

    (tmp_path / "5p.fa").write_text(f">5p\n{five}\n")
    (tmp_path / "3p.fa").write_text(f">3p\n{three}\n")
    mtp = Params()
    mtp.out_fmt = fmt
    mtp.five_fn = str(tmp_path / "5p.fa")
    mtp.three_fn = str(tmp_path / "3p.fa")
    for k, v in extra.items():
        setattr(mtp, k, v)
    load_adapters(mtp)

    reads = [
        FastxRecord(
            name=f"a{i}", comment="",
            seq=_adapter_read(rng, five, three_rc,
                              tandem=not (mtp.single_copy and i % 2)),
        )
        for i in range(10)
    ] + [  # adapter-free controls: full-length must NOT fire
        FastxRecord(name=f"c{i}", comment="", seq=_random_read(rng))
        for i in range(4)
    ]
    eng = Engine(mtp, platform="cpu")
    got = _serialize(reads, eng.process_chunk(reads, mtp), mtp)
    want = _serialize(
        reads, [tidehunter_core(r.seq, mtp) for r in reads], mtp
    )
    assert got == want
    if not extra.get("only_full_length"):
        assert got  # the tandem+adapter reads must yield records


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
