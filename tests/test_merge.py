"""Shard-output merge tool: N sharded runs -> byte-identical to the
unsharded run (the reference's input-order output guarantee,
src/main.c:402-424, restored across shards)."""

import io

import numpy as np
import pytest

from tidehunter_tpu.params import Params
from tidehunter_tpu.pipeline import runner
from tidehunter_tpu.tools.merge import merge


def _write_reads(tmp_path, n=12, seed=3):
    rng = np.random.default_rng(seed)
    fn = tmp_path / "reads.fa"
    with open(fn, "w") as f:
        for i in range(n):
            p = int(rng.integers(40, 70))
            unit = rng.integers(0, 4, p)
            copies = int(rng.integers(3, 6))
            seq = "".join("ACGT"[c] for c in np.tile(unit, copies))
            # every third read: random (usually no tandem record at all)
            if i % 3 == 2:
                seq = "".join(
                    "ACGT"[c] for c in rng.integers(0, 4, 150)
                )
            f.write(f">read_{i}_x\n{seq}\n")
    return str(fn)


@pytest.mark.parametrize("fmt", [1, 2, 3])
def test_sharded_merge_equals_unsharded(tmp_path, fmt):
    fn = _write_reads(tmp_path)
    mtp = Params()
    mtp.out_fmt = fmt

    full = io.StringIO()
    runner.run(fn, mtp, out=full)

    shard_fns = []
    for si in range(3):
        out = tmp_path / f"out.shard{si}-of-3"
        with open(out, "w") as f:
            mtp.cons_out = f
            runner.run(fn, mtp, out=f, shard=(si, 3))
        shard_fns.append(str(out))

    merged = io.StringIO()
    merge(fn, shard_fns, fmt, merged)
    assert merged.getvalue() == full.getvalue()


def test_merge_rejects_foreign_records(tmp_path):
    fn = _write_reads(tmp_path, n=4)
    bogus = tmp_path / "bogus.out"
    bogus.write_text("not_a_read\trep0\t1.0\t1\t1\t1\t1\t1.0\t0\t1\tA\n")
    with pytest.raises(ValueError, match="absent"):
        merge(fn, [str(bogus)], 2, io.StringIO())


def test_gz_input_equals_plain(tmp_path):
    """gzipped input -> identical output (magic-byte autodetect,
    reference reads via gzread unconditionally, kseq.h)."""
    import gzip
    import io

    fn = _write_reads(tmp_path, n=6, seed=9)
    gz = tmp_path / "reads.fa.gz"
    with open(fn, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    mtp = Params()
    mtp.out_fmt = 2
    a, b = io.StringIO(), io.StringIO()
    runner.run(fn, mtp, out=a)
    runner.run(str(gz), mtp, out=b)
    assert a.getvalue() == b.getvalue()
    assert a.getvalue().count("\n") > 0
