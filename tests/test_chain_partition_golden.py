"""Golden chain/partition parity vs the reference's own code.

Expected values were produced by compiling the reference's tandem_hit.c /
tandem_chain.c / partition.c / ksw2 / edlib into a dump harness and running
it on test_data (the abPOA submodule is empty so the full reference binary
cannot be built; these stages do not use abPOA). Hits, chain cells, chain
representatives and partition positions here are therefore bit-identical
targets against the actual v1.5.5 code.

Note: the README's pinned full_length record (README.md:230-233) reflects an
OLDER TideHunter: the current code (set_start_period, tandem_chain.c:251-255)
anchors at est_start=37, not 205.
"""

import numpy as np
import pytest

from tidehunter_tpu.io.codec import encode
from tidehunter_tpu.io.fastx import read_fastx
from tidehunter_tpu.ops.chaining import tandem_chain
from tidehunter_tpu.ops.partition import partition_positions
from tidehunter_tpu.ops.seeding import collect_tandem_repeat_hits


def run(path):
    rec = next(read_fastx(str(path)))
    bseq = encode(rec.seq)
    ends, periods = collect_tandem_repeat_hits(bseq, 8, 1, False, 30, 10000)
    dp, chains = tandem_chain(ends, periods, 8)
    out = []
    for ch in chains:
        par = partition_positions(bseq, len(bseq), dp, ch, 8, 0.25)
        out.append(
            (len(ch.cells), ch.est_period, ch.est_start, par)
        )
    return len(ends), out


def test_50x4(test_data):
    hits, chains = run(test_data / "test_50x4.fa")
    assert hits == 196
    assert chains == [
        (9, 30, 7, [7, 37]),
        (134, 50, 57, [57, 107, 157, 207]),
        (10, 30, 256, [256, 286]),
    ]


def test_full_length(test_data):
    hits, chains = run(test_data / "full_length.fa")
    assert hits == 3452
    assert chains == [
        (2416, 593, 37, [37, 630, 1222, 1816, 2402, 2989, 3582, 4171, 4762]),
    ]


def test_1000x10(test_data):
    hits, chains = run(test_data / "test_1000x10.fa")
    assert hits == 3055
    assert chains == [
        (3, 141, 64, [64, 205, -1, 206, 349]),
        (5, 1039, 348, [348, 1387]),
        (3, 61, 2463, [2463, 2524]),
        (845, 996, 161, [161, 1157, 2164, 3146, 4161, 5158, 6168, 7156, 8164, 9174]),
    ]
