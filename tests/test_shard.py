"""Multi-host input sharding (--shard I/N): shard outputs interleave back
to the unsharded run (SURVEY.md §5.8 — ordering matters only within a
shard assignment)."""

import io

from tidehunter_tpu.params import Params
from tidehunter_tpu.pipeline import runner


def _run(tmp_path, fa, shard=None):
    mtp = Params()
    mtp.out_fmt = 2
    buf = io.StringIO()
    runner.run(str(fa), mtp, out=buf, shard=shard)
    return buf.getvalue().splitlines()


def test_shards_cover_unsharded(tmp_path):
    fa = tmp_path / "in.fa"
    unit = "ACGTTGCAGGTCAGTCAGCATGCTAGCTAGCATGCAGTCAGTACGTGCAT"
    lines = []
    for i in range(6):
        lines.append(f">r{i}")
        lines.append("TTGACGTGCA" + unit * (3 + i % 2) + "GGTCAGTCAA")
    fa.write_text("\n".join(lines) + "\n")

    full = _run(tmp_path, fa)
    s0 = _run(tmp_path, fa, shard=(0, 2))
    s1 = _run(tmp_path, fa, shard=(1, 2))

    # every record lands in exactly one shard, content unchanged
    assert sorted(s0 + s1) == sorted(full)
    # shard 0 holds the even reads, in input order
    names0 = [ln.split("\t")[0] for ln in s0]
    assert names0 == [n for n in (f"r{i}" for i in range(6))
                      if int(n[1:]) % 2 == 0 and any(
                          ln.startswith(n + "\t") for ln in full)]
