import numpy as np

from tidehunter_tpu.io.codec import decode, encode
from tidehunter_tpu.ops.myers import edit_distance_nw
from tidehunter_tpu.ops.poa import msa_consensus, sigmoid_phred_qual

SCORES = dict(match=2, mismatch=4, gap_open1=4, gap_ext1=2, gap_open2=24, gap_ext2=1)


def test_exact_repeat_consensus():
    unit = encode("CAGCTAGTCGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGAT")
    for n in (2, 3, 4, 8):
        cons, cov = msa_consensus([unit] * n, **SCORES)
        assert decode(cons) == decode(unit)
        assert (cov == n).all()


def _mutate(u, err, rng):
    out = []
    for c in u:
        r = rng.random()
        if r < err / 3:
            continue
        elif r < 2 * err / 3:
            out.append(rng.integers(0, 4))
            out.append(c)
        elif r < err:
            out.append(rng.integers(0, 4))
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


def test_noisy_consensus_recovers_unit():
    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, 100).astype(np.uint8)
    for err in (0.05, 0.1, 0.2):
        units = [_mutate(unit, err, rng) for _ in range(8)]
        cons, cov = msa_consensus(units, **SCORES)
        ed = edit_distance_nw(decode(cons), decode(unit))
        assert ed <= 4, (err, ed)


def test_indel_units():
    # one unit has an insertion, one a deletion; majority discards both
    base = encode("ACGTACGTACGTACGTACGT")
    ins = np.insert(base, 10, 2)
    dele = np.delete(base, 5)
    cons, cov = msa_consensus([base, ins, dele, base.copy()], **SCORES)
    assert decode(cons) == decode(base)


def test_sigmoid_phred():
    # reference formula abpoa_cons.c:100-107: bounds 33..93
    q = sigmoid_phred_qual(np.array([5, 4, 2, 0]), 5)
    assert q[0] == 93  # full coverage
    assert q[3] == 33  # zero coverage
    assert all(33 <= x <= 93 for x in q)
