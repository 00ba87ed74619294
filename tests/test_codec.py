import numpy as np

from tidehunter_tpu.io.codec import decode, encode, revcomp_codes, revcomp_str


def test_encode_acgtn():
    assert encode("ACGTN").tolist() == [0, 1, 2, 3, 4]
    assert encode("acgtn").tolist() == [0, 1, 2, 3, 4]
    assert encode("RYX-").tolist() == [4, 4, 4, 4]


def test_decode_roundtrip():
    assert decode(encode("ACGTNACGT")) == "ACGTNACGT"


def test_revcomp():
    assert revcomp_str("ACGTN") == "NACGT"
    assert revcomp_str("aacg") == "CGTT"
    assert revcomp_codes(np.array([0, 1, 4], dtype=np.uint8)).tolist() == [4, 2, 3]
