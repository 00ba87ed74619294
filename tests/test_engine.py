"""Engine (batched device path) output parity vs the host oracle path."""

import io

import pytest

from tidehunter_tpu.cli import parse_args
from tidehunter_tpu.engine import make_engine
from tidehunter_tpu.pipeline import runner


def run(args, device=False):
    parsed = parse_args(args)
    assert not isinstance(parsed, int)
    mtp, fn, extra = parsed
    out = io.StringIO()
    pc = make_engine(mtp, "cpu") if device else None
    runner.run(fn, mtp, out=out, process_chunk=pc)
    return out.getvalue()


@pytest.mark.parametrize(
    "extra_args",
    [["-f", "2"], ["-f", "3"], ["-u", "-f", "1"]],
)
def test_engine_matches_oracle_50x4(test_data, extra_args):
    args = extra_args + [str(test_data / "test_50x4.fa")]
    assert run(args, device=True) == run(args, device=False)


def test_engine_matches_oracle_1000x10(test_data):
    args = ["-f", "2", str(test_data / "test_1000x10.fa")]
    assert run(args, device=True) == run(args, device=False)


def test_engine_matches_oracle_full_length(test_data):
    args = [
        "-f", "2",
        "-5", str(test_data / "5prime.fa"),
        "-3", str(test_data / "3prime.fa"),
        str(test_data / "full_length.fa"),
    ]
    assert run(args, device=True) == run(args, device=False)
