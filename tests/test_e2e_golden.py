"""End-to-end pipeline tests on the reference's test_data.

test_50x4 is exact-parity (pinned record from README.md:220-223, which the
current reference code reproduces). For the noisy inputs, the fields that
are provably reference-exact (readLen, subPos from the chain/partition
stages) are pinned, while consensus-content-derived fields (consLen,
aveMatch) get sanity bounds — the reference's abPOA consensus cannot be run
in this environment (empty submodule), so exact consensus equality is not a
verifiable target there.
"""

import io

import pytest

from tidehunter_tpu.cli import parse_args
from tidehunter_tpu.params import Params
from tidehunter_tpu.pipeline import runner


def run_cli(args, test_data=None):
    parsed = parse_args(args)
    assert not isinstance(parsed, int), f"CLI parse failed for {args}"
    mtp, read_fn, extra = parsed
    out = io.StringIO()
    runner.run(read_fn, mtp, out=out)
    return out.getvalue()


def test_50x4_tab(test_data):
    got = run_cli(["-f", "2", str(test_data / "test_50x4.fa")])
    assert got == (
        "test_50x4\trep0\t4.0\t300\t51\t250\t50\t100.0\t0\t"
        "59,109,159,208\t"
        "CGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGATCAGCTAGT\n"
    )


def test_50x4_fasta(test_data):
    got = run_cli(["-f", "1", str(test_data / "test_50x4.fa")])
    assert got == (
        ">test_50x4_rep0_4.0 300_51_250_50_100.0_0_59,109,159,208\n"
        "CGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGATCAGCTAGT\n"
    )


def test_50x4_fastq(test_data):
    got = run_cli(["-f", "3", str(test_data / "test_50x4.fa")])
    lines = got.splitlines()
    assert lines[0] == "@test_50x4_rep0_4.0 300_51_250_50_100.0_0_59,109,159,208"
    assert lines[1] == "CGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGATCAGCTAGT"
    assert lines[2] == "+"
    assert lines[3] == "]" * 50  # full coverage, 3 units -> phred 60+33


def test_50x4_units(test_data):
    got = run_cli(["-u", "-f", "2", str(test_data / "test_50x4.fa")])
    lines = got.splitlines()
    assert len(lines) == 3
    # TAB unit mode excludes the end base (reference src/main.c:231 uses <)
    assert lines[0] == (
        "test_50x4\trep0\tsub0\t"
        "CGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGATCAGCTAG"
    )


def test_50x4_units_fasta(test_data):
    got = run_cli(["-u", "-f", "1", str(test_data / "test_50x4.fa")])
    lines = got.splitlines()
    assert lines[0] == ">test_50x4_rep0_sub0"
    # FASTA unit mode includes the end base (src/main.c:224 uses <=)
    assert lines[1] == "CGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGATCAGCTAGT"


def test_1000x10_tab(test_data):
    got = run_cli(["-f", "2", str(test_data / "test_1000x10.fa")])
    lines = got.splitlines()
    assert len(lines) == 1
    f = lines[0].split("\t")
    assert f[0] == "test_1000x10" and f[1] == "rep0"
    assert f[3] == "9710"
    # subPos from the reference-exact partition [161,1157,...,9174] (+2/+1)
    assert f[9] == "163,1159,2166,3148,4163,5160,6170,7158,8166,9175"
    assert 950 <= int(f[6]) <= 1050           # consLen ~ 1000
    assert 80.0 <= float(f[7]) <= 100.0       # aveMatch
    assert 9.0 <= float(f[2]) <= 10.5         # copyNum


def test_full_length(test_data):
    got = run_cli(
        [
            "-f", "2",
            "-5", str(test_data / "5prime.fa"),
            "-3", str(test_data / "3prime.fa"),
            str(test_data / "full_length.fa"),
        ]
    )
    lines = got.splitlines()
    assert len(lines) == 1
    f = lines[0].split("\t")
    assert f[3] == "5231"
    assert f[8] == "1"  # sense-strand full length
    assert f[9] == "39,632,1224,1818,2404,2991,3584,4173,4763"
    assert 190 <= int(f[6]) <= 215


def test_full_length_only_filter(test_data):
    # -F on a read without adapters -> no output
    got = run_cli(
        [
            "-f", "2", "-F",
            "-5", str(test_data / "5prime.fa"),
            "-3", str(test_data / "3prime.fa"),
            str(test_data / "test_50x4.fa"),
        ]
    )
    assert got == ""


def test_min_len_filter(test_data):
    got = run_cli(["-f", "2", "-m", "60", str(test_data / "test_50x4.fa")])
    assert got == ""  # 50bp consensus dropped by -m 60


def test_max_period_filter(test_data):
    got = run_cli(["-f", "2", "-P", "40", str(test_data / "test_50x4.fa")])
    assert got == ""  # period 50 exceeds -P 40


def test_min_cov_filter(test_data):
    # all 3 units are exact -> coverage 3 everywhere; -r 4 rejects
    got = run_cli(["-f", "2", "-r", "4", str(test_data / "test_50x4.fa")])
    assert got == ""
    got = run_cli(["-f", "2", "-r", "3", str(test_data / "test_50x4.fa")])
    assert len(got.splitlines()) == 1


def test_msa_graph_cli(test_data, tmp_path, monkeypatch):
    # --msa graph routes consensus through the graph-POA (native/poax.c);
    # on the exact-repeat toy both models give the pinned record.
    # setenv-then-delenv registers the original absence with monkeypatch,
    # so the TH_MSA main() sets is rolled back after the test.
    monkeypatch.setenv("TH_MSA", "x")
    monkeypatch.delenv("TH_MSA")
    from tidehunter_tpu import cli

    out = tmp_path / "g.tab"
    rc = cli.main(["-f", "2", "--msa", "graph", "--device", "off",
                   "-o", str(out), str(test_data / "test_50x4.fa")])
    assert rc == 0
    assert out.read_text() == (
        "test_50x4\trep0\t4.0\t300\t51\t250\t50\t100.0\t0\t"
        "59,109,159,208\t"
        "CGATCGATCGGCATGCATGCATGCTAGTCGATGCATCGGGATCAGCTAGT\n"
    )


def test_msa_flag_validation(capsys):
    from tidehunter_tpu import cli

    rc = cli.main(["-f", "2", "--msa", "bogus", "nosuch.fa"])
    assert rc == 1
    assert "--msa needs profile|graph" in capsys.readouterr().err
