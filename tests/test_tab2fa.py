"""tab2fa converter (reference src/tab2fa.py:7-35 behavior)."""

import io

from tidehunter_tpu.tools.tab2fa import fa_transform, tab_transform

TAB = (
    "read1\trep0\t4.0\t300\t51\t250\t50\t100.0\t0\t59,109,159,208\tACGT\n"
    "read2\trep0\t8.8\t5231\t31\t5215\t200\t95.4\t1\t39,632\tGGCC\n"
)


def test_tab_to_fa_and_back():
    out = io.StringIO()
    tab_transform(io.StringIO(TAB), out, "fa", only_full=False)
    fa = out.getvalue()
    assert fa.splitlines()[0] == (
        ">read1_rep0_4.0_300_51_250_50_100.0_0_59,109,159,208"
    )
    assert fa.splitlines()[1] == "ACGT"
    # fa -> tab reconstructs the columns (last 7 '_'-fields split out)
    out2 = io.StringIO()
    fa_transform(io.StringIO(fa), out2, "tab", only_full=False)
    lines = out2.getvalue().splitlines()
    # reference fa_core joins ele[:-7] as the name: read1_rep0_4.0 stays
    # fused (only 7 trailing fields are split) — same as upstream
    assert lines[0].split("\t")[-1] == "ACGT"
    assert lines[0].split("\t")[1] == "300"


def test_only_full_filter():
    out = io.StringIO()
    tab_transform(io.StringIO(TAB), out, "fa", only_full=True)
    fa = out.getvalue()
    assert "read1" not in fa and "read2" in fa

    # fa-mode filter keys on the LAST '_'-field of the name token
    fa_in = ">x_1_0\nAC\n>y_2_1\nGT\n"
    out2 = io.StringIO()
    fa_transform(io.StringIO(fa_in), out2, "fa", only_full=True)
    assert out2.getvalue() == ">y_2_1\nGT\n"
