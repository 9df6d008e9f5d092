"""Golden tests ported 1:1 from /root/reference/src/raw_byte/test.rs:1-225.

Same inputs, same expected slices — these pin the combinator semantics
(including the empty-target edge cases) the trailer/xref parsers rely on.
"""

from pdf_parser_spark.kernel import rawbytes as rb


def test_extract_after_eol_1():  # ref test.rs:4-9
    assert rb.extract_after_eol(b"  kjkj\n") == b""


def test_extract_after_eol_2():  # ref test.rs:12-17
    assert rb.extract_after_eol(b"  hogehoeg \r\nhoge") == b"hoge"


def test_extract_after_eol_3():  # ref test.rs:20-25 (bare CR is one EOL)
    assert rb.extract_after_eol(b"hoge\r   \nfuga") == b"   \nfuga"


def test_first_match_index_1():  # ref test.rs:28-34
    assert rb.first_match_index(b"0123abcd\n { target\r hoge", b"target") == 12


def test_first_match_index_2():  # ref test.rs:37-43 (empty target -> 0)
    assert rb.first_match_index(b"0123abcd\n { target\r hoge", b"") == 0


def test_first_match_index_3():  # ref test.rs:46-53
    assert rb.first_match_index(b"hogehoge", b"too long target ") is None


def test_last_match_index_1():  # ref test.rs:56-62
    assert rb.last_match_index(b"0123abcd\n { target\r target2 hoge",
                               b"target") == 20


def test_last_match_index_2():  # ref test.rs:65-71 (empty -> len)
    assert rb.last_match_index(b"0123abcd\n { target\r hoge", b"") == 24


def test_last_match_index_3():  # ref test.rs:74-81
    assert rb.last_match_index(b"hogehoge", b"too long target ") is None


BUF = b"hogehoge target jjjj\n\rhoge"


def test_extract_from_1():  # ref test.rs:84-90
    assert rb.extract_from(BUF, b"target") == b"target jjjj\n\rhoge"


def test_extract_from_2():  # ref test.rs:93-99
    assert rb.extract_from(BUF, b"") == BUF


def test_cut_from_1():  # ref test.rs:102-108
    assert rb.cut_from(BUF, b"target") == b"hogehoge "


def test_cut_from_2():  # ref test.rs:111-117
    assert rb.cut_from(BUF, b"") == b""


def test_extract_after_1():  # ref test.rs:120-126
    assert rb.extract_after(BUF, b"target") == b" jjjj\n\rhoge"


def test_extract_after_2():  # ref test.rs:129-135
    assert rb.extract_after(BUF, b"") == BUF


def test_cut_after_1():  # ref test.rs:138-144
    assert rb.cut_after(BUF, b"target") == b"hogehoge target"


def test_cut_after_2():  # ref test.rs:147-153
    assert rb.cut_after(BUF, b"") == b""


def test_extract_tail_from_1():  # ref test.rs:156-162
    assert rb.extract_tail_from(BUF, b"target") == b"target jjjj\n\rhoge"


def test_extract_tail_from_2():  # ref test.rs:165-171 (empty -> tail)
    assert rb.extract_tail_from(BUF, b"") == b""


def test_cut_tail_from_1():  # ref test.rs:174-180
    assert rb.cut_tail_from(BUF, b"target") == b"hogehoge "


def test_cut_tail_from_2():  # ref test.rs:183-189
    assert rb.cut_tail_from(BUF, b"") == BUF


def test_extract_tail_after_1():  # ref test.rs:192-198
    assert rb.extract_tail_after(BUF, b"target") == b" jjjj\n\rhoge"


def test_extract_tail_after_2():  # ref test.rs:201-207
    assert rb.extract_tail_after(BUF, b"") == b""


def test_cut_tail_after_1():  # ref test.rs:210-216
    assert rb.cut_tail_after(BUF, b"target") == b"hogehoge target"


def test_cut_tail_after_2():  # ref test.rs:219-225
    assert rb.cut_tail_after(BUF, b"") == BUF


def test_overlapping_match_fixed():
    """The reference's naive search misses overlapping matches
    (src/raw_byte.rs:7-26: 'ab' in 'aab' missed at 1). We fix this —
    deviation documented in SURVEY.md §2.7.3."""
    assert rb.first_match_index(b"aab", b"ab") == 1
