"""Golden tests ported 1:1 from /root/reference/src/parser/test.rs:6-127.

Same inputs, same expected object trees with exact byte offsets.
"""

import pytest

from pdf_parser_spark.kernel.cos import (
    Parser, ParserError, PdfArray, PdfBoolean, PdfDict, PdfIndirectObj,
    PdfIndirectRef, PdfInteger, PdfName, PdfNull, PdfReal, PdfStreamObj,
    PdfString, parse_object_at,
)


def parse(buf: bytes):
    return Parser(buf, 0).parse_object()


def test_parse_integer():  # ref src/parser/test.rs:7-14
    assert parse(b"123") == PdfInteger(123, 0)


def test_parse_real():  # ref src/parser/test.rs:17-24
    assert parse(b"-123.") == PdfReal(-123.0, 0)


def test_parse_boolean():  # ref src/parser/test.rs:27-34
    assert parse(b"true") == PdfBoolean(True, 0)


def test_parse_null():  # ref src/parser/test.rs:37-44
    assert parse(b"null") == PdfNull(0)


def test_parse_indirect_ref():  # ref src/parser/test.rs:47-54
    assert parse(b"1 0 R") == PdfIndirectRef(1, 0, 0)


def test_parse_string_1():  # ref src/parser/test.rs:57-67
    assert parse(b"(hoge)") == PdfString(b"hoge", 0)


def test_parse_array_1():  # ref src/parser/test.rs:70-94
    obj = parse(b"[  123  true \n  -12.[2 1 R\nnull] ]")
    assert obj == PdfArray((
        PdfInteger(123, 3),
        PdfBoolean(True, 8),
        PdfReal(-12.0, 16),
        PdfArray((
            PdfIndirectRef(2, 1, 21),
            PdfNull(27),
        ), 20),
    ), 0)


def test_parse_dict_1():  # ref src/parser/test.rs:97-127
    obj = parse(b"<</hoge 1 0 R\n/fuga <</arr [123\n/name]>>>>")
    assert isinstance(obj, PdfDict)
    assert obj.offset == 0
    assert obj.get("hoge") == PdfIndirectRef(1, 0, 8)
    fuga = obj.get("fuga")
    assert isinstance(fuga, PdfDict)
    assert fuga.offset == 20
    arr = fuga.get("arr")
    assert arr == PdfArray((
        PdfInteger(123, 28),
        PdfName("name", 32),
    ), 27)
    assert set(obj.keys()) == {"hoge", "fuga"}


# --- additional pins beyond the ported suite ---------------------------

def test_parse_indirect_obj():
    obj = parse(b"7 0 obj\n<</Type /Catalog>>\nendobj")
    assert obj == PdfIndirectObj(7, 0, PdfDict(
        (("Type", PdfName("Catalog", 16)),), 8), 0)


def test_parse_stream_obj():
    buf = b"5 0 obj\n<</Length 3>>\nstream\nabc\nendstream\nendobj"
    obj = parse(buf)
    assert isinstance(obj, PdfStreamObj)
    assert obj.obj_num == 5 and obj.gen_num == 0
    assert obj.data_offset == 29
    assert obj.dict.get("Length") == PdfInteger(3, 18)


def test_parse_dict_duplicate_key_last_wins():
    """ref src/parser.rs:246-254 (TODO at :251): last value wins."""
    obj = parse(b"<</k 1 /k 2>>")
    assert obj.get("k") == PdfInteger(2, 10)
    assert len(obj.keys()) == 1


def test_parse_unbalanced_obj_rejected():
    """ref src/parser.rs:67-72: obj without endobj is rejected."""
    with pytest.raises(ParserError):
        Parser(b"1 0 obj\n123", 0)


def test_parse_object_at_absolute_offsets():
    buf = b"junkjunk 7 0 obj\n42 endobj"
    obj = parse_object_at(buf, 9)
    assert obj == PdfIndirectObj(7, 0, PdfInteger(42, 17), 9)


def test_pos_parse_equals_slice_parse():
    """The zero-copy pos cursor must produce byte-identical objects
    (values AND absolute offsets) to the old slice-then-parse form,
    across every fixture document's xref'd objects."""
    from pdf_parser_spark.fixtures import FIXTURES, get_fixture
    from pdf_parser_spark.kernel.cos import Parser
    from pdf_parser_spark.kernel.fileparse import XREF_OFFSET, load_xref_chain

    checked = 0
    for fid in sorted(FIXTURES):
        buf, _g = get_fixture(fid)
        try:
            xref = load_xref_chain(
                buf, lambda s: b"")  # raw classic tables only
        except Exception:
            continue
        for num, (typ, value, _gen) in sorted(xref.entries.items()):
            if typ != XREF_OFFSET:
                continue
            via_pos = Parser(buf, 0, pos=value).parse()
            via_slice = Parser(buf[value:], value).parse()
            assert via_pos == via_slice
            checked += 1
    assert checked > 10


def test_fused_parse_covers_fixture_objects():
    """Every fixture's xref'd object must parse identically through
    the fused fast path and the canonical Parser — and the fast path
    must actually engage (no silent always-bail regression)."""
    from pdf_parser_spark.fixtures import FIXTURES, get_fixture
    from pdf_parser_spark.kernel.cos import (
        Parser, _FusedBail, _fused_parse_indirect,
    )
    from pdf_parser_spark.kernel.fileparse import XREF_OFFSET, load_xref_chain

    fused = bailed = 0
    for fid in sorted(FIXTURES):
        buf, _g = get_fixture(fid)
        try:
            xref = load_xref_chain(buf, lambda s: b"")
        except Exception:
            continue
        for _num, (typ, value, _gen) in sorted(xref.entries.items()):
            if typ != XREF_OFFSET:
                continue
            slow = Parser(buf, 0, pos=value).parse()
            try:
                fast = _fused_parse_indirect(buf, value)
            except _FusedBail:
                bailed += 1
                continue
            fused += 1
            assert fast == slow
    assert fused > 50
    assert bailed <= fused * 0.05    # fast path engages ~everywhere
