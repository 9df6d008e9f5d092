"""Golden tests ported 1:1 from /root/reference/src/lexer/test.rs:17-208.

Same input byte strings, same expected token vectors including absolute
byte offsets. These ARE the reference's own golden fixtures for the COS
token grammar (north_rule: per-turn equality vs reference goldens).
"""

import pytest

from pdf_parser_spark.kernel.cos import (
    TK_ARR_END, TK_ARR_START, TK_BOOL, TK_HEXSTR, TK_IND_OBJ_END,
    TK_IND_OBJ_START, TK_IND_REF, TK_INT, TK_NAME, TK_NULL, TK_REAL, TK_STR,
    LexerError, Token, tokenize,
)


def test_tokenize_space_eol():  # ref src/lexer/test.rs:18-25
    assert tokenize(b"\0\t\n\x0c\r \r\n \n\r") == []


def test_tokenize_integer():  # ref src/lexer/test.rs:28-41
    assert tokenize(b" +123 -123\r") == [
        Token(TK_INT, 123, 1),
        Token(TK_INT, -123, 6),
    ]


def test_tokenize_float():  # ref src/lexer/test.rs:44-62
    assert tokenize(b"1.5 -23.4 +110.0 .5 4. -.002 0.0") == [
        Token(TK_REAL, 1.5, 0),
        Token(TK_REAL, -23.4, 4),
        Token(TK_REAL, 110.0, 10),
        Token(TK_REAL, 0.5, 17),
        Token(TK_REAL, 4.0, 20),
        Token(TK_REAL, -0.002, 23),
        Token(TK_REAL, 0.0, 29),
    ]


def test_tokenize_hex_str():  # ref src/lexer/test.rs:65-75 (odd pad)
    assert tokenize(b"<a0e0f>") == [
        Token(TK_HEXSTR, bytes([160, 224, 240]), 0)
    ]


def test_tokenize_string():  # ref src/lexer/test.rs:78-93
    # raw TAB byte, double backslash, octal \053, nested parens w/ \005
    buf = b"(hoge \t \\\\ \\053 (\\0053))"
    assert tokenize(buf) == [
        Token(TK_STR, bytes([104, 111, 103, 101, 32, 9, 32, 92, 32, 43,
                             32, 40, 5, 51, 41]), 0)
    ]


def test_tokenize_array():  # ref src/lexer/test.rs:96-112
    assert tokenize(b"[123 (aa\\() -55.]") == [
        Token(TK_ARR_START, None, 0),
        Token(TK_INT, 123, 1),
        Token(TK_STR, bytes([97, 97, 40]), 5),
        Token(TK_REAL, -55.0, 12),
        Token(TK_ARR_END, None, 16),
    ]


def test_tokenize_indirect_ref_1():  # ref src/lexer/test.rs:115-125
    assert tokenize(b"  1 0 R") == [Token(TK_IND_REF, (1, 0), 2)]


def test_tokenize_indirect_ref_2():  # ref src/lexer/test.rs:128-141
    assert tokenize(b"123 1 0 R") == [
        Token(TK_INT, 123, 0),
        Token(TK_IND_REF, (1, 0), 4),
    ]


def test_tokenize_name():  # ref src/lexer/test.rs:144-157
    assert tokenize(b"/Name..;$@?! ") == [
        Token(TK_NAME, "Name..;$@?!", 0)
    ]


def test_tokenize_comment():  # ref src/lexer/test.rs:160-173
    assert tokenize(b"/Name%hogehoge /..<>(){}[]\r\n123") == [
        Token(TK_NAME, "Name", 0),
        Token(TK_INT, 123, 28),
    ]


def test_tokenize_boolean_null():  # ref src/lexer/test.rs:176-190
    assert tokenize(b"null true false") == [
        Token(TK_NULL, None, 0),
        Token(TK_BOOL, True, 5),
        Token(TK_BOOL, False, 10),
    ]


def test_tokenize_indirect_obj():  # ref src/lexer/test.rs:193-208
    # lexing stops hard after endobj; trailing garbage never touched
    assert tokenize(b"1 0 obj\n123 endobj   hogehoge lkjdflkj)") == [
        Token(TK_IND_OBJ_START, (1, 0), 0),
        Token(TK_INT, 123, 8),
        Token(TK_IND_OBJ_END, None, 12),
    ]


# --- additional pins beyond the ported suite ---------------------------

def test_tokenize_stream_offsets():
    """StreamObjStart value = absolute offset of first data byte
    (ref src/lexer.rs:630-658); LF and CRLF accepted, bare CR not."""
    toks = tokenize(b"1 0 obj\n<</Length 3>>\nstream\nabc\nendstream")
    assert toks[-1].kind == "stream_start"
    assert toks[-1].value == 29  # past 'stream\n'
    toks = tokenize(b"1 0 obj\n<</Length 3>>\nstream\r\nabc")
    assert toks[-1].value == 30
    with pytest.raises(LexerError):
        tokenize(b"1 0 obj\n<</L 3>>\nstream\rabcdef")


def test_tokenize_bad_number():
    with pytest.raises(LexerError):
        tokenize(b".....")


def test_tokenize_keyword_end_required():
    with pytest.raises(LexerError):
        tokenize(b"nullx")


def test_string_escape_tab_spec_correct():
    """Documented deviation (SURVEY.md §2.7.1): \\t -> 0x09 per spec;
    the reference pushes 0x0B (src/lexer.rs:135) but no reference golden
    exercises the escape."""
    assert tokenize(rb"(\t)") == [Token(TK_STR, b"\x09", 0)]


def test_octal_mod_256():
    """3-digit octal wraps mod 256 (ref src/lexer.rs:113-117 keeps the
    low byte of a u16)."""
    assert tokenize(rb"(\777)") == [Token(TK_STR, b"\xff", 0)]
    assert tokenize(rb"(\400)") == [Token(TK_STR, b"\x00", 0)]
