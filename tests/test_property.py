"""Property-based tests (SURVEY.md §5.2 item 3): random COS object
trees round-trip through a serializer → lexer+parser, and random byte
strings round-trip through literal/hex escaping. Pure-kernel — no
Spark session needed, so these run in ~seconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernel.cos import (
    Parser,
    PdfArray,
    PdfBoolean,
    PdfDict,
    PdfInteger,
    PdfName,
    PdfNull,
    PdfReal,
    PdfString,
)

# ----------------------------------------------------------- serializer

NAME_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    min_size=1, max_size=10)


def serialize(obj) -> bytes:
    if isinstance(obj, PdfBoolean):
        return b"true" if obj.value else b"false"
    if isinstance(obj, PdfInteger):
        return str(obj.value).encode()
    if isinstance(obj, PdfReal):
        return repr(obj.value).encode()
    if isinstance(obj, PdfName):
        return b"/" + obj.value.encode()
    if isinstance(obj, PdfString):
        return b"(" + escape_literal(obj.value) + b")"
    if isinstance(obj, PdfNull):
        return b"null"
    if isinstance(obj, PdfArray):
        return b"[" + b" ".join(serialize(i) for i in obj.items) + b"]"
    if isinstance(obj, PdfDict):
        inner = b" ".join(b"/" + k.encode() + b" " + serialize(v)
                          for k, v in obj.entries)
        return b"<<" + inner + b">>"
    raise TypeError(type(obj))


def escape_literal(data: bytes) -> bytes:
    out = bytearray()
    for b in data:
        if b in (0x28, 0x29, 0x5C):          # ( ) \
            out += b"\\" + bytes([b])
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        elif b < 0x20 or b > 0x7E:
            out += ("\\%03o" % b).encode()
        else:
            out.append(b)
    return bytes(out)


# ----------------------------------------------------------- strategies

scalars = st.one_of(
    st.booleans().map(PdfBoolean),
    st.integers(min_value=-(2**31), max_value=2**31 - 1).map(PdfInteger),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6,
              # the lexer parses plain decimal notation, not 1e-07
              allow_subnormal=False).filter(
        lambda f: "e" not in repr(f) and "E" not in repr(f)).map(PdfReal),
    NAME_CHARS.map(PdfName),
    st.binary(max_size=24).map(PdfString),
    st.just(PdfNull()),
)


def containers(children):
    return st.one_of(
        st.lists(children, max_size=4).map(
            lambda xs: PdfArray(tuple(xs))),
        st.lists(st.tuples(NAME_CHARS, children), max_size=4).map(
            lambda kvs: PdfDict(tuple({k: v for k, v in kvs}.items()))),
    )


objects = st.recursive(scalars, containers, max_leaves=12)


def strip_offsets(obj):
    """Structural equality modulo byte offsets."""
    if isinstance(obj, PdfArray):
        return ("arr", tuple(strip_offsets(i) for i in obj.items))
    if isinstance(obj, PdfDict):
        return ("dict", tuple((k, strip_offsets(v))
                              for k, v in obj.entries))
    if isinstance(obj, PdfReal):
        return ("real", obj.value)
    if isinstance(obj, PdfNull):
        return ("null",)
    if isinstance(obj, (PdfBoolean, PdfInteger, PdfName, PdfString)):
        return (type(obj).__name__, obj.value)
    raise TypeError(type(obj))


# ---------------------------------------------------------------- tests

@settings(max_examples=300, deadline=None)
@given(objects)
def test_roundtrip_object_tree(obj):
    data = serialize(obj)
    parsed = Parser(data).parse()
    assert strip_offsets(parsed) == strip_offsets(obj)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=64))
def test_roundtrip_literal_string(data):
    src = b"(" + escape_literal(data) + b")"
    parsed = Parser(src).parse()
    assert isinstance(parsed, PdfString)
    assert parsed.value == data


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_roundtrip_hex_string(data):
    src = b"<" + data.hex().encode() + b">"
    parsed = Parser(src).parse()
    assert isinstance(parsed, PdfString)
    assert parsed.value == data


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**50), max_value=2**50))
def test_integer_exact(n):
    parsed = Parser(str(n).encode()).parse()
    assert isinstance(parsed, PdfInteger) and parsed.value == n
