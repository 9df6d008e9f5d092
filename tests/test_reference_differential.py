"""Binary differential parity against the COMPILED reference engine.

Every other parity test in this repo checks the kernel against
transcriptions of the reference's unit tests or against fixtures the
repo itself writes.  This module closes the remaining gap — a shared
misreading of the Rust — by compiling the reference's dependency-free
core modules (src/lexer.rs, src/parser.rs, src/object.rs,
src/cross_reference.rs, src/trailer.rs, src/raw_byte.rs, src/util.rs)
into a small harness binary (tests/ref_differential/harness_main.rs)
and asserting that the Python kernel and the actual reference code
produce identical canonical output on the same bytes:

  * token streams (kind + payload + byte offset) over an object corpus
  * parsed object trees (values + byte offsets, dict keys sorted)
  * whole-document walks: trailer, xref entries, every fetched object,
    and preorder page order (ref src/page_tree.rs:60-133)

Modules needing external crates (header.rs: regex; image/page/
page_tree: flate2, jpeg-decoder, image) can't be compiled in this
sandbox (no crate registry), so stream *decoding* stays covered by the
transcribed golden tests only.

Known, documented deviations pinned as measured facts instead of being
hidden from the corpus:

  * SURVEY.md §2.7.1 — the reference maps the literal-string escape
    ``\\t`` to 0x0B (src/lexer.rs:135); this kernel is spec-correct
    (0x09).  test_string_tab_escape_deviation.
  * SURVEY.md §2.7.11 — the reference drops a pending octal escape at
    end of string (src/lexer.rs:108-127 never flushes on loop exit), so
    ``(\\101)`` decodes to the empty string; this kernel is spec-correct
    (flushes -> 0x41).  test_string_trailing_octal_deviation.  Found by
    the seeded fuzzer (test_reference_fuzz.py), which therefore never
    ends a literal string with an octal escape.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from pdf_parser_spark.kernel import cos
from pdf_parser_spark.kernel import fileparse
from pdf_parser_spark.kernel.doc import PdfDocument
from pdf_parser_spark.kernel.fileparse import XREF_OFFSET
from pdf_parser_spark import fixtures

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
HARNESS_MAIN = os.path.join(REPO, "tests", "ref_differential",
                            "harness_main.rs")
RUSTC = shutil.which("rustc") or "/root/.cargo/bin/rustc"

_CORE_FILES = ["raw_byte.rs", "lexer.rs", "parser.rs", "object.rs",
               "cross_reference.rs", "trailer.rs", "util.rs"]
_CORE_DIRS = ["raw_byte", "lexer", "parser", "trailer"]


@pytest.fixture(scope="session")
def ref_harness(tmp_path_factory):
    """Compile the reference-core harness once per session.

    Builds a symlink tree (reference sources stay read-only in place)
    because a #[path]-included module resolves its submodules against
    the parent directory, which would alias trailer::error to the
    crate-level error.rs.
    """
    if not os.path.exists(RUSTC):
        pytest.skip("rustc not available")
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not available")
    build = tmp_path_factory.mktemp("ref_harness_build")
    for f in _CORE_FILES:
        os.symlink(os.path.join(REF_SRC, f), build / f)
    for d in _CORE_DIRS:
        os.symlink(os.path.join(REF_SRC, d), build / d)
    shutil.copy(HARNESS_MAIN, build / "main.rs")
    binary = build / "ref_harness"
    r = subprocess.run(
        [RUSTC, "--edition", "2021", "-O", "main.rs", "-o", str(binary)],
        cwd=build, capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"reference harness build failed:\n{r.stderr[-2000:]}")
    return str(binary)


def _run(binary: str, cmd: str, payload: bytes, tmp_path,
         extra: str | None = None) -> str:
    p = tmp_path / "input.bin"
    p.write_bytes(payload)
    argv = [binary, cmd, str(p)] + ([extra] if extra is not None else [])
    r = subprocess.run(argv, capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, f"harness {cmd} rc={r.returncode}: {r.stderr}"
    return r.stdout.strip()


# ---------------------------------------------------------- Python canon
# Mirrors token_line()/canon() in harness_main.rs exactly.

def _hex(b: bytes) -> str:
    return b.hex()


def py_token_lines(buf: bytes) -> list[str]:
    out = []
    for t in cos.tokenize(buf):
        k, v, off = t.kind, t.value, t.offset
        if k == cos.TK_BOOL:
            out.append(f"{off} bool {'true' if v else 'false'}")
        elif k == cos.TK_INT:
            out.append(f"{off} int {v}")
        elif k == cos.TK_REAL:
            out.append(f"{off} real {v!r}")
        elif k == cos.TK_HEXSTR:
            out.append(f"{off} hexstr {_hex(v)}")
        elif k == cos.TK_STR:
            out.append(f"{off} str {_hex(v)}")
        elif k == cos.TK_NAME:
            out.append(f"{off} name {v}")
        elif k in (cos.TK_DICT_START, cos.TK_DICT_END, cos.TK_ARR_START,
                   cos.TK_ARR_END, cos.TK_NULL, cos.TK_IND_OBJ_END):
            out.append(f"{off} {k}")
        elif k in (cos.TK_IND_REF, cos.TK_IND_OBJ_START):
            out.append(f"{off} {k} {v[0]} {v[1]}")
        elif k == cos.TK_STREAM_START:
            out.append(f"{off} stream_start {v}")
        else:  # pragma: no cover - TK_OP is content-mode only
            raise AssertionError(f"unexpected token kind {k}")
    return out


def py_canon(obj) -> str:
    if isinstance(obj, cos.PdfBoolean):
        return f"b:{'true' if obj.value else 'false'}@{obj.offset}"
    if isinstance(obj, cos.PdfInteger):
        return f"i:{obj.value}@{obj.offset}"
    if isinstance(obj, cos.PdfReal):
        return f"r:{obj.value!r}@{obj.offset}"
    if isinstance(obj, cos.PdfName):
        return f"n:{obj.value}@{obj.offset}"
    if isinstance(obj, cos.PdfString):
        return f"s:{_hex(obj.value)}@{obj.offset}"
    if isinstance(obj, cos.PdfNull):
        return f"null@{obj.offset}"
    if isinstance(obj, cos.PdfIndirectRef):
        return f"ref:{obj.obj_num},{obj.gen_num}@{obj.offset}"
    if isinstance(obj, cos.PdfArray):
        return ("arr:[" + ",".join(py_canon(x) for x in obj)
                + f"]@{obj.offset}")
    if isinstance(obj, cos.PdfDict):
        return py_canon_dict(obj)
    if isinstance(obj, cos.PdfIndirectObj):
        return f"iobj:({py_canon(obj.content)})@{obj.offset}"
    if isinstance(obj, cos.PdfStreamObj):
        # harness: stream canon carries the stream DATA offset
        # (PdfStreamObj.byte_offset reads data, src/object.rs:530)
        return f"stream:{py_canon_dict(obj.dict)}@{obj.data_offset}"
    raise AssertionError(f"unexpected object {obj!r}")


def py_canon_dict(d: cos.PdfDict) -> str:
    pairs = sorted((k, py_canon(v)) for k, v in d.entries)
    body = ",".join(f"/{k}={v}" for k, v in pairs)
    return f"dict:{{{body}}}@{d.offset}"


def py_doc_dump(buf: bytes) -> str:
    """Replicate the harness `doc` command with the Python kernel."""
    lines = []
    xref_start = fileparse.find_startxref(buf)
    doc = PdfDocument(buf)
    root = doc.root_ref
    lines.append(f"trailer xref_start={xref_start} "
                 f"root={root.obj_num},{root.gen_num}")
    for n in range(1, 512):
        ent = doc.xref.entries.get(n)
        if ent is None:
            continue
        typ, value, gen = ent
        # The reference enumerates with generation 0 and skips free
        # entries (panic caught in the harness) and gen mismatches.
        if typ != XREF_OFFSET or gen != 0:
            continue
        lines.append(f"xref {n} -> {value}")
        obj = cos.parse_object_at(buf, value)
        lines.append(f"obj {n} {py_canon(obj)}")
    # preorder page walk (mirrors harness walk_pages / page_tree.rs)
    cat = doc.resolve(doc.root_ref)
    pages_ref = cat.get("Pages")
    if isinstance(pages_ref, cos.PdfIndirectRef):
        order: list[int] = []
        _walk(doc, pages_ref, order)
        lines.append("pages " + ",".join(str(n) for n in order))
    return "\n".join(lines)


def _walk(doc: PdfDocument, node_ref: cos.PdfIndirectRef,
          out: list[int]) -> None:
    node = doc.resolve(node_ref)
    if isinstance(node, cos.PdfStreamObj):
        node = node.dict
    if not isinstance(node, cos.PdfDict):
        return
    typ = node.get("Type")
    if isinstance(typ, cos.PdfName) and typ.value == "Page":
        out.append(node_ref.obj_num)
        return
    kids = node.get("Kids")
    if isinstance(kids, cos.PdfArray):
        for kid in kids:
            if isinstance(kid, cos.PdfIndirectRef):
                _walk(doc, kid, out)


# -------------------------------------------------------------- corpora

# Object-level snippets both engines must tokenize and parse
# identically.  In-envelope only: no \t escape (deviation pinned in its
# own test), no extension syntax.
TOKEN_CORPUS = [
    b"true",
    b"false",
    b"null",
    b"0",
    b"123",
    b"-97",
    b"+17",
    b"3.14",
    b"-0.002",
    b"105.2",
    b"/Name1",
    b"/A;Name_With-Various***Chars?",
    b"(hello world)",
    b"(strings may contain balanced (parentheses) and such)",
    b"(escape \\n \\r \\b \\f \\( \\) \\\\ done)",
    b"(octal \\101\\53\\7 mix)",
    b"(split over \\\ntwo lines)",
    b"<414243>",
    b"<48656C6C6F20576F726C64>",
    b"[1 2.5 /X (s) <41> true null]",
    b"[[1 2] [3 [4]]]",
    b"<< /A 1 /B (x) >>",
    b"<< /Outer << /Inner [1 /Two] >> /N null >>",
    b"7 0 R",
    b"12 3 R",
    b"1 0 obj\n42\nendobj",
    b"2 0 obj << /K /V /Ref 9 0 R >> endobj",
    b"3 0 obj [ (a) (b) ] endobj",
    b"4 0 obj\n<< /Length 10 >>\nstream\n0123456789\nendstream\nendobj",
]

# Fixtures inside the reference's whole-document envelope: classic
# single-section single-subsection xref (the reference's XRef::new reads
# exactly one subsection and never follows /Prev).
DOC_FIXTURES = [
    "pdf-min-text",
    "pdf-flate-text",
    "pdf-multipage",
    "pdf-tj-array",
    "pdf-cmap",
    "pdf-encoding-diff",
    "pdf-image-flate",
    "pdf-image-dct",
    "pdf-image-dct-prog",
    "pdf-image-dct-smask",
    "pdf-lzw-text",
]


@pytest.mark.parametrize("snippet", TOKEN_CORPUS,
                         ids=[f"t{i:02d}" for i in range(len(TOKEN_CORPUS))])
def test_token_parity(ref_harness, tmp_path, snippet):
    got_ref = _run(ref_harness, "tokens", snippet, tmp_path)
    assert not got_ref.startswith("LEX_ERROR"), got_ref
    # the reference never emits Eol tokens; filter defensively anyway
    ref_lines = [ln for ln in got_ref.splitlines() if " eol" not in ln]
    assert py_token_lines(snippet) == ref_lines


@pytest.mark.parametrize("snippet", TOKEN_CORPUS,
                         ids=[f"o{i:02d}" for i in range(len(TOKEN_CORPUS))])
def test_object_parity(ref_harness, tmp_path, snippet):
    got_ref = _run(ref_harness, "object", snippet, tmp_path)
    assert not got_ref.startswith("PARSE_ERROR"), got_ref
    mine = py_canon(cos.Parser(snippet).parse())
    assert mine == got_ref


# Inputs BOTH engines must reject (error-contract parity).  The
# reference refuses whitespace inside hex strings (spec allows it;
# this kernel deliberately matches the reference, SURVEY.md §2.7).
ERROR_CORPUS = [
    b"<4 1>",
    b"(unterminated",
    b"1 0 obj 42",          # missing endobj -> unbalanced
]


@pytest.mark.parametrize("snippet", ERROR_CORPUS,
                         ids=[f"e{i:02d}" for i in range(len(ERROR_CORPUS))])
def test_error_parity(ref_harness, tmp_path, snippet):
    got_ref = _run(ref_harness, "object", snippet, tmp_path)
    assert got_ref.startswith("PARSE_ERROR"), got_ref
    with pytest.raises((cos.LexerError, cos.ParserError)):
        cos.Parser(snippet).parse()


def test_string_tab_escape_deviation(ref_harness, tmp_path):
    """Pin the one documented lexer deviation instead of dodging it.

    Reference: ``\\t`` -> 0x0B (src/lexer.rs:135, a bug).  This kernel:
    0x09, per PDF 32000-1 §7.3.4.2 (SURVEY.md §2.7.1).
    """
    snippet = b"(a\\tb)"
    ref_line = _run(ref_harness, "tokens", snippet, tmp_path)
    assert ref_line == "0 str 610b62"
    assert py_token_lines(snippet) == ["0 str 610962"]


def test_string_trailing_octal_deviation(ref_harness, tmp_path):
    """Pin the second lexer deviation (SURVEY.md §2.7.11).

    The reference's parse_string flushes a pending octal accumulator
    only when a NEXT byte arrives (src/lexer.rs:108-127); at end of the
    string buffer the loop exits without flushing, so a trailing octal
    escape — even a complete 3-digit one — is silently dropped.  This
    kernel is spec-correct (PDF 32000-1 §7.3.4.2): the escape decodes.
    Mid-string octals flush identically in both engines (covered by the
    TOKEN_CORPUS octal case and the fuzzer).
    """
    for snippet, ref_hex, py_hex in [
        (b"(\\101)", "", "41"),          # full 3-digit escape, dropped
        (b"(\\53\\7)", "2b", "2b07"),    # second escape pending at end
        (b"(ab\\377)", "6162", "6162ff"),
    ]:
        ref_line = _run(ref_harness, "tokens", snippet, tmp_path)
        assert ref_line == f"0 str {ref_hex}".rstrip(), snippet
        assert py_token_lines(snippet) == [f"0 str {py_hex}"], snippet


@pytest.mark.parametrize("fixture_id", DOC_FIXTURES)
def test_doc_parity(ref_harness, tmp_path, fixture_id):
    buf, _meta = fixtures.get_fixture(fixture_id)
    got_ref = _run(ref_harness, "doc", buf, tmp_path)
    assert "ERROR" not in got_ref.splitlines()[0], got_ref
    assert py_doc_dump(buf) == got_ref
