"""Seeded random differential fuzzing against the COMPILED reference.

test_reference_differential.py proves parity on a hand-picked corpus;
this module widens that to a few hundred RANDOM in-envelope inputs per
run — deterministic (seeded stdlib PRNG, failures reproduce exactly),
generated inside the grammar both engines accept (SURVEY.md §2.7
envelope: no ``\\t`` escape, no string-final octal escape — both are
pinned deviations in test_reference_differential — no extension syntax,
no whitespace in hex strings, i64-range integers, non-exponent reals).

Four layers:
  * random COS objects (nested arrays/dicts/strings/names/refs with
    random interleaved whitespace + comments) — token & object parity
  * random indirect objects / stream objects — object parity
  * random whole documents (random page-tree nesting, shuffled object
    numbering, random page payloads) — trailer/xref/object-walk/page-
    order parity via the ``doc`` harness command
  * random (buffer, needle) pairs — all 11 raw_byte slice/EOL
    combinators via the ``rawbyte`` harness command, inside the
    envelope where the reference's naive search is exact (see below)

A failure here means the two engines disagree on bytes neither test
author hand-picked — exactly the class of shared-misreading bug the
hand corpus cannot catch.
"""

from __future__ import annotations

import random
import zlib

import pytest

from pdf_parser_spark.kernel import cos
from pdf_parser_spark import fixtures

from test_reference_differential import (  # noqa: F401  (fixture import)
    _run, py_canon, py_doc_dump, py_token_lines, ref_harness,
)

# ------------------------------------------------------------ generator

_NAME_CHARS = ("abcdefghijklmnopqrstuvwxyz"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789;_-*?")
_STR_CHARS = (" abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
              "0123456789 .,:;!?'\"-+*/=[]{}<>#&@")
# in-envelope escapes only (no \t: documented deviation, pinned apart)
_ESCAPES = [b"\\n", b"\\r", b"\\b", b"\\f", b"\\(", b"\\)", b"\\\\",
            b"\\101", b"\\53", b"\\7", b"\\377", b"\\0"]
# octal escapes may not END a string: the reference drops a pending
# octal accumulator at end-of-buffer (SURVEY.md §2.7.11, deviation
# pinned in test_string_trailing_octal_deviation)
_OCTAL_ESCAPES = frozenset({b"\\101", b"\\53", b"\\7", b"\\377", b"\\0"})
_WS = [b" ", b"  ", b"\n", b"\r\n", b" \n", b"\r"]


def _ws(rng: random.Random) -> bytes:
    w = rng.choice(_WS)
    if rng.random() < 0.05:
        w = b"% fuzz comment\n" + w
    return w


def _gen_name(rng: random.Random) -> bytes:
    n = rng.randint(1, 12)
    return b"/" + "".join(rng.choice(_NAME_CHARS)
                          for _ in range(n)).encode()


def _ends_with_pending_octal(body: bytes) -> bool:
    """True iff a lexer scanning ``body`` (a literal-string interior)
    ends inside-or-immediately-after an octal escape — the spot where
    the reference's never-flush-on-loop-exit quirk (§2.7.11) shows.
    The reference only flushes the accumulator when a FOLLOWING char
    arrives, so even a complete 3-digit octal is dropped at string end
    (``(\\101)`` → empty, pinned in
    test_string_trailing_octal_deviation). Cross-part merges make this
    non-local: ``\\7`` followed by a content chunk ``"5"`` IS a
    trailing ``\\75`` (found by a widened fuzz run at seed 2073), so
    the check must scan the assembled body, not inspect parts."""
    i, n = 0, len(body)
    pending = False
    while i < n:
        if body[i] == 0x5C and i + 1 < n:          # backslash escape
            if body[i + 1] in b"01234567":
                j = i + 1
                while j < n and j - i <= 3 and body[j] in b"01234567":
                    j += 1
                pending = (j == n)
                i = j
                continue
            i += 2                                  # \X consumes one
        else:
            i += 1
        pending = False
    return pending


def _gen_litstr(rng: random.Random, depth: int = 0) -> bytes:
    parts = []
    for _ in range(rng.randint(0, 8)):
        r = rng.random()
        if r < 0.55:
            k = rng.randint(1, 10)
            parts.append("".join(rng.choice(_STR_CHARS)
                                 for _ in range(k)).encode())
        elif r < 0.8:
            parts.append(rng.choice(_ESCAPES))
        elif r < 0.9 and depth < 2:
            parts.append(_gen_litstr(rng, depth + 1))  # balanced nesting
        else:
            parts.append(b"\\\n")                      # line continuation
    body = b"".join(parts)
    if depth == 0 and _ends_with_pending_octal(body):  # §2.7.11 envelope
        body += b"q"
    return b"(" + body + b")"


def _gen_hexstr(rng: random.Random) -> bytes:
    n = 2 * rng.randint(0, 8)          # even digits (ref refuses ws/odd)
    return b"<" + "".join(rng.choice("0123456789abcdefABCDEF")
                          for _ in range(n)).encode() + b">"


def _gen_int(rng: random.Random) -> bytes:
    v = rng.choice([rng.randint(-9, 9), rng.randint(-10**6, 10**6),
                    rng.randint(-2**31, 2**31)])
    s = str(v)
    if v >= 0 and rng.random() < 0.2:
        s = "+" + s
    return s.encode()


def _gen_real(rng: random.Random) -> bytes:
    # modest magnitude + 1-4 decimals: both Rust {:?} and Python repr
    # print shortest-roundtrip WITHOUT exponents in this range
    whole = rng.randint(0, 9999)
    frac = rng.randint(0, 9999)
    digits = rng.randint(1, 4)
    s = f"{whole}.{str(frac).zfill(4)[:digits]}"
    if rng.random() < 0.4:
        s = "-" + s
    return s.encode()


def _gen_atom(rng: random.Random) -> bytes:
    r = rng.random()
    if r < 0.25:
        return _gen_int(rng)
    if r < 0.4:
        return _gen_real(rng)
    if r < 0.55:
        return _gen_name(rng)
    if r < 0.7:
        return _gen_litstr(rng)
    if r < 0.8:
        return _gen_hexstr(rng)
    if r < 0.87:
        return rng.choice([b"true", b"false", b"null"])
    return b"%d %d R" % (rng.randint(1, 999), rng.randint(0, 9))


def _gen_obj(rng: random.Random, depth: int = 0) -> bytes:
    r = rng.random()
    if depth >= 3 or r < 0.5:
        return _gen_atom(rng)
    if r < 0.75:
        items = [_gen_obj(rng, depth + 1)
                 for _ in range(rng.randint(0, 5))]
        body = _ws(rng).join(items)
        return b"[" + _ws(rng) + body + _ws(rng) + b"]"
    pairs = []
    keys: set[bytes] = set()
    for _ in range(rng.randint(0, 4)):
        k = _gen_name(rng)
        if k in keys:                   # unique keys: dup-key merge
            continue                    # semantics not under test here
        keys.add(k)
        pairs.append(k + _ws(rng) + _gen_obj(rng, depth + 1))
    return b"<<" + _ws(rng) + _ws(rng).join(pairs) + _ws(rng) + b">>"


def _gen_indirect(rng: random.Random) -> bytes:
    num = rng.randint(1, 999)
    gen = rng.choice([0, 0, 0, rng.randint(0, 9)])
    body = _gen_obj(rng)
    if rng.random() < 0.25:
        # stream object: dict content + raw data after the keyword
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
        d = (b"<< /Length " + str(len(data)).encode() + b" >>")
        return (b"%d %d obj" % (num, gen) + _ws(rng) + d + _ws(rng)
                + b"stream\n" + data + b"\nendstream" + _ws(rng)
                + b"endobj")
    return (b"%d %d obj" % (num, gen) + _ws(rng) + body + _ws(rng)
            + b"endobj")


# --------------------------------------------------------------- layers

N_OBJ_SEEDS = 300
N_IND_SEEDS = 150
N_DOC_SEEDS = 60


@pytest.mark.parametrize("seed", range(N_OBJ_SEEDS),
                         ids=[f"s{i:03d}" for i in range(N_OBJ_SEEDS)])
def test_fuzz_object_and_token_parity(ref_harness, tmp_path, seed):
    rng = random.Random(0xC0511E + seed)
    snippet = _gen_obj(rng)
    got_ref = _run(ref_harness, "tokens", snippet, tmp_path)
    assert not got_ref.startswith("LEX_ERROR"), (snippet, got_ref)
    # rstrip both sides: an empty str/hexstr payload leaves a trailing
    # space that _run's stdout strip() eats on the ref side only
    ref_lines = [ln.rstrip() for ln in got_ref.splitlines()
                 if " eol" not in ln]
    assert [ln.rstrip() for ln in py_token_lines(snippet)] == ref_lines, \
        snippet

    got_obj = _run(ref_harness, "object", snippet, tmp_path)
    assert not got_obj.startswith("PARSE_ERROR"), (snippet, got_obj)
    assert py_canon(cos.Parser(snippet).parse()) == got_obj, snippet


@pytest.mark.parametrize("seed", range(N_IND_SEEDS),
                         ids=[f"i{i:03d}" for i in range(N_IND_SEEDS)])
def test_fuzz_indirect_object_parity(ref_harness, tmp_path, seed):
    rng = random.Random(0x1D0B7 + seed)
    snippet = _gen_indirect(rng)
    got_obj = _run(ref_harness, "object", snippet, tmp_path)
    assert not got_obj.startswith("PARSE_ERROR"), (snippet, got_obj)
    assert py_canon(cos.Parser(snippet).parse()) == got_obj, snippet
    # the fused fast path must agree wherever it takes over
    assert py_canon(cos.parse_object_at(snippet, 0)) == got_obj, snippet


# ------------------------------------------------------- whole documents

def _gen_doc(rng: random.Random) -> bytes:
    """Random page tree inside the reference's whole-document envelope:
    classic single-subsection xref, /Root catalog, nested /Pages nodes
    (preorder DFS per src/page_tree.rs:60-133), shuffled object
    numbering so xref offsets and walk order decouple."""
    n_pages = rng.randint(1, 8)
    # random tree: each internal node gets 1-3 children
    leaves = list(range(n_pages))
    nodes: list[tuple[int, list]] = []   # (node_key, children keys)

    def build(children: list) -> int:
        key = len(nodes) + 1000
        nodes.append((key, children))
        return key

    work: list[int] = leaves[:]
    while len(work) > 1:
        take = min(len(work), rng.randint(1, 3))
        group, work = work[:take], work[take:]
        work.append(build(group))
    root_key = work[0] if nodes else build(leaves[:1])
    if root_key < 1000:                  # single page: wrap in a node
        root_key = build([root_key])

    # object numbering: shuffled, gen 0, numbers 1..N contiguous
    keys = ([root_key] + [k for k, _ in nodes if k != root_key]
            + [f"page{i}" for i in range(n_pages)]
            + [f"content{i}" for i in range(n_pages)]
            + ["catalog", "font"])
    numbers = list(range(1, len(keys) + 1))
    rng.shuffle(numbers)
    num = dict(zip(keys, numbers))

    b = fixtures.PdfBuilder()
    b.add(num["catalog"],
          b"<</Type /Catalog /Pages %d 0 R>>" % num[root_key])
    b.add(num["font"],
          b"<</Type /Font /Subtype /Type1 /BaseFont /Helvetica>>")
    parent_of: dict[object, int] = {}
    for k, children in nodes:
        for c in children:
            parent_of[c] = k
    for k, children in nodes:
        kid_refs = b" ".join(
            b"%d 0 R" % num[c if c >= 1000 else f"page{c}"]
            if isinstance(c, int) else b"%d 0 R" % num[c]
            for c in children)
        extra = b""
        if k == root_key or rng.random() < 0.5:
            extra = b" /MediaBox [0 0 612 792] /Resources <</Font <</F1 %d 0 R>>>>" % num["font"]
        parent = (b" /Parent %d 0 R" % num[parent_of[k]]
                  if k in parent_of else b"")
        b.add(num[k], b"<</Type /Pages /Kids [" + kid_refs + b"] /Count "
              + str(len(children)).encode() + parent + extra + b">>")
    for i in range(n_pages):
        text = f"fuzz page {i} seed word{rng.randint(0, 9999)}"
        content = (b"BT /F1 12 Tf 72 720 Td " + fixtures.lit(text)
                   + b" Tj ET")
        if rng.random() < 0.5:
            b.add_stream(num[f"content{i}"], b"/Filter /FlateDecode",
                         zlib.compress(content))
        else:
            b.add_stream(num[f"content{i}"], b"", content)
        b.add(num[f"page{i}"],
              b"<</Type /Page /Parent %d 0 R /Contents %d 0 R>>"
              % (num[parent_of[i]], num[f"content{i}"]))
    return b.build(root=num["catalog"])


@pytest.mark.parametrize("seed", range(N_DOC_SEEDS),
                         ids=[f"d{i:03d}" for i in range(N_DOC_SEEDS)])
def test_fuzz_doc_parity(ref_harness, tmp_path, seed):
    rng = random.Random(0xD0C5 + seed)
    buf = _gen_doc(rng)
    got_ref = _run(ref_harness, "doc", buf, tmp_path)
    assert "ERROR" not in got_ref.splitlines()[0], got_ref
    assert py_doc_dump(buf) == got_ref


# ------------------------------------------------- raw_byte combinators

# Envelope that makes the reference's naive restart-on-mismatch search
# (src/raw_byte.rs:7-48, quirk 3: `ab` in `aab` missed at 1) equivalent
# to correct search, so find/rfind-backed kernel output must agree:
# needles use DISTINCT chars from an alphabet disjoint from the filler,
# and occurrences are spliced in whole.  Then needle[0] appears only at
# true match starts, no partial match ever mismatches mid-needle, and
# both scan directions degrade to the correct result.
_NEEDLE_ALPHA = b"ABCDEFGH"
_FILLER_ALPHA = b"wxyz 0123.,;"          # disjoint from _NEEDLE_ALPHA


def _gen_rawbyte_case(rng: random.Random) -> tuple[bytes, bytes]:
    if rng.random() < 0.06:
        needle = b""                     # empty-target edge semantics
    else:
        k = rng.randint(1, 4)
        needle = bytes(rng.sample(list(_NEEDLE_ALPHA), k))
    chunks = []
    for _ in range(rng.randint(0, 6)):
        m = rng.randint(0, 10)
        piece = bytes(rng.choice(_FILLER_ALPHA) for _ in range(m))
        if rng.random() < 0.35:
            piece += rng.choice([b"\n", b"\r", b"\r\n", b"\r\r\n"])
        chunks.append(piece)
    # occurrences go BETWEEN chunks, never inside one: splicing into an
    # earlier occurrence would split it into needle-char fragments that
    # re-enable the naive search's partial-match miss
    if needle:
        for _ in range(rng.randint(0, 3)):
            chunks.insert(rng.randint(0, len(chunks)), needle)
    return b"".join(chunks), needle


def py_rawbyte_lines(buf: bytes, needle: bytes) -> list[str]:
    from pdf_parser_spark.kernel import rawbytes as rb

    def fmt(name, r):
        return f"{name} NONE" if r is None else f"{name} {r.hex()}"

    lines = [
        fmt("extract_from", rb.extract_from(buf, needle)),
        fmt("cut_from", rb.cut_from(buf, needle)),
        fmt("extract_after", rb.extract_after(buf, needle)),
        fmt("cut_after", rb.cut_after(buf, needle)),
        fmt("extract_tail_from", rb.extract_tail_from(buf, needle)),
        fmt("cut_tail_from", rb.cut_tail_from(buf, needle)),
        fmt("extract_tail_after", rb.extract_tail_after(buf, needle)),
        fmt("cut_tail_after", rb.cut_tail_after(buf, needle)),
        fmt("extract_after_eol", rb.extract_after_eol(buf)),
        fmt("cut_after_eol", rb.cut_after_eol(buf)),
    ]
    # extract_from_eol (src/raw_byte.rs:98-104) has no kernel caller;
    # mirror it from first_eol_index for harness parity
    hit = rb.first_eol_index(buf)
    lines.append(fmt("extract_from_eol",
                     None if hit is None else buf[hit[0]:]))
    return lines


N_RB_SEEDS = 120


@pytest.mark.parametrize("seed", range(N_RB_SEEDS),
                         ids=[f"r{i:03d}" for i in range(N_RB_SEEDS)])
def test_fuzz_rawbyte_parity(ref_harness, tmp_path, seed):
    rng = random.Random(0x4AB17E + seed)
    buf, needle = _gen_rawbyte_case(rng)
    got_ref = _run(ref_harness, "rawbyte", buf, tmp_path,
                   extra=needle.hex())
    ref_lines = [ln.rstrip() for ln in got_ref.splitlines()]
    py_lines = [ln.rstrip() for ln in py_rawbyte_lines(buf, needle)]
    assert py_lines == ref_lines, (buf, needle)
