"""Byte-slice search/cut combinators.

Parity surface of the reference's ``src/raw_byte.rs:7-168`` (10 slice ops
plus first/last substring match and EOL helpers), implemented on top of
``bytes.find``/``bytes.rfind`` — which also fixes the reference's naive
restart-on-mismatch search that misses overlapping matches
(src/raw_byte.rs:7-26; e.g. target ``ab`` in ``aab`` is missed at 1).

Empty-target edge semantics match the reference's tests exactly
(src/raw_byte/test.rs:37-43, 64-71): ``first_match_index(b, b"") == 0``
and ``last_match_index(b, b"") == len(b)``.

All functions return ``None`` where the reference returns ``None``
(target not found / EOL not found).
"""

from __future__ import annotations


def first_match_index(buffer: bytes, target: bytes) -> int | None:
    """Index of first occurrence of target. Empty target -> 0."""
    if len(target) == 0:
        return 0
    i = buffer.find(target)
    return None if i < 0 else i


def last_match_index(buffer: bytes, target: bytes) -> int | None:
    """Index just *past* the last occurrence start... reference semantics:
    returns the index of the byte AFTER the last occurrence's final byte
    minus len(target)? No — per src/raw_byte/test.rs:56-62 the result for
    target "target" in "... target\r target2 hoge" is 20, the start index
    of the last occurrence. Empty target -> len(buffer)
    (src/raw_byte/test.rs:64-71)."""
    if len(target) == 0:
        return len(buffer)
    i = buffer.rfind(target)
    return None if i < 0 else i


def extract_from(buffer: bytes, target: bytes) -> bytes | None:
    """Slice from the start of the first match to the end (inclusive of
    target). ref src/raw_byte.rs + test.rs:84-99."""
    i = first_match_index(buffer, target)
    return None if i is None else buffer[i:]


def cut_from(buffer: bytes, target: bytes) -> bytes | None:
    """Slice before the first match. ref test.rs:102-117."""
    i = first_match_index(buffer, target)
    return None if i is None else buffer[:i]


def extract_after(buffer: bytes, target: bytes) -> bytes | None:
    """Slice after the first match (exclusive of target). Empty target ->
    whole buffer. ref test.rs:120-135."""
    i = first_match_index(buffer, target)
    if i is None:
        return None
    if len(target) == 0:
        return buffer
    return buffer[i + len(target):]


def cut_after(buffer: bytes, target: bytes) -> bytes | None:
    """Slice up to and including the first match. Empty target -> empty.
    ref test.rs:138-153."""
    i = first_match_index(buffer, target)
    if i is None:
        return None
    if len(target) == 0:
        return b""
    return buffer[: i + len(target)]


def extract_tail_from(buffer: bytes, target: bytes) -> bytes | None:
    """Slice from the start of the *last* match. Empty target -> empty
    (last_match_index == len). ref test.rs:156-171."""
    i = last_match_index(buffer, target)
    return None if i is None else buffer[i:]


def cut_tail_from(buffer: bytes, target: bytes) -> bytes | None:
    """Slice before the last match. Empty target -> whole buffer.
    ref test.rs:174-189."""
    i = last_match_index(buffer, target)
    return None if i is None else buffer[:i]


def extract_tail_after(buffer: bytes, target: bytes) -> bytes | None:
    """Slice after the last match. Empty target -> empty. ref
    test.rs:192-207."""
    i = last_match_index(buffer, target)
    if i is None:
        return None
    return buffer[i + len(target):]


def cut_tail_after(buffer: bytes, target: bytes) -> bytes | None:
    """Slice up to and including the last match. Empty target -> whole
    buffer. ref test.rs:210-225."""
    i = last_match_index(buffer, target)
    if i is None:
        return None
    return buffer[: i + len(target)]


def first_eol_index(buffer: bytes) -> tuple[int, int] | None:
    """(index, eol_length) of the first EOL (LF, CRLF, or bare CR)."""
    for i, b in enumerate(buffer):
        if b == 0x0A:
            return i, 1
        if b == 0x0D:
            if i + 1 < len(buffer) and buffer[i + 1] == 0x0A:
                return i, 2
            return i, 1
    return None


def extract_after_eol(buffer: bytes) -> bytes | None:
    """Slice after the first EOL (LF / CRLF / CR). ref test.rs:4-25:
    a bare CR ends the line by itself (``hoge\\r   \\nfuga`` -> ``   \\nfuga``)."""
    hit = first_eol_index(buffer)
    if hit is None:
        return None
    i, n = hit
    return buffer[i + n:]


def cut_after_eol(buffer: bytes) -> bytes | None:
    """Slice before the first EOL. Used for header-line and xref
    subsection-line isolation (ref src/header.rs:38-41)."""
    hit = first_eol_index(buffer)
    if hit is None:
        return None
    i, _ = hit
    return buffer[:i]
