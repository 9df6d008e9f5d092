"""Corruption fuzzing: the kernel must NEVER raise on arbitrary bytes
(north_rule: parse failures become parse_error rows, never job aborts).
Mutations are seeded — failures reproduce exactly."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.fixtures import FIXTURES, get_fixture
from pdf_parser_spark.kernel.extract import extract_text
from pdf_parser_spark.kernel.htmlx import extract_main_text


def _mutate(data: bytes, rng: random.Random) -> bytes:
    buf = bytearray(data)
    op = rng.randrange(4)
    if op == 0 and buf:            # flip random bytes
        for _ in range(rng.randrange(1, 8)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
    elif op == 1 and len(buf) > 2:  # delete a slice
        i = rng.randrange(len(buf) - 1)
        j = min(len(buf), i + rng.randrange(1, 64))
        del buf[i:j]
    elif op == 2:                  # insert junk
        i = rng.randrange(len(buf) + 1)
        buf[i:i] = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 32)))
    else:                          # truncate
        buf = buf[:rng.randrange(len(buf) + 1)]
    return bytes(buf)


def test_pdf_kernel_never_raises_on_corruption():
    rng = random.Random(20260817)
    fids = sorted(FIXTURES)
    for trial in range(400):
        pdf, _g = get_fixture(fids[trial % len(fids)])
        data = _mutate(pdf, rng)
        res = extract_text(data)            # must not raise
        assert isinstance(res["text"], str)
        assert res["bytes"] == len(data)
        # either it parsed or it recorded why not
        assert res["parse_error"] is None or res["parse_error"]


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_kernel_never_raises_on_random_bytes(data):
    res = extract_text(data)
    assert isinstance(res, dict) and isinstance(res["text"], str)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2048))
def test_html_kernel_never_raises_on_random_text(text):
    res = extract_main_text(text)
    assert isinstance(res["text"], str)
