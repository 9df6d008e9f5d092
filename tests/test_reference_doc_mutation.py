"""Document-level mutation fuzzing against the COMPILED reference.

test_reference_fuzz.py generates random WELL-FORMED documents inside
the shared envelope; this lane attacks from the other side: take the
in-envelope fixture PDFs and apply structured CORRUPTIONS — tail
truncation, a lied xref entry offset, a duplicated object number,
swapped generation numbers — and assert the two engines agree on the
OUTCOME of every mutant:

  * both succeed  -> identical canonical doc dumps (trailer, xref
    entries, fetched objects, page order), with per-object fetch
    failures mirrored as FETCH_ERROR lines exactly like the harness;
  * both fail     -> agreement (the error classes need not match —
    the reference panics where this kernel raises structured errors);
  * one succeeds where the other fails -> allowed ONLY for the
    enumerated, measured deviations below; anything else is a new
    divergence and fails the lane.

Measured deviations this lane pinned (SURVEY.md §2.7.12-§2.7.13):

  * ``ref_hang`` (§2.7.13, REFERENCE BUG, found by this lane) — the
    reference's object fetch NEVER TERMINATES when an xref entry's
    offset does not point at a valid ``N G obj`` header: the adaptive
    buffer-growth loop in src/object.rs:341-373 retries
    ``buf_size += 200`` on every IndirectObjMissMatch/Lexer error
    with no EOF or upper-bound check, so a lied offset (mid-object,
    mid-stream, or past EOF) grows the read window forever. ~58% of
    corrupt-xref-offset mutants hang the compiled reference (>=1s,
    killed by timeout); this kernel raises a structured parse error
    for the same bytes and keeps the document's other objects.
  * ``py_ok_ref_err`` (§2.7.12) — this kernel recovers documents the
    reference rejects (e.g. tail truncations that leave a stale
    ``startxref``+``%%EOF`` pair inside the scan window — §2.7.5
    window semantics; open-time failures the lazy open defers to
    per-object FETCH_ERROR rows).
  * ``ref_ok_py_err`` must stay at ZERO: this kernel is strictly more
    tolerant by design (north_rule: parse_error rows, never aborts).

The asymmetric classes are counted and bounded, not ignored: if the
corpus stops producing them (or produces a NEW asymmetric shape), the
assertions below fail and the envelope note must be re-measured.
"""

from __future__ import annotations

import random
import re
import subprocess

import pytest

from pdf_parser_spark import fixtures
from pdf_parser_spark.kernel import cos, fileparse
from pdf_parser_spark.kernel.doc import PdfDocument
from pdf_parser_spark.kernel.fileparse import XREF_OFFSET

from test_reference_differential import (  # noqa: F401  (fixture import)
    DOC_FIXTURES, py_canon, ref_harness,
)

N_SEEDS_PER_FIXTURE = 95  # 11 fixtures x 95 = 1045 mutants >= 1000


# ------------------------------------------------------------ mutations

_XREF_ROW = re.compile(rb"\d{10} \d{5} n")
_OBJ_HDR = re.compile(rb"(\d+) (\d+) obj\b")


def _mut_truncate_tail(pdf: bytes, rng: random.Random) -> bytes:
    cut = rng.randint(1, max(1, len(pdf) // 2))
    return pdf[:-cut]


def _mut_corrupt_xref_offset(pdf: bytes, rng: random.Random) -> bytes:
    rows = list(_XREF_ROW.finditer(pdf))
    if not rows:
        return pdf
    m = rng.choice(rows)
    old = int(pdf[m.start():m.start() + 10])
    style = rng.randrange(3)
    if style == 0:          # point anywhere in the file
        new = rng.randrange(len(pdf))
    elif style == 1:        # small slide off the true offset
        new = max(0, old + rng.choice([-7, -3, -1, 1, 2, 5, 11]))
    else:                   # past EOF
        new = len(pdf) + rng.randint(1, 999)
    return (pdf[:m.start()] + b"%010d" % new + pdf[m.start() + 10:])


def _mut_duplicate_obj_num(pdf: bytes, rng: random.Random) -> bytes:
    hdrs = list(_OBJ_HDR.finditer(pdf))
    if len(hdrs) < 2:
        return pdf
    victim, donor = rng.sample(hdrs, 2)
    # rewrite the victim's header to the donor's object number,
    # padded to the same byte length so no offset shifts
    old_num = victim.group(1)
    new_num = donor.group(1).rjust(len(old_num), b"0")
    if len(new_num) != len(old_num):
        return pdf
    return (pdf[:victim.start(1)] + new_num + pdf[victim.end(1):])


def _mut_swap_gen(pdf: bytes, rng: random.Random) -> bytes:
    if rng.random() < 0.5:
        # in-body: bump one object header's generation (same length)
        hdrs = [m for m in _OBJ_HDR.finditer(pdf) if m.group(2) == b"0"]
        if not hdrs:
            return pdf
        m = rng.choice(hdrs)
        return pdf[:m.start(2)] + b"9" + pdf[m.end(2):]
    # in-xref: bump one entry's generation field
    rows = list(_XREF_ROW.finditer(pdf))
    if not rows:
        return pdf
    m = rng.choice(rows)
    g0 = m.start() + 11
    return pdf[:g0] + b"00009" + pdf[g0 + 5:]


_MUTATIONS = [_mut_truncate_tail, _mut_corrupt_xref_offset,
              _mut_duplicate_obj_num, _mut_swap_gen]


def mutate(pdf: bytes, rng: random.Random) -> bytes:
    return rng.choice(_MUTATIONS)(pdf, rng)


# ----------------------------------------------------- outcome runners

def ref_doc_outcome(binary: str, payload: bytes, tmp_path) -> tuple[str, str]:
    """(class, dump): class is OK | ERROR | HANG. The harness prints
    TRAILER_ERROR/XREF_ERROR and exits 0 on structured failures;
    uncaught reference panics exit non-zero (also ERROR). HANG is the
    src/object.rs:341-373 unbounded-growth loop (module docstring) —
    a healthy doc dump takes ~5ms, so 1s is a 200x margin."""
    p = tmp_path / "mutant.bin"
    p.write_bytes(payload)
    try:
        r = subprocess.run([binary, "doc", str(p)],
                           capture_output=True, text=True, timeout=1.0)
    except subprocess.TimeoutExpired:
        return "HANG", ""
    if r.returncode != 0:
        return "ERROR", ""
    out = r.stdout.strip()
    for ln in out.splitlines():
        if ln.startswith(("TRAILER_ERROR", "XREF_ERROR")):
            return "ERROR", ""
    return "OK", out


def py_doc_outcome(buf: bytes) -> tuple[str, str]:
    """Python mirror of the harness `doc` command with the SAME
    per-object tolerance: open-time failures -> ERROR; per-object
    fetch/parse failures inside a dump -> FETCH_ERROR lines."""
    try:
        xref_start = fileparse.find_startxref(buf)
        doc = PdfDocument(buf)
    except Exception:
        return "ERROR", ""
    lines = [f"trailer xref_start={xref_start} "
             f"root={doc.root_ref.obj_num},{doc.root_ref.gen_num}"]
    for n in range(1, 512):
        ent = doc.xref.entries.get(n)
        if ent is None:
            continue
        typ, value, gen = ent
        if typ != XREF_OFFSET or gen != 0:
            continue
        lines.append(f"xref {n} -> {value}")
        try:
            obj = cos.parse_object_at(buf, value)
            lines.append(f"obj {n} {py_canon(obj)}")
        except Exception:
            lines.append(f"obj {n} FETCH_ERROR")
    try:
        cat = doc.resolve(doc.root_ref)
    except Exception:
        cat = None
    if isinstance(cat, cos.PdfStreamObj):
        cat = cat.dict
    if isinstance(cat, cos.PdfDict):
        pages_ref = cat.get("Pages")
        if isinstance(pages_ref, cos.PdfIndirectRef):
            order: list[int] = []
            _walk_tolerant(doc, pages_ref, order, set())
            lines.append("pages " + ",".join(str(n) for n in order))
    # .strip() mirrors ref_doc_outcome's stdout handling: a zero-page
    # walk prints "pages " with a trailing space, stripped there too
    return "OK", "\n".join(lines).strip()


def _walk_tolerant(doc: PdfDocument, node_ref: cos.PdfIndirectRef,
                   out: list[int], seen: set[int]) -> None:
    """Harness walk_pages semantics: any fetch failure skips the node.
    A seen-set guards mutation-induced Kids cycles (the reference
    would recurse forever; bounded here so the PYTHON side always
    terminates — if the reference hangs, the subprocess timeout turns
    it into a harness failure we would see)."""
    if node_ref.obj_num in seen:
        return
    seen.add(node_ref.obj_num)
    try:
        node = doc.resolve(node_ref)
    except Exception:
        return
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
                _walk_tolerant(doc, kid, out, seen)


# ----------------------------------------------------------------- lane

@pytest.mark.parametrize("fixture_id", DOC_FIXTURES)
def test_doc_mutation_outcome_agreement(ref_harness, tmp_path, fixture_id):
    """>= 1000 seeded mutants across the fixture corpus; every mutant's
    outcome must agree or fall in the measured deviation class."""
    base, _ = fixtures.get_fixture(fixture_id)
    counts = {"ok_equal": 0, "both_err": 0, "py_ok_ref_err": 0,
              "ref_hang": 0}
    for seed in range(N_SEEDS_PER_FIXTURE):
        # stable per-fixture stream (hash() is process-salted)
        fix_ix = DOC_FIXTURES.index(fixture_id)
        rng = random.Random(0xD0C0 + seed * 1009 + fix_ix * 104729)
        mutant = mutate(base, rng)
        ref_cls, ref_dump = ref_doc_outcome(ref_harness, mutant, tmp_path)
        py_cls, py_dump = py_doc_outcome(mutant)
        key = f"{fixture_id}/seed{seed}"
        if ref_cls == "HANG":
            # pinned reference bug (§2.7.13): the python side must
            # have terminated with SOMETHING (it did, we're here)
            counts["ref_hang"] += 1
        elif ref_cls == "OK" and py_cls == "OK":
            assert py_dump == ref_dump, (
                f"{key}: dumps diverge\nPY:\n{py_dump}\nREF:\n{ref_dump}")
            counts["ok_equal"] += 1
        elif ref_cls == "ERROR" and py_cls == "ERROR":
            counts["both_err"] += 1
        elif py_cls == "OK" and ref_cls == "ERROR":
            # measured deviation: this kernel recovers more (module
            # docstring + SURVEY.md §2.7.12); counted, never hidden
            counts["py_ok_ref_err"] += 1
        else:  # ref OK, python ERROR — a tolerance REGRESSION
            pytest.fail(f"{key}: reference succeeded where the python "
                        f"kernel errored\nREF:\n{ref_dump}")
    # the mutation corpus must actually exercise every interesting
    # outcome shape for this fixture, not just trivially error out
    assert counts["ok_equal"] > 0, counts
    assert counts["both_err"] > 0, counts
    # the pinned reference hang must keep reproducing (it is the
    # lane's headline finding); corrupt-offset mutants trigger it
    assert counts["ref_hang"] > 0, counts


def test_doc_mutation_seed_zero_reproduces(ref_harness, tmp_path):
    """Anchor one concrete mutant per mutation kind so a failure in
    the randomized lane always has a deterministic twin to debug."""
    base, _ = fixtures.get_fixture("pdf-min-text")
    for mut in _MUTATIONS:
        rng = random.Random(7)
        mutant = mut(base, rng)
        ref_cls, ref_dump = ref_doc_outcome(ref_harness, mutant, tmp_path)
        py_cls, py_dump = py_doc_outcome(mutant)
        assert (py_cls == ref_cls and py_dump == ref_dump) \
            or (py_cls == "OK" and ref_cls in ("ERROR", "HANG")) \
            or (py_cls == "ERROR" and ref_cls == "HANG"), \
            (mut.__name__, py_cls, ref_cls)


def test_reference_hang_on_lied_offset_pinned(ref_harness, tmp_path):
    """Deterministic minimal reproducer for §2.7.13: point object 3's
    xref offset into the middle of object 2 — the reference's
    src/object.rs:341-373 growth loop never terminates (no valid
    'N G obj' header will ever appear); this kernel records a
    FETCH_ERROR row and keeps every other object."""
    base, _ = fixtures.get_fixture("pdf-min-text")
    rows = list(_XREF_ROW.finditer(base))
    assert len(rows) >= 3
    m = rows[2]  # object 3's row (rows are 1..N in order)
    target = int(base[rows[1].start():rows[1].start() + 10]) + 4
    mutant = (base[:m.start()] + b"%010d" % target + base[m.start() + 10:])
    ref_cls, _ = ref_doc_outcome(ref_harness, mutant, tmp_path)
    assert ref_cls == "HANG"
    py_cls, py_dump = py_doc_outcome(mutant)
    assert py_cls == "OK"
    assert "obj 3 FETCH_ERROR" in py_dump
    assert "obj 1 " in py_dump and "obj 4 " in py_dump
