"""PDF stream decode filters.

The reference implements exactly FlateDecode (zlib inflate,
src/image.rs:134-139) and DCTDecode (JPEG, src/image.rs:140-143), and
honors only element 0 of a /Filter array (src/image.rs:116-123 — flagged
SURVEY.md §2.7.9). This module implements the full *chain* semantics plus
the [EXTENSION] filters the north_star requires: LZWDecode (PDF 32000-1
§7.4.4), PNG/TIFF predictors (§7.4.4.4), ASCIIHexDecode (§7.4.2),
ASCII85Decode (§7.4.3), and RunLengthDecode (§7.4.5). DCTDecode is a
passthrough at the byte level (JPEG raster decode is gated in images.py).
"""

from __future__ import annotations

import zlib


class FilterError(ValueError):
    pass


# ------------------------------------------------------------ predictors

def _apply_png_predictor(data: bytes, colors: int, bpc: int,
                         columns: int) -> bytes:
    """Reverse PNG row predictors (PDF 32000-1 §7.4.4.4 / RFC 2083 §6)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    row_len = (colors * bpc * columns + 7) // 8
    stride = row_len + 1
    if len(data) % stride != 0:
        # tolerate ragged tail: process whole rows only
        data = data[: (len(data) // stride) * stride]
    out = bytearray()
    prev = bytearray(row_len)
    for r in range(0, len(data), stride):
        ft = data[r]
        row = bytearray(data[r + 1:r + stride])
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise FilterError(f"unknown PNG predictor row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _apply_tiff_predictor(data: bytes, colors: int, bpc: int,
                          columns: int) -> bytes:
    """TIFF predictor 2 (horizontal differencing), 8-bit samples only."""
    if bpc != 8:
        raise FilterError("TIFF predictor only supports 8-bit samples")
    row_len = colors * columns
    out = bytearray(data)
    for r in range(0, len(out) - row_len + 1, row_len):
        for i in range(colors, row_len):
            out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
    return bytes(out)


def apply_predictor(data: bytes, parms: dict | None) -> bytes:
    if not parms:
        return data
    predictor = int(parms.get("Predictor", 1))
    if predictor <= 1:
        return data
    colors = int(parms.get("Colors", 1))
    bpc = int(parms.get("BitsPerComponent", 8))
    columns = int(parms.get("Columns", 1))
    if predictor == 2:
        return _apply_tiff_predictor(data, colors, bpc, columns)
    if 10 <= predictor <= 15:
        return _apply_png_predictor(data, colors, bpc, columns)
    raise FilterError(f"unknown predictor {predictor}")


# --------------------------------------------------------------- filters

def flate_decode(data: bytes, parms: dict | None = None) -> bytes:
    """zlib inflate (ref src/image.rs:134-139), tolerant of trailing
    garbage past the zlib stream, then predictor reversal."""
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        d = zlib.decompressobj()
        try:
            raw = d.decompress(data)
        except zlib.error as e:
            # some writers emit raw deflate without the zlib header
            try:
                raw = zlib.decompress(data, wbits=-15)
            except zlib.error:
                raise FilterError(f"flate: {e}") from e
    return apply_predictor(raw, parms)


def lzw_decode(data: bytes, parms: dict | None = None) -> bytes:
    """[EXTENSION] PDF LZW (PDF 32000-1 §7.4.4): 9->12-bit variable codes,
    256=ClearTable, 257=EOD, EarlyChange default 1."""
    early = int((parms or {}).get("EarlyChange", 1))
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= code_width:
            nbits -= code_width
            code = (acc >> nbits) & ((1 << code_width) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                code_width = 9
                prev = None
                continue
            if code == 257:
                return apply_predictor(bytes(out), parms)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise FilterError("lzw: bad code")
            out += entry
            prev = entry
            if len(table) + early - 1 >= (1 << code_width) and code_width < 12:
                code_width += 1
    return apply_predictor(bytes(out), parms)


def ascii_hex_decode(data: bytes, parms: dict | None = None) -> bytes:
    """[EXTENSION] §7.4.2: hex pairs, whitespace ignored, '>' is EOD,
    odd count pads 0 (same pad rule as the COS hex string,
    ref src/lexer.rs:205-209)."""
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    hx = bytes(b for b in data if b not in (0, 9, 10, 12, 13, 32))
    s = hx.decode("ascii")
    if len(s) % 2 == 1:
        s += "0"
    try:
        return bytes.fromhex(s)
    except ValueError as e:
        raise FilterError(f"asciihex: {e}") from e


def ascii85_decode(data: bytes, parms: dict | None = None) -> bytes:
    """[EXTENSION] §7.4.3 (with <~ ~> tolerance and 'z' shorthand)."""
    body = data
    if body.startswith(b"<~"):
        body = body[2:]
    end = body.find(b"~>")
    if end != -1:
        body = body[:end]
    body = bytes(b for b in body if b not in (0, 9, 10, 12, 13, 32))
    out = bytearray()
    group = []
    for b in body:
        if b == 0x7A and not group:  # 'z' -> four zero bytes
            out += b"\0\0\0\0"
            continue
        if not (0x21 <= b <= 0x75):
            raise FilterError("ascii85: byte out of range")
        group.append(b - 0x21)
        if len(group) == 5:
            val = 0
            for g in group:
                val = val * 85 + g
            out += val.to_bytes(4, "big")
            group = []
    if group:
        n = len(group)
        if n == 1:
            raise FilterError("ascii85: single trailing char")
        padded = group + [84] * (5 - n)
        val = 0
        for g in padded:
            val = val * 85 + g
        out += val.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def run_length_decode(data: bytes, parms: dict | None = None) -> bytes:
    """[EXTENSION] §7.4.5."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            out += data[i:i + length + 1]
            i += length + 1
        else:
            if i >= n:
                raise FilterError("runlength: truncated")
            out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


def dct_passthrough(data: bytes, parms: dict | None = None) -> bytes:
    """DCTDecode at the stream level is a passthrough: the bytes ARE the
    JPEG (ref src/image.rs:140-143 hands them to a JPEG decoder; raster
    decode is gated in images.py)."""
    return data


_FILTERS = {
    "FlateDecode": flate_decode, "Fl": flate_decode,
    "LZWDecode": lzw_decode, "LZW": lzw_decode,
    "ASCIIHexDecode": ascii_hex_decode, "AHx": ascii_hex_decode,
    "ASCII85Decode": ascii85_decode, "A85": ascii85_decode,
    "RunLengthDecode": run_length_decode, "RL": run_length_decode,
    "DCTDecode": dct_passthrough, "DCT": dct_passthrough,
    "JPXDecode": dct_passthrough,   # passthrough, like DCT
    "Crypt": dct_passthrough,       # /Identity only; no encryption support
}


def decode_stream(data: bytes, filters: list[str],
                  parms_list: list[dict | None]) -> bytes:
    """Apply a full filter chain in order. The reference honors only
    filters[0] (src/image.rs:116-123); we apply the whole chain
    (SURVEY.md §2.7.9 deviation, spec-correct)."""
    for name, parms in zip(filters, parms_list):
        fn = _FILTERS.get(name)
        if fn is None:
            raise FilterError(f"unsupported filter {name}")
        data = fn(data, parms)
    return data
