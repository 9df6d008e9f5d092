"""Image XObject extraction — parity with the reference's only public
pipeline (``PDF::extract_image``).

- Image param extraction  ref src/image.rs:50-83 (Subtype=Image required,
                          natural Width/Height)
- ColorSpace resolve      ref src/image.rs:85-110 (DeviceRGB | DeviceGray,
                          possibly via indirect ref)
- Filter resolve          ref src/image.rs:112-130 (reference honors only
                          element 0 of a /Filter array — we use the chain)
- Flate decode + raster   ref src/image.rs:132-161 (Gray expanded to RGB,
                          matching ``into_rgb8()``)
- SMask anti-join         ref src/page.rs:51-74: pass 1 collects /SMask
                          refs of page XObjects, pass 2 decodes every
                          XObject NOT in the SMask set
- DCT (JPEG) raster decode   ref src/image.rs:140-143: baseline,
  extended-sequential and progressive JPEG decoded to raster by the
  in-repo pure-Python codec (kernel/jpegdec.py, T.81 Huffman modes
  from the public spec), then the same Gray->RGB expansion as
  ``into_rgb8()``. Arithmetic-coded/corrupt JPEGs fall back to byte
  passthrough (``format='jpeg'``) where the reference would panic.

Deviation (SURVEY.md §2.7.4): images are returned in name-sorted XObject
order — deterministic — where the reference iterates a HashMap.
"""

from __future__ import annotations

from dataclasses import dataclass

from .cos import (
    TK_ARR_END, TK_ARR_START, TK_BOOL, TK_INLINE_DATA, TK_INT, TK_NAME,
    TK_OP, TK_REAL, PdfDict, PdfIndirectRef, PdfInteger, PdfName,
    PdfStreamObj, tokenize,
)
from .fileparse import PdfStructureError
from .jpegdec import JpegError, decode_baseline_jpeg


class ImageError(ValueError):
    pass


@dataclass
class ExtractedImage:
    page: int
    name: str            # XObject resource name (sort key)
    width: int
    height: int
    colorspace: str      # DeviceRGB | DeviceGray
    format: str          # 'raw-rgb' (decoded 3-byte pixels) | 'jpeg'
    data: bytes


def _image_params(doc, xobj: PdfStreamObj) -> tuple[int, int, str, str]:
    """ref src/image.rs:50-130."""
    d = xobj.dict
    subtype = d.get("Subtype")
    if not (isinstance(subtype, PdfName) and subtype.value == "Image"):
        raise ImageError("subtype is not image")  # ref src/page.rs:77-86
    width = doc.resolve(d.get("Width"))
    height = doc.resolve(d.get("Height"))
    if not (isinstance(width, PdfInteger) and width.value > 0):
        raise ImageError("bad /Width")
    if not (isinstance(height, PdfInteger) and height.value > 0):
        raise ImageError("bad /Height")
    cs = doc.resolve(d.get("ColorSpace"))  # ref src/image.rs:85-110
    if not isinstance(cs, PdfName) or cs.value not in ("DeviceRGB",
                                                       "DeviceGray"):
        raise ImageError("colorspace is not supported")
    filt = doc.resolve(d.get("Filter"))  # ref src/image.rs:112-130
    if isinstance(filt, PdfName):
        fname = filt.value
    elif filt is not None and len(filt) > 0:
        f0 = doc.resolve(filt[0])
        fname = f0.value if isinstance(f0, PdfName) else ""
    else:
        raise ImageError("filter is not supported")
    if fname not in ("FlateDecode", "DCTDecode"):
        raise ImageError("filter is not supported")
    return width.value, height.value, cs.value, fname


def extract_page_images(doc, page) -> list[ExtractedImage]:
    """ref src/page.rs:51-74 two-pass SMask exclusion, then decode."""
    smask_nums: set[int] = set()
    xobjs: list[tuple[str, PdfStreamObj]] = []
    for name, ref in page.xobject_refs:
        obj = doc.resolve(ref)
        if not isinstance(obj, PdfStreamObj):
            raise ImageError("xobject is not a stream")
        xobjs.append((name, obj))
        sm = obj.dict.get("SMask")  # ref src/page.rs:106-120
        if isinstance(sm, PdfIndirectRef):
            smask_nums.add(sm.obj_num)

    images: list[ExtractedImage] = []
    for name, obj in xobjs:
        if obj.obj_num in smask_nums:
            continue  # anti-join (ref src/page.rs:66-71)
        w, h, cs, fname = _image_params(doc, obj)
        if fname == "FlateDecode":
            raw = doc.stream_data(obj)  # full chain incl. predictors
            ncomp = 3 if cs == "DeviceRGB" else 1
            expected = w * h * ncomp
            if len(raw) < expected:
                raise ImageError("image raster truncated")
            raw = raw[:expected]
            if cs == "DeviceGray":
                # Gray -> RGB expansion (ref src/image.rs:146-160
                # into_rgb8 semantics)
                raw = bytes(b for px in raw for b in (px, px, px))
            images.append(ExtractedImage(page.page_number, name, w, h, cs,
                                         "raw-rgb", raw))
        else:  # DCTDecode: baseline JPEG raster decode (ref
            # src/image.rs:140-143 jpeg_decoder::Decoder), then the
            # same Gray->RGB expansion as into_rgb8()
            data = doc.stream_raw(obj)
            try:
                jw, jh, ncomp, px = decode_baseline_jpeg(data)
                if (jw, jh) != (w, h):
                    # dict lies about dimensions (stale /Width from a
                    # generator that scales via cm): treat like any
                    # other undecodable-for-us JPEG
                    raise JpegError("dims disagree with /Width /Height")
            except JpegError:
                # arithmetic-coded / corrupt / dim-mismatched JPEG:
                # keep the bytes so the sink can persist them — the
                # reference panics here (unwrap), we degrade gracefully
                # and NEVER abort the document's text extraction
                images.append(ExtractedImage(page.page_number, name, w,
                                             h, cs, "jpeg", data))
                continue
            if ncomp == 1:
                px = bytes(b for p in px for b in (p, p, p))
            images.append(ExtractedImage(page.page_number, name, w, h, cs,
                                         "raw-rgb", px))
    return images


# ------------------------------------------------ inline images (BI/ID/EI)
# [EXTENSION] the reference ignores inline images entirely (its content
# handling never reaches §8.9.7); real-world PDFs carry masks/logos
# inline, so they flow through the same D1-D6 assembly here.

# §8.9.7 abbreviated dict keys / values
_INLINE_KEY = {"W": "Width", "H": "Height", "CS": "ColorSpace",
               "F": "Filter", "BPC": "BitsPerComponent", "D": "Decode",
               "DP": "DecodeParms", "IM": "ImageMask", "I": "Interpolate",
               "L": "Length"}
_INLINE_CS = {"G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK",
              "I": "Indexed"}
_INLINE_FILTER = {"AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
                  "LZW": "LZWDecode", "Fl": "FlateDecode",
                  "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
                  "DCT": "DCTDecode"}


def _parse_inline_value(toks, i):
    """One inline-dict value starting at token i: scalar or flat array.
    Returns (value, next_i); value is a python scalar or list.

    Never raises and never consumes the TK_INLINE_DATA token: a
    truncated dict (``... BI /W`` at end of stream) returns with
    ``i == len(toks)``, and a key with no value right before ID
    (``/W ID ...``) returns WITHOUT advancing so the caller's loop
    still sees the data token and attributes it to this BI — not the
    next image's."""
    if i >= len(toks):
        return None, i
    t = toks[i]
    if t.kind == TK_INLINE_DATA:
        return None, i
    if t.kind == TK_ARR_START:
        arr = []
        i += 1
        while i < len(toks) and toks[i].kind != TK_ARR_END:
            arr.append(toks[i].value)
            i += 1
        return arr, i + 1
    if t.kind in (TK_INT, TK_REAL, TK_NAME, TK_BOOL):
        return t.value, i + 1
    return None, i + 1


def _assemble_inline(params: dict, data: bytes, page_number: int,
                     name: str) -> ExtractedImage | None:
    """D1-D6 over an inline image dict; returns None for shapes outside
    the supported envelope (never aborts the page: text extraction and
    XObject images must survive any inline payload)."""
    w, h = params.get("Width"), params.get("Height")
    if not (isinstance(w, int) and isinstance(h, int) and w > 0 and h > 0):
        return None
    if params.get("ImageMask") is True:
        return None  # stencil masks are not rasters
    if params.get("BitsPerComponent", 8) != 8:
        return None
    cs = params.get("ColorSpace")
    cs = _INLINE_CS.get(cs, cs)
    if cs not in ("DeviceRGB", "DeviceGray"):
        return None
    filters = params.get("Filter") or []
    if isinstance(filters, str):
        filters = [filters]
    filters = [_INLINE_FILTER.get(f, f) for f in filters]

    from .filters import ascii_hex_decode, flate_decode

    # supported chains: none | [AHx] | [Fl] | [AHx, Fl] | [DCT] |
    # [AHx, DCT] — the classic inline envelope; anything else skipped
    try:
        if filters and filters[0] == "ASCIIHexDecode":
            data = ascii_hex_decode(data)
            filters = filters[1:]
        if filters == ["FlateDecode"]:
            data = flate_decode(data, None)
            filters = []
        if filters == ["DCTDecode"]:
            jw, jh, ncomp, px = decode_baseline_jpeg(data)
            if (jw, jh) != (w, h):
                return None
            if ncomp == 1:
                px = bytes(b for p in px for b in (p, p, p))
            return ExtractedImage(page_number, name, w, h, cs,
                                  "raw-rgb", px)
        if filters:
            return None
    except (JpegError, ValueError, OSError):
        return None

    ncomp = 3 if cs == "DeviceRGB" else 1
    expected = w * h * ncomp
    if len(data) < expected:
        return None
    raw = data[:expected]
    if cs == "DeviceGray":
        raw = bytes(b for px_ in raw for b in (px_, px_, px_))
    return ExtractedImage(page_number, name, w, h, cs, "raw-rgb", raw)


def extract_inline_images(doc, page) -> list[ExtractedImage]:
    """BI..ID..EI images from a page's content streams, through the
    same param/colorspace/filter/raster path as XObjects. Names are
    ``BI1``, ``BI2``, ... in content order (XObject names never start
    with an operator prefix in the fixture corpus; a real collision
    would only affect display names, not parity)."""
    content = doc.page_content_bytes(page)
    if b"BI" not in content:
        return []
    try:
        toks = tokenize(content, 0, content_mode=True)
    except Exception:
        return []  # malformed content already surfaces via text path
    images: list[ExtractedImage] = []
    n_inline = 0
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if t.kind == TK_OP and t.value == "BI":
            params: dict = {}
            i += 1
            while i < n and toks[i].kind != TK_INLINE_DATA:
                if toks[i].kind == TK_NAME:
                    key = toks[i].value
                    val, i = _parse_inline_value(toks, i + 1)
                    params[_INLINE_KEY.get(key, key)] = val
                else:
                    i += 1
            if i >= n:
                break
            d0, d1 = toks[i].value
            n_inline += 1
            img = _assemble_inline(params, content[d0:d1],
                                   page.page_number, f"BI{n_inline}")
            if img is not None:
                images.append(img)
        i += 1
    return images
