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

from .cos import PdfDict, PdfIndirectRef, PdfInteger, PdfName, PdfStreamObj
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
