"""Pure-Python PDF parsing kernel. No Spark imports allowed here.

This package reimplements (and extends) the document-structure layer of
the reference ``Kotaro7750/pdf_parser``:

- ``rawbytes``  byte-slice combinators     (ref: src/raw_byte.rs)
- ``cos``       COS lexer + parser         (ref: src/lexer.rs, src/parser.rs)
- ``filters``   stream decode filters      (ref: src/image.rs:134-143; LZW/
                predictors are spec extensions)
- ``fileparse`` header/trailer/xref/objstm (ref: src/header.rs, src/trailer.rs,
                src/cross_reference.rs; XRef streams are spec extensions)
- ``doc``       catalog/page tree/streams  (ref: src/lib.rs, src/page_tree.rs)
- ``textops``   content-stream text interpreter (spec extension: PDF 32000-1
                §9; the reference stops at image XObjects)
- ``images``    image decode parity        (ref: src/image.rs, src/page.rs)
- ``extract``   top-level extract_text(pdf_bytes) entry point
"""
