// Differential-parity harness: compiles the reference engine's
// dependency-free core modules (lexer, parser, object model, xref,
// trailer, raw_byte) straight from /root/reference/src via #[path]
// includes and drives them over fixture files, printing a canonical
// text serialization that tests/test_reference_differential.py compares
// against the pdf_parser_spark Python kernel's output on the same bytes.
//
// This file is harness driver code written for pdf_parser_spark; the
// reference sources are included read-only (the pytest builds a symlink
// tree pointing at /root/reference/src and drops this file in as
// main.rs -- #[path] includes don't work because a #[path] module's
// submodules resolve against the parent directory, so trailer's
// `mod error` would grab the crate-level error.rs). Modules that need
// external crates (header: regex; image/page/page_tree: flate2,
// jpeg-decoder, image) are excluded -- the sandbox has no crate
// registry -- so the harness covers the byte->token->object->xref->
// trailer pipeline (ref src/lexer.rs, src/parser.rs, src/object.rs,
// src/cross_reference.rs, src/trailer.rs) and re-drives the page-tree
// walk order of src/page_tree.rs:60-133 with harness-local code.
//
// Commands:
//   ref_harness tokens <file>   one canonical token per line
//   ref_harness object <file>   canonical parse of buffer as one object
//   ref_harness doc <file>      trailer + xref entries + objects + page order
//   ref_harness rawbyte <file> <hex-needle>
//                               every raw_byte combinator over the buffer
#![allow(warnings)]

mod raw_byte;
mod lexer;
mod parser;
mod object;
mod cross_reference;
mod trailer;
mod util;

use std::fs::File;
use std::io::Read;
use std::panic::{self, AssertUnwindSafe};

use lexer::{Lexer, TokenContent};
use object::PdfObject;
use parser::Object;

fn hex(bytes: &[u8]) -> String {
    bytes.iter().map(|b| format!("{:02x}", b)).collect()
}

// PdfString's payload is private; recover it from the derived Debug
// representation ("PdfString { payload: [104, 105], byte_offset: 12 }").
fn debug_payload_bytes(dbg: &str) -> Vec<u8> {
    let start = dbg.find('[').expect("payload open bracket");
    let end = dbg.find(']').expect("payload close bracket");
    let inner = &dbg[start + 1..end];
    if inner.trim().is_empty() {
        return vec![];
    }
    inner
        .split(',')
        .map(|t| t.trim().parse::<u8>().expect("payload byte"))
        .collect()
}

fn token_line(tc: &TokenContent, off: u64) -> String {
    match tc {
        TokenContent::Eol => format!("{} eol", off),
        TokenContent::Boolean(b) => format!("{} bool {}", off, b),
        TokenContent::Integer(i) => format!("{} int {}", off, i),
        TokenContent::Real(r) => format!("{} real {:?}", off, r),
        TokenContent::HexStr(v) => format!("{} hexstr {}", off, hex(v)),
        TokenContent::String(v) => format!("{} str {}", off, hex(v)),
        TokenContent::Name(n) => format!("{} name {}", off, n),
        TokenContent::DictStart => format!("{} dict_start", off),
        TokenContent::DictEnd => format!("{} dict_end", off),
        TokenContent::ArrayStart => format!("{} arr_start", off),
        TokenContent::ArrayEnd => format!("{} arr_end", off),
        TokenContent::Null => format!("{} null", off),
        TokenContent::IndirectRef(n, g) => format!("{} ind_ref {} {}", off, n, g),
        TokenContent::IndirectObjStart(n, g) => {
            format!("{} ind_obj_start {} {}", off, n, g)
        }
        TokenContent::IndirectObjEnd => format!("{} ind_obj_end", off),
        TokenContent::StreamObjStart(s) => format!("{} stream_start {}", off, s),
    }
}

fn canon(obj: &Object) -> String {
    match obj {
        Object::Boolean(o) => format!("b:{}@{}", o.unpack(), obj.byte_offset()),
        Object::Integer(o) => format!("i:{}@{}", o.unpack(), obj.byte_offset()),
        Object::Real(o) => format!("r:{:?}@{}", o.unpack(), obj.byte_offset()),
        Object::Name(o) => format!("n:{}@{}", o.as_str(), obj.byte_offset()),
        Object::String(o) => {
            let payload = debug_payload_bytes(&format!("{:?}", o));
            format!("s:{}@{}", hex(&payload), obj.byte_offset())
        }
        Object::Null(_) => format!("null@{}", obj.byte_offset()),
        Object::IndirectRef(o) => {
            let (n, g) = o.unpack();
            format!("ref:{},{}@{}", n, g, obj.byte_offset())
        }
        Object::Array(o) => {
            let items: Vec<String> = o.into_iter().map(canon).collect();
            format!("arr:[{}]@{}", items.join(","), obj.byte_offset())
        }
        Object::Dict(o) => canon_dict(o, obj.byte_offset()),
        Object::IndirectObj(o) => {
            format!("iobj:({})@{}", canon(o.get_object()), obj.byte_offset())
        }
        Object::StreamObj(o) => {
            // PdfStreamObj.byte_offset is the stream DATA start
            // (ref src/object.rs:530 reads data from self.byte_offset)
            format!("stream:{}@{}", canon_dict(&o.dict, o.dict.byte_offset()), obj.byte_offset())
        }
    }
}

fn canon_dict(d: &object::PdfDict, off: u64) -> String {
    let mut pairs: Vec<(String, String)> = d
        .iter()
        .map(|(k, v)| (k.clone(), canon(v)))
        .collect();
    pairs.sort();
    let body: Vec<String> = pairs
        .into_iter()
        .map(|(k, v)| format!("/{}={}", k, v))
        .collect();
    format!("dict:{{{}}}@{}", body.join(","), off)
}

fn read_all(path: &str) -> Vec<u8> {
    let mut f = File::open(path).expect("open fixture");
    let mut buf = vec![];
    f.read_to_end(&mut buf).expect("read fixture");
    buf
}

fn cmd_tokens(path: &str) {
    let buf = read_all(path);
    let mut lx = Lexer::new(&buf, 0);
    match lx.tokenize() {
        Ok(()) => {
            for t in &lx.token_vec {
                println!("{}", token_line(t.content(), t.byte_offset));
            }
        }
        Err(e) => println!("LEX_ERROR {}", e),
    }
}

fn cmd_object(path: &str) {
    let buf = read_all(path);
    match parser::Parser::new(&buf, 0) {
        Ok(mut p) => match p.parse() {
            Ok(obj) => println!("{}", canon(&obj)),
            Err(e) => println!("PARSE_ERROR {}", e),
        },
        Err(e) => println!("PARSE_ERROR {}", e),
    }
}

// Fetch object n (generation g) and return it, or None on any failure.
fn fetch(
    file: &mut File,
    xref: &cross_reference::XRef,
    n: usize,
    g: usize,
) -> Option<Object> {
    let r = object::PdfIndirectRef::new(n, g, 0);
    let got = panic::catch_unwind(AssertUnwindSafe(|| {
        let mut f = file.try_clone().expect("clone file handle");
        r.get_indirect_obj(&mut f, xref)
    }));
    match got {
        Ok(Ok(obj)) => Some(obj),
        _ => None,
    }
}

fn inner_dict<'a>(obj: &'a Object) -> Option<&'a object::PdfDict> {
    let inner = match obj {
        Object::IndirectObj(io) => io.get_object(),
        other => other,
    };
    match inner {
        Object::Dict(d) => Some(d),
        Object::StreamObj(s) => Some(&s.dict),
        _ => None,
    }
}

// Preorder page walk mirroring src/page_tree.rs:60-133: for each kid in
// /Kids order, a /Type /Page node is a leaf, a /Type /Pages node
// recurses. Prints page object numbers in document page order.
fn walk_pages(
    file: &mut File,
    xref: &cross_reference::XRef,
    node_ref: (usize, usize),
    out: &mut Vec<usize>,
) {
    let obj = match fetch(file, xref, node_ref.0, node_ref.1) {
        Some(o) => o,
        None => return,
    };
    let dict = match inner_dict(&obj) {
        Some(d) => d,
        None => return,
    };
    let is_page = match dict.get("Type") {
        Some(Object::Name(n)) => n.as_str() == "Page",
        _ => false,
    };
    if is_page {
        out.push(node_ref.0);
        return;
    }
    if let Some(Object::Array(kids)) = dict.get("Kids") {
        let kid_refs: Vec<(usize, usize)> = kids
            .into_iter()
            .filter_map(|k| match k {
                Object::IndirectRef(r) => Some(r.unpack()),
                _ => None,
            })
            .collect();
        for kr in kid_refs {
            walk_pages(file, xref, kr, out);
        }
    }
}

fn cmd_doc(path: &str) {
    let mut file = File::open(path).expect("open fixture");
    let filesize = file.metadata().expect("stat").len();

    let tr = match trailer::parse_trailer(&mut file, filesize) {
        Ok(t) => t,
        Err(e) => {
            println!("TRAILER_ERROR {}", e);
            return;
        }
    };
    let root = tr.get_root_catalog_ref();
    let (rn, rg) = root.unpack();
    println!("trailer xref_start={} root={},{}", tr.xref_start_offset, rn, rg);

    let xref = match cross_reference::XRef::new(&mut file, tr.xref_start_offset) {
        Ok(x) => x,
        Err(e) => {
            println!("XREF_ERROR {}", e);
            return;
        }
    };

    // Enumerate resolvable objects. get_byte_offset panics on free
    // entries (src/cross_reference.rs:165) and PdfIndirectRef::new
    // rejects object number 0 (src/object.rs:315) -- catch/skip,
    // matching the reference's effective behavior of never fetching
    // free entries.
    for n in 1..512usize {
        let r = object::PdfIndirectRef::new(n, 0, 0);
        let off = panic::catch_unwind(AssertUnwindSafe(|| {
            let mut f = file.try_clone().expect("clone file handle");
            xref.get_byte_offset(&mut f, &r)
        }));
        if let Ok(Ok(off)) = off {
            println!("xref {} -> {}", n, off);
            if let Some(obj) = fetch(&mut file, &xref, n, 0) {
                println!("obj {} {}", n, canon(&obj));
            } else {
                println!("obj {} FETCH_ERROR", n);
            }
        }
    }

    // Catalog -> /Pages -> preorder walk.
    if let Some(cat_obj) = fetch(&mut file, &xref, rn, rg) {
        if let Some(cat) = inner_dict(&cat_obj) {
            if let Some(Object::IndirectRef(pages_ref)) = cat.get("Pages") {
                let mut order = vec![];
                walk_pages(&mut file, &xref, pages_ref.unpack(), &mut order);
                let strs: Vec<String> =
                    order.iter().map(|n| n.to_string()).collect();
                println!("pages {}", strs.join(","));
            }
        }
    }
}

// Drive every public raw_byte combinator (src/raw_byte.rs:82-168) over
// the buffer with one needle; one line per op, payload hex or NONE.
// The needle arrives hex-encoded so arbitrary bytes survive argv.
fn cmd_rawbyte(path: &str, needle_hex: &str) {
    let buf = read_all(path);
    let needle: Vec<u8> = (0..needle_hex.len())
        .step_by(2)
        .map(|i| u8::from_str_radix(&needle_hex[i..i + 2], 16)
            .expect("hex needle"))
        .collect();
    let opt = |name: &str, r: Option<&[u8]>| match r {
        Some(s) => println!("{} {}", name, hex(s)),
        None => println!("{} NONE", name),
    };
    opt("extract_from", raw_byte::extract_from(&buf, &needle));
    opt("cut_from", raw_byte::cut_from(&buf, &needle));
    opt("extract_after", raw_byte::extract_after(&buf, &needle));
    opt("cut_after", raw_byte::cut_after(&buf, &needle));
    opt("extract_tail_from", raw_byte::extract_tail_from(&buf, &needle));
    opt("cut_tail_from", raw_byte::cut_tail_from(&buf, &needle));
    opt("extract_tail_after", raw_byte::extract_tail_after(&buf, &needle));
    opt("cut_tail_after", raw_byte::cut_tail_after(&buf, &needle));
    opt("extract_after_eol", raw_byte::extract_after_eol(&buf));
    opt("cut_after_eol", raw_byte::cut_after_eol(&buf));
    opt("extract_from_eol", raw_byte::extract_from_eol(&buf));
}

fn main() {
    // Route panic messages to stderr (expected free-entry panics are
    // caught by catch_unwind; anything uncaught still aborts loudly).
    panic::set_hook(Box::new(|info| {
        if std::env::var("REF_HARNESS_DEBUG").is_ok() {
            eprintln!("panic: {}", info);
        }
    }));
    let args: Vec<String> = std::env::args().collect();
    if args.len() < 3 {
        eprintln!("usage: ref_harness <tokens|object|doc|rawbyte> <file> [hex-needle]");
        std::process::exit(2);
    }
    // Re-install default-ish behavior only for the command dispatch.
    match args[1].as_str() {
        "tokens" => cmd_tokens(&args[2]),
        "object" => cmd_object(&args[2]),
        "doc" => cmd_doc(&args[2]),
        "rawbyte" => {
            if args.len() != 4 {
                eprintln!("rawbyte needs <file> <hex-needle>");
                std::process::exit(2);
            }
            cmd_rawbyte(&args[2], &args[3]);
        }
        other => {
            eprintln!("unknown command {}", other);
            std::process::exit(2);
        }
    }
}
