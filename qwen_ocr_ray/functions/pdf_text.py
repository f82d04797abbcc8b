"""Pure-python PDF page counting + embedded-text-layer extraction.

The reference's core input path rasterizes PDFs with poppler at 130 DPI
(``/root/reference/src/pdf_handler.py:44-75``) and counts pages with
pdfinfo (``pdf_handler.py:17-24``). This sandbox has no poppler/PIL, so
rasterization stays stubbed — but text-BEARING PDFs extract through this
module: object-level parsing (xref-free scan), FlateDecode content streams,
and Tj/TJ/' text-showing operators. Covers the minimal-writer output below
plus simple real-world single-font PDFs; layout-heavy PDFs degrade to
line-per-text-op output.

``build_simple_pdf`` is the deterministic generator used by the synthetic
corpus (one Tj per line, Flate-compressed streams, correct xref), so the
golden contract (byte-identical text per url) holds end to end.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)


# --- writer (generator side) --------------------------------------------------

def _escape_pdf_string(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def sanitize_pdf_text(s: str) -> str:
    """The text a PDF round-trip preserves: latin-1 with '?' replacements
    (standard-font PDFs cannot carry arbitrary unicode without CMaps)."""
    return s.encode("latin-1", "replace").decode("latin-1")


def build_simple_pdf(pages: list[list[str]]) -> bytes:
    """Minimal well-formed PDF: one Flate content stream per page, one Tj
    per line, Helvetica, correct xref table."""
    objects: list[bytes] = []  # bodies, object number = index + 1
    n = len(pages)
    font_num = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    for i, lines in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        ops = [b"BT /F1 11 Tf 14 TL 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append(b"T*")
            ops.append(b"(" + _escape_pdf_string(line) + b") Tj")
        ops.append(b"ET")
        stream = zlib.compress(b"\n".join(ops))
        objects.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + stream + b"\nendstream"
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# --- reader (engine side) -----------------------------------------------------

def _parse_objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _stream_bytes(body: bytes) -> bytes | None:
    i = body.find(b"stream")
    if i < 0:
        return None
    start = i + len(b"stream")
    if body[start:start + 2] == b"\r\n":
        start += 2
    elif body[start:start + 1] == b"\n":
        start += 1
    end = body.rfind(b"endstream")
    if end < 0:
        return None
    raw = body[start:end]
    # Stream DATA may legitimately end with 0x0A while the writer omitted the
    # optional newline before 'endstream' — an unconditional strip would
    # truncate it. Disambiguate with the declared /Length when present;
    # otherwise (Flate) try the unstripped slice first and fall back.
    # (?!\d) forces the full number; the trailing lookahead rejects indirect
    # references ('/Length 12 0 R') whose object NUMBER is not a byte length.
    m = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", body[:i])
    declared = int(m.group(1)) if m else None
    if declared is not None and 0 <= len(raw) - declared <= 2:
        raw = raw[:declared]
    elif raw.endswith(b"\n"):
        if b"/FlateDecode" in body[:i]:
            try:
                return zlib.decompress(raw)
            except zlib.error:
                raw = raw[:-1]
        else:
            raw = raw[:-1]
    if b"/FlateDecode" in body[:i]:
        return zlib.decompress(raw)
    return raw


_UNESCAPE = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _read_literal(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF string literal starting at buf[i] == '('; returns
    (unescaped bytes, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _UNESCAPE:
                out += _UNESCAPE[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= buf[i] <= 0x37:
                    oct_digits.append(buf[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if not depth:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _content_text_lines(content: bytes) -> list[str]:
    """Text-showing operators -> lines. Tj and ' each yield a line; a TJ
    array's literal parts concatenate into one line (kerning offsets are
    positioning, not characters)."""
    lines: list[str] = []
    i, n = 0, len(content)
    pending: list[bytes] | None = None  # inside a [...] TJ array
    last_literal: bytes | None = None
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            lit, i = _read_literal(content, i)
            if pending is not None:
                pending.append(lit)
            else:
                last_literal = lit
            continue
        if c == 0x5B:  # [
            pending = []
            i += 1
            continue
        if c == 0x5D:  # ]
            j = i + 1
            while j < n and content[j] in b" \t\r\n":
                j += 1
            if content[j:j + 2] == b"TJ" and pending is not None:
                lines.append(b"".join(pending).decode("latin-1"))
                i = j + 2
            else:
                i += 1
            pending = None
            continue
        if c in (0x54, 0x27):  # T or '
            if content[i:i + 2] == b"Tj" and last_literal is not None:
                lines.append(last_literal.decode("latin-1"))
                last_literal = None
                i += 2
                continue
            if c == 0x27 and last_literal is not None:  # ' = next-line show
                lines.append(last_literal.decode("latin-1"))
                last_literal = None
        i += 1
    return lines


def pdf_page_count(data: bytes) -> int:
    """Pages in the document (reference capability: pdfinfo page count,
    pdf_handler.py:17-24)."""
    objs = _parse_objects(data)
    n = sum(
        1
        for body in objs.values()
        if re.search(rb"/Type\s*/Page\b(?!s)", body.split(b"stream", 1)[0])
    )
    if n:
        return n
    raise ValueError("not a parseable PDF (no page objects)")


def extract_pdf_text(data: bytes) -> list[str]:
    """Per-page text layers, in page-tree order. Raises ValueError on an
    unparseable document; a parseable document with no text ops yields
    empty page strings (the caller marks those as needing rasterization)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("missing %PDF header")
    objs = _parse_objects(data)
    if not objs:
        raise ValueError("no PDF objects found")

    # page order via the page tree when available, else numeric object order
    page_nums: list[int] = []
    for body in objs.values():
        head = body.split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/Pages\b", head):
            m = _KIDS_RE.search(head)
            if m:
                page_nums = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
            break
    if not page_nums:
        page_nums = sorted(
            num for num, body in objs.items()
            if re.search(rb"/Type\s*/Page\b(?!s)", body.split(b"stream", 1)[0])
        )
    if not page_nums:
        raise ValueError("no page objects")

    texts: list[str] = []
    for num in page_nums:
        body = objs.get(num, b"")
        m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        streams: list[bytes] = []
        if m:
            content_body = objs.get(int(m.group(1)))
            if content_body is not None:
                s = _stream_bytes(content_body)
                if s is not None:
                    streams.append(s)
        lines: list[str] = []
        for s in streams:
            lines.extend(_content_text_lines(s))
        texts.append("\n".join(lines))
    return texts
