"""RAWPAGES1 — a deterministic multi-page raw-RGB container.

The reference rasterizes PDFs with pdf2image (``/root/reference/src/pdf_handler.py:44-75``);
this container is the sandbox stand-in for a binary multi-page payload (no
poppler/PIL here). Real ``%PDF`` payloads are detected and routed to a stub
(see stages/route.py) — the Ray-side plumbing (explode, schema, batching) is
identical either way.

Layout (little-endian):
    magic   b"RAWPAGES1"                      (9 bytes)
    npages  uint32
    pages   npages x (width:uint32, height:uint32, raw RGB bytes w*h*3)
"""

from __future__ import annotations

import struct

MAGIC = b"RAWPAGES1"
PDF_MAGIC = b"%PDF"


def pack_pages(pages: list[tuple[int, int, bytes]]) -> bytes:
    """pages: list of (width, height, raw_rgb_bytes)."""
    out = [MAGIC, struct.pack("<I", len(pages))]
    for w, h, raw in pages:
        if len(raw) != w * h * 3:
            raise ValueError(f"page payload {len(raw)} != {w}x{h}x3")
        out.append(struct.pack("<II", w, h))
        out.append(raw)
    return b"".join(out)


def unpack_pages(payload: bytes) -> list[tuple[int, int, bytes]]:
    if not payload.startswith(MAGIC):
        raise ValueError("not a RAWPAGES1 payload")
    (n,) = struct.unpack_from("<I", payload, len(MAGIC))
    off = len(MAGIC) + 4
    pages = []
    for _ in range(n):
        w, h = struct.unpack_from("<II", payload, off)
        off += 8
        size = w * h * 3
        pages.append((w, h, payload[off : off + size]))
        off += size
    if off != len(payload):
        raise ValueError(f"trailing bytes in RAWPAGES1 payload ({len(payload) - off})")
    return pages


def is_pagepack(payload: bytes) -> bool:
    return payload.startswith(MAGIC)


def is_pdf(payload: bytes) -> bool:
    return payload.startswith(PDF_MAGIC)
