"""Deterministic markdown core: the byte-identical golden path.

Semantics transcribed from the reference (NOT copied code):
  - header extraction        /root/reference/src/processing.py:15-27
  - fence cleaning           /root/reference/src/processing.py:30-42
  - header-stack folding     /root/reference/src/processing.py:45-66
  - breadcrumb rendering     /root/reference/src/processing.py:157-159
  - batch windowing          /root/reference/src/models/document_job.py:53-63

These run inside ``map_batches`` / ``map_groups`` bodies; every string
operation here must match the reference byte-for-byte (SURVEY.md §7 hard
part 1).
"""

from __future__ import annotations

from collections.abc import Iterator

# (level, original_line) — the original line keeps its leading hashes and any
# indentation, exactly as the reference stores it (processing.py:26).
Header = tuple[int, str]


def extract_headers(markdown: str) -> list[Header]:
    """Scan markdown for ATX headers, keeping the original line verbatim.

    A line counts as a header when, after ``lstrip()``, it starts with 1-6
    ``#`` characters and has a non-empty title after stripping hashes and
    whitespace (reference: processing.py:15-27).
    """
    out: list[Header] = []
    for line in markdown.split("\n"):
        stripped = line.lstrip()
        if not stripped.startswith("#"):
            continue
        level = len(stripped) - len(stripped.lstrip("#"))
        if 1 <= level <= 6 and stripped.lstrip("#").strip():
            out.append((level, line))
    return out


def clean_markdown_output(text: str) -> str:
    """Strip a lone leading ```` ```markdown ```` line and a lone trailing
    ```` ``` ```` line; everything else (including mid-text fences) is kept
    (reference: processing.py:30-42)."""
    lines = text.split("\n")
    if lines and lines[0].strip() == "```markdown":
        lines = lines[1:]
    if lines and lines[-1].strip() == "```":
        lines = lines[:-1]
    return "\n".join(lines)


def update_header_stack(old_stack: list[Header], new_headers: list[Header]) -> list[Header]:
    """Fold new headers into a breadcrumb stack (reference: processing.py:45-66).

    deeper level  -> push; same level -> replace last;
    shallower     -> pop every entry at >= that level, then push.
    Pure: returns a new list, never mutates ``old_stack``.
    """
    stack = list(old_stack)
    for level, text in new_headers:
        if not stack:
            stack.append((level, text))
            continue
        top_level = stack[-1][0]
        if level > top_level:
            stack.append((level, text))
        elif level == top_level:
            stack[-1] = (level, text)
        else:
            while stack and stack[-1][0] >= level:
                stack.pop()
            stack.append((level, text))
    return stack


def build_context(header_stack: list[Header]) -> str:
    """Render the breadcrumb: header literal + one line per stack entry,
    2-space-indented per level (reference: processing.py:157-159)."""
    from qwen_ocr_ray.config import DOCUMENT_BREADCRUMB_HEADER

    return DOCUMENT_BREADCRUMB_HEADER + "\n".join(
        "  " * (level - 1) + text for level, text in header_stack
    )


def batch_iterator(start_page: int, end_page: int, batch_size: int) -> Iterator[tuple[int, int, int]]:
    """Yield ``(batch_num, page_start, page_end)`` windows, end-clamped,
    1-based inclusive (reference: document_job.py:53-63)."""
    for batch_num, batch_start in enumerate(range(start_page - 1, end_page, batch_size)):
        yield batch_num, batch_start + 1, min(batch_start + batch_size, end_page)


def batch_num_for_page(page_num: int, start_page: int, batch_size: int) -> int:
    """The batch window a page falls into — the vectorizable form of
    :func:`batch_iterator` used when exploding docs into page rows (SURVEY.md §2.6 O1)."""
    return (page_num - start_page) // batch_size


def fold_document(
    batches: list[tuple[int, str]],
) -> tuple[str, list[Header], list[str]]:
    """Assemble one document from its per-batch markdown chunks, in order.

    The reference's sequential loop (document_job.py:321-389) reduced to its
    data semantics: for each batch in ``batch_num`` order, render the
    breadcrumb context *before* consuming the batch, clean fences, extract
    headers, fold the stack. Returns ``(full_markdown, final_stack,
    per_batch_contexts)``. Runs inside ``groupby("url").map_groups`` — the one
    genuinely order-dependent fold (SURVEY.md §2.9 W2).
    """
    stack: list[Header] = []
    contexts: list[str] = []
    parts: list[str] = []
    for _, raw in sorted(batches, key=lambda b: b[0]):
        contexts.append(build_context(stack))
        cleaned = clean_markdown_output(raw)
        parts.append(cleaned)
        stack = update_header_stack(stack, extract_headers(cleaned))
    return "".join(parts), stack, contexts
