"""Byte-exact unit tests for the deterministic markdown core.

Expected values transcribed from the reference semantics
(/root/reference/src/processing.py:15-66,157-159;
/root/reference/src/models/document_job.py:53-63) — see FIXTURES.md §2/§3.
"""

from qwen_ocr_ray.functions.markdown import (
    batch_iterator,
    batch_num_for_page,
    build_context,
    clean_markdown_output,
    extract_headers,
    fold_document,
    update_header_stack,
)


class TestExtractHeaders:
    def test_levels_1_to_6(self):
        md = "\n".join("#" * i + f" T{i}" for i in range(1, 7))
        assert extract_headers(md) == [(i, "#" * i + f" T{i}") for i in range(1, 7)]

    def test_level_7_rejected(self):
        assert extract_headers("####### too deep") == []

    def test_empty_title_rejected(self):
        assert extract_headers("##") == []
        assert extract_headers("##   ") == []

    def test_indented_header_keeps_original_line(self):
        # lstrip() is used for detection but the ORIGINAL line is stored
        # (processing.py:26).
        assert extract_headers("   ## Indented") == [(2, "   ## Indented")]

    def test_hash_in_text_not_a_header(self):
        assert extract_headers("price is #1 today") == []

    def test_no_space_after_hashes_still_header(self):
        assert extract_headers("##Title") == [(2, "##Title")]


class TestCleanMarkdownOutput:
    def test_leading_fence_only(self):
        assert clean_markdown_output("```markdown\nbody") == "body"

    def test_trailing_fence_only(self):
        assert clean_markdown_output("body\n```") == "body"

    def test_both(self):
        assert clean_markdown_output("```markdown\nbody\n```") == "body"

    def test_neither(self):
        assert clean_markdown_output("plain\ntext") == "plain\ntext"

    def test_mid_text_fence_kept(self):
        s = "a\n```\ncode\n```markdown\nb"
        assert clean_markdown_output(s) == s

    def test_bare_leading_fence_not_stripped(self):
        # Only ```markdown is stripped at the head (processing.py:35).
        assert clean_markdown_output("```\nbody") == "```\nbody"

    def test_whitespace_padded_fences(self):
        assert clean_markdown_output("  ```markdown  \nbody\n  ```  ") == "body"

    def test_empty_string(self):
        assert clean_markdown_output("") == ""


class TestUpdateHeaderStack:
    def test_push_deeper(self):
        s = update_header_stack([(1, "# A")], [(2, "## B")])
        assert s == [(1, "# A"), (2, "## B")]

    def test_replace_same_level(self):
        s = update_header_stack([(1, "# A"), (2, "## B")], [(2, "## C")])
        assert s == [(1, "# A"), (2, "## C")]

    def test_pop_to_parent(self):
        s = update_header_stack([(1, "# A"), (2, "## B"), (3, "### C")], [(2, "## D")])
        assert s == [(1, "# A"), (2, "## D")]

    def test_empty_start(self):
        assert update_header_stack([], [(3, "### X")]) == [(3, "### X")]

    def test_non_monotone_h1_h3_h2(self):
        s = update_header_stack([], [(1, "# A"), (3, "### B"), (2, "## C")])
        assert s == [(1, "# A"), (2, "## C")]

    def test_shallower_pops_everything_ge(self):
        s = update_header_stack([(2, "## A"), (3, "### B")], [(1, "# Z")])
        assert s == [(1, "# Z")]

    def test_input_not_mutated(self):
        old = [(1, "# A")]
        update_header_stack(old, [(2, "## B")])
        assert old == [(1, "# A")]


class TestBuildContext:
    def test_literal_and_indent(self):
        out = build_context([(1, "# A"), (2, "## B"), (3, "### C")])
        assert out == "### DOCUMENT LOCATION BREADCRUMB\n# A\n  ## B\n    ### C"

    def test_empty_stack(self):
        assert build_context([]) == "### DOCUMENT LOCATION BREADCRUMB\n"


class TestBatchIterator:
    def test_exact_cases(self):
        # (page counts 1, 10, 11, 25 at batch_size 10 — FIXTURES.md §3)
        assert list(batch_iterator(1, 1, 10)) == [(0, 1, 1)]
        assert list(batch_iterator(1, 10, 10)) == [(0, 1, 10)]
        assert list(batch_iterator(1, 11, 10)) == [(0, 1, 10), (1, 11, 11)]
        assert list(batch_iterator(1, 25, 10)) == [(0, 1, 10), (1, 11, 20), (2, 21, 25)]

    def test_nonunit_start(self):
        assert list(batch_iterator(3, 7, 2)) == [(0, 3, 4), (1, 5, 6), (2, 7, 7)]

    def test_batch_num_for_page_matches_iterator(self):
        for start, end, bs in [(1, 25, 10), (1, 11, 10), (3, 7, 2)]:
            for bn, ps, pe in batch_iterator(start, end, bs):
                for p in range(ps, pe + 1):
                    assert batch_num_for_page(p, start, bs) == bn


class TestFoldDocument:
    def test_context_carries_across_batches(self):
        b0 = "```markdown\n# Intro\ntext0\n```"
        b1 = "## Methods\ntext1"
        md, stack, contexts = fold_document([(1, b1), (0, b0)])  # out of order on purpose
        assert md == "# Intro\ntext0## Methods\ntext1"
        assert stack == [(1, "# Intro"), (2, "## Methods")]
        assert contexts[0] == "### DOCUMENT LOCATION BREADCRUMB\n"
        assert contexts[1] == "### DOCUMENT LOCATION BREADCRUMB\n# Intro"
