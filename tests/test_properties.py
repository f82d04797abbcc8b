"""Property-based tests (hypothesis) for the deterministic core."""

import string

from hypothesis import given, settings, strategies as st

from qwen_ocr_ray.functions.html_extract import extract_markdown
from qwen_ocr_ray.functions.markdown import (
    batch_iterator,
    batch_num_for_page,
    clean_markdown_output,
    extract_headers,
    update_header_stack,
)
from qwen_ocr_ray.functions.text_hash import (
    estimate_jaccard,
    minhash_signature,
    shingle_hashes,
    simhash64,
)

text_lines = st.lists(
    st.text(alphabet=string.printable, max_size=40), max_size=12
).map("\n".join)

headers = st.lists(
    st.tuples(st.integers(1, 6), st.text(alphabet=string.ascii_letters + "# ", max_size=20)),
    max_size=20,
)


class TestMarkdownProperties:
    @given(text_lines)
    @settings(max_examples=200, deadline=None)
    def test_clean_is_idempotent_when_no_fences_remain(self, text):
        once = clean_markdown_output(text)
        # stripping again only acts if the cleaned text again starts/ends with
        # fence lines, which clean never introduces
        if not (once.split("\n")[0].strip() == "```markdown" or once.split("\n")[-1].strip() == "```"):
            assert clean_markdown_output(once) == once

    @given(text_lines)
    @settings(max_examples=200, deadline=None)
    def test_extract_headers_levels_valid(self, text):
        for level, line in extract_headers(text):
            assert 1 <= level <= 6
            assert line in text.split("\n")

    @given(headers, headers)
    @settings(max_examples=200, deadline=None)
    def test_stack_invariant_strictly_increasing(self, a, b):
        stack = update_header_stack(update_header_stack([], a), b)
        levels = [lvl for lvl, _ in stack]
        assert levels == sorted(set(levels))  # strictly increasing

    @given(headers, headers)
    @settings(max_examples=100, deadline=None)
    def test_fold_associativity(self, a, b):
        # folding batch-by-batch equals folding the concatenation
        assert update_header_stack(update_header_stack([], a), b) == update_header_stack(
            [], a + b
        )

    @given(st.integers(1, 5), st.integers(1, 200), st.integers(1, 30))
    @settings(max_examples=200, deadline=None)
    def test_batch_iterator_partitions_range(self, start, n_pages, bs):
        end = start + n_pages - 1
        covered = []
        for bn, ps, pe in batch_iterator(start, end, bs):
            assert pe - ps + 1 <= bs
            covered.extend(range(ps, pe + 1))
            for p in range(ps, pe + 1):
                assert batch_num_for_page(p, start, bs) == bn
        assert covered == list(range(start, end + 1))


class TestExtractorRobustness:
    @given(st.text(max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_never_raises_on_arbitrary_text(self, s):
        assert isinstance(extract_markdown(s), str)

    @given(st.binary(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_never_raises_on_arbitrary_bytes(self, b):
        from qwen_ocr_ray.functions.html_extract import extract_markdown_from_bytes

        assert isinstance(extract_markdown_from_bytes(b), str)


class TestSketchProperties:
    @given(st.text(alphabet=string.ascii_lowercase + " ", min_size=0, max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_self_similarity(self, text):
        sh = shingle_hashes(text)
        sig = minhash_signature(sh)
        assert estimate_jaccard(sig, sig) == 1.0
        assert simhash64(text) == simhash64(text)

    @given(st.text(alphabet=string.ascii_lowercase + " ", min_size=1, max_size=120))
    @settings(max_examples=100, deadline=None)
    def test_signature_fixed_length(self, text):
        assert len(minhash_signature(shingle_hashes(text))) == 64


class TestPdfRoundTripProperties:
    @given(
        st.lists(
            st.lists(
                st.text(
                    alphabet=st.characters(min_codepoint=32, max_codepoint=255),
                    max_size=60,
                ),
                max_size=6,
            ),
            min_size=1,
            max_size=4,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_any_latin1_pages_round_trip(self, pages):
        """build_simple_pdf -> extract_pdf_text is the identity on
        latin-1-sanitized lines (escapes, parens, backslashes included)."""
        from qwen_ocr_ray.functions.pdf_text import (
            build_simple_pdf,
            extract_pdf_text,
            pdf_page_count,
            sanitize_pdf_text,
        )

        pages = [[sanitize_pdf_text(line) for line in p] for p in pages]
        data = build_simple_pdf(pages)
        assert pdf_page_count(data) == len(pages)
        assert extract_pdf_text(data) == ["\n".join(p) for p in pages]


class TestPngRoundTripProperties:
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_any_rgb_image_round_trips(self, w, h, seed):
        import numpy as np

        from qwen_ocr_ray.functions.png import decode_png, encode_png

        rng = np.random.RandomState(seed % (2**31))
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        ww, hh, rgb = decode_png(encode_png(img.tobytes(), w, h))
        assert (ww, hh) == (w, h)
        assert rgb == img.tobytes()
