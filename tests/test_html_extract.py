"""HTML main-content extraction: boilerplate stripping, density selection,
markdown serialization (the flagship deterministic kernel)."""

from qwen_ocr_ray.functions.html_extract import (
    extract_markdown,
    extract_markdown_from_bytes,
    parse_html,
    select_main_content,
)

PAGE = """<!DOCTYPE html><html><head><title>T</title><script>var x=1;</script>
<style>.a{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Contact</a></nav>
<header class="site-header"><h1>Site name</h1></header>
<div class="sidebar"><a href="/1">l1</a><a href="/2">l2</a><a href="/3">l3</a></div>
<article>
<h1>The Article Title</h1>
<p>First paragraph with <b>bold</b> and <i>emph</i> and a <a href="x">link text</a>.</p>
<h2>Section &amp; More</h2>
<p>Second paragraph.
Spanning lines.</p>
</article>
<footer>copyright blah <a href="/p">privacy</a></footer>
</body></html>"""


class TestBoilerplateStrip:
    def test_nav_header_footer_sidebar_removed(self):
        md = extract_markdown(PAGE)
        assert "Home" not in md
        assert "Site name" not in md
        assert "copyright" not in md
        assert "l1" not in md
        assert "var x=1" not in md

    def test_content_kept(self):
        md = extract_markdown(PAGE)
        assert md.startswith("# The Article Title")
        assert "**bold**" in md and "*emph*" in md
        assert "link text" in md and "](x)" not in md  # links -> anchor text
        assert "## Section & More" in md  # entities decoded

    def test_article_preferred_over_linkful_divs(self):
        root = parse_html(PAGE)
        assert select_main_content(root).tag == "article"

    def test_cue_class_stripping(self):
        html = (
            "<body><div class='main-content'><p>"
            + "Real content sentence here, long enough to win scoring. " * 3
            + "</p></div><div class='ad-banner'><p>BUY NOW stuff</p></div></body>"
        )
        md = extract_markdown(html)
        assert "BUY NOW" not in md and "Real content" in md


class TestSerialization:
    def test_whitespace_collapsed_in_paragraphs(self):
        md = extract_markdown("<body><article><p>a\n   b\t c</p></article></body>")
        assert md == "a b c"

    def test_lists(self):
        md = extract_markdown(
            "<body><article><ul><li>one</li><li>two<ul><li>sub</li></ul></li></ul>"
            "<ol><li>x</li><li>y</li></ol></article></body>"
        )
        assert md == "- one\n- two\n  - sub\n\n1. x\n2. y"

    def test_unclosed_li_and_p(self):
        md = extract_markdown(
            "<body><article><ul><li>one<li>two</ul><p>a<p>b</article></body>"
        )
        assert "- one\n- two" in md
        assert "a\n\nb" in md

    def test_table_html_passthrough(self):
        md = extract_markdown(
            "<body><article><p>para text to anchor scoring</p>"
            "<table><tr><th>H</th></tr><tr><td rowspan=\"2\">v</td></tr></table></article></body>"
        )
        assert "<table>\n<tr><th>H</th></tr>\n<tr><td rowspan=\"2\">v</td></tr>\n</table>" in md

    def test_pre_preserves_whitespace(self):
        md = extract_markdown(
            "<body><article><pre>def f():\n    return 1</pre></article></body>"
        )
        assert "```\ndef f():\n    return 1\n```" in md

    def test_latex_spans_survive(self):
        md = extract_markdown("<body><article><p>Energy $E=mc^2$ and $$\\int x$$</p></article></body>")
        assert "$E=mc^2$" in md and "$$\\int x$$" in md

    def test_headings_all_levels(self):
        html = "<body><article>" + "".join(
            f"<h{i}>T{i}</h{i}>" for i in range(1, 7)
        ) + "<p>body</p></article></body>"
        md = extract_markdown(html)
        for i in range(1, 7):
            assert "#" * i + f" T{i}" in md

    def test_blockquote_and_hr(self):
        md = extract_markdown(
            "<body><article><blockquote><p>quoted</p></blockquote><hr><p>after</p></article></body>"
        )
        assert "> quoted" in md and "---" in md

    def test_img_alt(self):
        md = extract_markdown(
            "<body><article><p>see</p><img alt='Figure 1: caption' src='f1.png'></article></body>"
        )
        assert "![Figure 1: caption](f1.png)" in md


class TestRobustness:
    def test_empty_and_malformed(self):
        assert extract_markdown("") == ""
        assert isinstance(extract_markdown("<<<>>>"), str)  # must not raise
        assert extract_markdown_from_bytes(b"\xff\xfe garbage <p>ok</p>") != None  # noqa: E711

    def test_deterministic(self):
        assert extract_markdown(PAGE) == extract_markdown(PAGE)

    def test_bytes_utf8(self):
        md = extract_markdown_from_bytes("<body><article><p>héllo wörld</p></article></body>".encode())
        assert md == "héllo wörld"
