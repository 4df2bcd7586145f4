"""wikifil: wiki markup -> lowercase a-z words (reference data/wikifil.pl)."""

from word2bits_tpu.data.wikifil import _filter_line, wikifil_text


SAMPLE = """<page>
<title>Test</title>
<text xml:space="preserve">'''Anarchism''' is a [[political philosophy]] that
advocates [[self-governance|self-governed]] societies. In 1999 there were
{{citation needed}} 42 [http://example.com groups] &amp; more.
[[Category:Political ideologies]]
</text>
</page>
"""


def test_basic_filtering():
    out = wikifil_text(SAMPLE)
    assert "anarchism" in out
    assert "political philosophy" in out
    # pipe links keep display text
    assert "self governed" in out
    # digits spelled out
    assert "one nine nine nine" in out
    assert "four two" in out
    # urls dropped, link text kept
    assert "example" not in out
    assert "groups" in out
    # templates dropped
    assert "citation" not in out
    # only [a-z ] remain
    assert all(c.islower() or c == " " or c == "\n" for c in out)


def test_non_text_lines_skipped():
    out = wikifil_text(SAMPLE)
    assert "title" not in out
    assert "page" not in out


def test_redirects_skipped():
    s = '<text xml:space="preserve">#REDIRECT [[Other page]]</text>\n'
    assert wikifil_text(s).strip() == ""


def test_entity_decoding():
    line = "<text>caf&amp;s &lt;tag&gt; &quot;x&quot;</text>"
    out = _filter_line(line)
    assert "caf" in out
