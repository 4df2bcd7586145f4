"""Wikipedia-dump -> plain-text filter: the Perl wikifil.pl re-implemented.

Behavioral equivalent of the reference's data tooling
(reference data/wikifil.pl:11-57, Matt Mahoney's filter used to produce
text8 from enwik8): keep only article text, strip XML/markup, lowercase,
spell digits as words, map everything outside [a-z] to space.

This is a fresh Python implementation of the documented transformation, not
a transcription of the Perl (the regex pipeline is re-derived from the
published text8 spec).
"""

from __future__ import annotations

import re
import sys

_DIGITS = {
    "0": " zero ", "1": " one ", "2": " two ", "3": " three ", "4": " four ",
    "5": " five ", "6": " six ", "7": " seven ", "8": " eight ", "9": " nine ",
}


def wikifil_text(text: str) -> str:
    """Filter one document's worth of wiki XML to lowercase a-z words."""
    out = []
    in_text = False
    for line in text.splitlines(keepends=True):
        if "<text " in line:
            in_text = True
        if not in_text:
            continue
        if "#redirect" in line.lower():
            in_text = "</text>" not in line
            continue
        stop = "</text>" in line
        out.append(_filter_line(line))
        if stop:
            in_text = False
    return "".join(out)


def _filter_line(s: str) -> str:
    # strip the enclosing tags themselves
    s = re.sub(r"<text[^>]*>", "", s)
    s = s.replace("</text>", "")
    # decode the handful of entities the corpus contains
    s = (s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
         .replace("&quot;", '"').replace("&nbsp;", " "))
    s = re.sub(r"<ref[^<]*<\/ref>", "", s)        # references
    s = re.sub(r"<[^>]*>", "", s)                 # remaining xml tags
    s = re.sub(r"\[http:[^] ]*", "[", s)          # keep link text, drop urls
    s = re.sub(r"\|thumb", "", s, flags=re.I)
    s = re.sub(r"\|left", "", s, flags=re.I)
    s = re.sub(r"\|right", "", s, flags=re.I)
    s = re.sub(r"\|\d+px", "", s, flags=re.I)
    s = re.sub(r"\[\[image:[^\[\]]*\|", "", s, flags=re.I)
    s = re.sub(r"\[\[category:([^|\]]*)[^]]*\]\]", r"[[\1]]", s, flags=re.I)
    s = re.sub(r"\[\[[a-z\-]*:[^\]]*\]\]", "", s)  # interwiki links
    s = re.sub(r"\[\[[^\|\]]*\|", "[[", s)         # link text only
    s = re.sub(r"\{\{[^\}]*\}\}", "", s)           # templates
    s = s.replace("{", "").replace("}", "")
    s = s.replace("[", "").replace("]", "")
    s = re.sub(r"&[^;]*;", " ", s)                 # remaining entities
    s = s.lower()
    s = "".join(_DIGITS.get(c, c) for c in s)
    s = re.sub(r"[^a-z]+", " ", s)
    return s


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: python -m word2bits_tpu.data.wikifil <enwik-file> "
              "[> text-out]\nEquivalent of reference data/wikifil.pl.")
        return 0
    with open(argv[0], "r", encoding="utf-8", errors="ignore") as f:
        sys.stdout.write(wikifil_text(f.read()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
