"""Parser-fidelity fuzz battery for the href extractor (SURVEY.md §2.3
P1): the tokenizer-grade regex path (quote-aware tag scan + attribute
walk, crawler/extract.py) must agree with an INDEPENDENT tokenizer —
the stdlib ``html.parser`` event parser — on a randomized grammar of
adversarial-but-well-formed HTML covering the cases a substring regex
gets wrong:

  * ``data-href=`` and other ``*-href`` attributes (must NOT match)
  * ``href=`` appearing inside ANOTHER attribute's quoted value
  * ``>`` and ``<`` inside quoted attribute values (tag must not split)
  * duplicate ``href`` attributes (first wins)
  * bare ``href`` flags / hrefless anchors (no link)
  * the three value quoting forms, mixed casing, inner whitespace
  * anchors inside comments / script / style / textarea (never links)
  * entity-encoded values (&amp; → &), self-closing tags
  * <base href> selection: first base element WITH an href wins

No Spark session needed: the scalar twins (py_find_hrefs /
py_find_base_href) are pinned to the pandas UDF path by the existing
three-way twin fuzz (tests/test_fuzz_twins.py); this battery closes the
remaining loop scalar ↔ independent-tokenizer.  Reference semantics:
Jsoup's DOM ``a[href]`` select in RequestExtractor.scala:49-57.
"""

from __future__ import annotations

import random
from html.parser import HTMLParser

from crawler import extract


class JsoupishTwin(HTMLParser):
    """Event-parser twin of the reference's a[href] / base[href] DOM
    semantics.  html.parser only raw-texts script/style natively, so
    textarea raw-text (HTML5) is tracked explicitly."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self.base: str | None = None
        self._textarea = 0

    @staticmethod
    def _href(attrs) -> str | None:
        for k, v in attrs:
            if k == "href":
                return v
        return None

    def handle_starttag(self, tag, attrs):
        if tag == "textarea":
            self._textarea += 1
            return
        if self._textarea:
            return
        if tag == "a":
            v = self._href(attrs)
            if v is not None:
                self.hrefs.append(v)
        elif tag == "base" and self.base is None:
            v = self._href(attrs)
            if v is not None:
                self.base = v

    def handle_endtag(self, tag):
        if tag == "textarea" and self._textarea:
            self._textarea -= 1


def twin_extract(text: str) -> tuple[list[str], str]:
    p = JsoupishTwin()
    p.feed(text)
    p.close()
    return p.hrefs, p.base if p.base is not None else ""


URLS = [
    "http://ex.com/a",
    "/rel/path",
    "page.html",
    "/p?a=1&amp;b=2",
    "http://ex.com/x y",          # needs escaping downstream (href kept raw)
    "HTTPS://EX.COM/UP",
]


def _u(rng) -> str:
    return rng.choice(URLS)


def _snippets(rng):
    u = _u(rng)
    q = rng.choice(['"', "'"])
    return [
        # plain text
        "some plain text with no tags ",
        f"<a href={q}{u}{q}>link</a>",
        f"<a href={u.replace(' ', '')}>unquoted</a>",
        f"<A HREF={q}{u}{q} TARGET=_blank>caps</A>",
        f"<a class=nav id='l1' href={q}{u}{q}>attrs-before</a>",
        f"<a href={q}{u}{q} rel=nofollow>attrs-after</a>",
        # traps: must NOT yield links
        f"<a data-href={q}{u}{q}>data-href trap</a>",
        f"<a title={q}use href=trap here{q}>href-in-value trap</a>",
        "<a href>bare flag</a>",
        "<a>no attrs</a>",
        f"<!-- <a href={q}{u}{q}>in comment</a> -->",
        f"<script>var s = '<a href={q}{u}{q}>';</script>",
        f"<style>a:after {{ content: '<a href={q}{u}{q}>'; }}</style>",
        f"<textarea><a href={q}{u}{q}>in textarea</a></textarea>",
        # tag-splitting traps
        f'<a title="a > b" href={q}{u}{q}>gt-in-value</a>',
        f'<a title="a < b" href={q}{u}{q}>lt-in-value</a>',
        # duplicate href: first wins
        f"<a href={q}first:{u}{q} href={q}second{q}>dup</a>",
        # whitespace / newlines inside the tag
        f"<a\n  href = {q}{u}{q}\n  class=x>ws</a>",
        # entity decode
        "<a href='/p?x=1&amp;y=2'>ent</a>",
        # self-closing
        f"<a href={q}{u}{q}/>",
        # empty value (yields '' href — dropped later at resolve)
        "<a href=''>empty</a>",
        # base candidates (selection checked doc-level)
        "<base target=_top>",
        f"<base href={q}{u}{q}>",
        # structural noise
        "<div class='c'><p>para</p></div>",
        f"<img src={q}{u}{q}>",
    ]


def gen_doc(rng) -> str:
    snips = _snippets(rng)
    return "".join(rng.choice(snips) for _ in range(rng.randint(1, 14)))


def test_fuzz_extractor_matches_independent_tokenizer():
    rng = random.Random(20260817)
    for i in range(400):
        doc = gen_doc(rng)
        ours = extract.py_find_hrefs(doc)
        ours_base = extract.py_find_base_href(doc)
        theirs, theirs_base = twin_extract(doc)
        assert ours == theirs, f"doc {i}: {doc!r}\nours={ours}\ntwin={theirs}"
        assert ours_base == theirs_base, (
            f"doc {i} base: {doc!r}\nours={ours_base!r}\ntwin={theirs_base!r}"
        )


def test_targeted_fidelity_goldens():
    cases = {
        # data-href never matches; real href after it does
        '<a data-href="/no" href="/yes">x</a>': ["/yes"],
        # href= inside another attribute's value never matches
        '<a title="see href=/no inside">x</a>': [],
        # '>' inside a quoted value does not end the tag
        '<a title="a > b" href="/yes">x</a>': ["/yes"],
        # duplicate href: first occurrence wins
        '<a href="/first" href="/second">x</a>': ["/first"],
        # bare href flag is not a link
        "<a href>x</a>": [],
        # unquoted value terminates at whitespace or '>'
        "<a href=/u/v>x</a>": ["/u/v"],
        # entity decode in attribute values
        '<a href="/p?a=1&amp;b=2">x</a>': ["/p?a=1&b=2"],
    }
    for doc, want in cases.items():
        assert extract.py_find_hrefs(doc) == want, doc
        theirs, _ = twin_extract(doc)
        assert theirs == want, f"twin disagrees on golden: {doc}"


def test_base_selection_first_with_href():
    doc = '<base target=_top><base href="/b1"><base href="/b2">'
    assert extract.py_find_base_href(doc) == "/b1"
    _, twin_base = twin_extract(doc)
    assert twin_base == "/b1"


# ------------------------------------------------ anchor-text extraction


class AnchorTextTwin(HTMLParser):
    """Independent twin for (href, anchor-text) extraction: Jsoup
    Element.text() over each a[href] element, with the tree builder's
    a-in-a implicit close and raw-text (script/style/textarea) skip."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []
        self._raw = 0

    def _flush(self):
        if self._href is not None:
            import re as _re

            txt = _re.sub(r"\s+", " ", "".join(self._buf)).strip()
            self.links.append((self._href, txt))
        self._href, self._buf = None, []

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style", "textarea"):
            self._raw += 1
            return
        if self._raw:
            return
        if tag == "a":
            self._flush()  # a-in-a implicitly closes the open anchor
            self._href = next((v for k, v in attrs if k == "href"), None)

    def handle_endtag(self, tag):
        if tag in ("script", "style", "textarea"):
            self._raw = max(0, self._raw - 1)
        elif tag == "a" and not self._raw:
            self._flush()

    def handle_data(self, data):
        if self._href is not None and not self._raw:
            self._buf.append(data)

    def close(self):
        super().close()
        self._flush()  # EOF closes an open anchor


def _anchor_snippets(rng):
    u = _u(rng)
    q = rng.choice(['"', "'"])
    words = rng.choice(["alpha beta", "x &amp; y", "one  two\n three", "t"])
    return [
        f"<a href={q}{u}{q}>{words}</a>",
        f"<a href={u.replace(' ', '')}>unquoted {words}</a>",
        f"<a href={q}{u}{q}><b>{words}</b> tail</a>",
        f"<a href={q}{u}{q}><span class='x'>{words}</span></a>",
        f"<a href={q}{u}{q}></a>",  # empty anchor text
        "<a>no href, no link</a>",
        f"<A HREF={q}{u}{q}>CAPS {words}</A>",
        # decoys between anchors — never links, never anchor text
        f"<!-- <a href={q}{u}{q}>in comment</a> -->",
        f"<script>var s = '<a href={q}{u}{q}>js</a>';</script>",
        f"<textarea><a href={q}{u}{q}>ta</a></textarea>",
        "<p>plain paragraph text</p>",
    ]


def test_fuzz_anchor_text_matches_independent_tokenizer():
    rng = random.Random(20260819)
    for i in range(400):
        snips = _anchor_snippets(rng)
        doc = "".join(rng.choice(snips) for _ in range(rng.randint(1, 12)))
        ours = extract.py_find_links(doc)
        twin = AnchorTextTwin()
        twin.feed(doc)
        twin.close()
        theirs = [(h, t) for h, t in twin.links if h is not None]
        assert ours == theirs, f"doc {i}: {doc!r}\nours={ours}\ntwin={theirs}"


def test_anchor_text_goldens():
    cases = {
        # nested tags stripped, entities decoded, whitespace collapsed
        '<a href="/x"><b>bold</b> &amp; plain\n  text</a>': [("/x", "bold & plain text")],
        # a-in-a: the open anchor closes at the next <a> open
        '<a href="/x">first <a href="/y">second</a>': [("/x", "first"), ("/y", "second")],
        # unterminated anchor runs to EOF
        '<a href="/x">to the end': [("/x", "to the end")],
        # hrefless anchor yields nothing even with text
        "<a>plain</a>": [],
        # decoy regions are stripped before the scan
        '<script><a href="/no">x</a></script><a href="/yes">ok</a>': [("/yes", "ok")],
    }
    for doc, want in cases.items():
        assert extract.py_find_links(doc) == want, doc
