"""Malformed-HTML fixture corpus for M1 (post-text extraction).

Real Parler HTML is messy (unclosed divs, stray close tags, nested
wrappers, mixed case); the reference parses it leniently through
BeautifulSoup (code/htmlConverter.py:12-43). These fixtures pin the
stdlib-parser behavior on exactly that mess, with expected values
hand-derived from the reference's bs4 semantics.

Agreement: unclosed wrappers (text to EOF), stray close tags,
case-insensitive tags/attrs, script/style pruning (including imgs
inside scripts), whitelist img→"[Alt]:" with stripped alt, entity
decoding, multi-class attributes, multiple sibling wrappers.

Documented DIVERGENCE (asserted as such): nested wrapper divs.
bs4's find_all returns outer AND inner wrapper elements, so the
reference emits inner text twice; the streaming parser counts text
once while inside any wrapper. See functions/html.py docstring.

When bs4 is installed, test_differential_vs_bs4 replays the
reference pipeline verbatim and compares corpus-wide.
"""

from __future__ import annotations

import pytest

from parlerproject_spark.functions.html import extract_post_text_py

W = "post--card--wrapper"

# (name, html, expected stdlib output, agrees-with-bs4?)
FIXTURES = [
    ("well_formed",
     f'<div class="{W}"><p>hello world</p></div>',
     "hello world", True),
    ("unclosed_wrapper",  # bs4 html.parser auto-closes at EOF
     f'<div class="{W}"><p>hello world',
     "hello world", True),
    ("stray_close_tags",
     f'</div><div class="{W}">text</div></div>',
     "text", True),
    ("uppercase_tags",
     f'<DIV CLASS="{W}">Shout</DIV>',
     "Shout", True),
    ("script_pruned",
     f'<div class="{W}">a<script>var x="<b>ignored</b>";</script>b</div>',
     "a b", True),
    ("style_pruned",
     f'<div class="{W}">a<style>.x{{color:red}}</style>b</div>',
     "a b", True),
    ("img_whitelist_and_drop",
     f'<div class="{W}"><img alt="Impressions">42<img alt="selfie"></div>',
     "[Impressions]: 42", True),
    ("img_alt_whitespace",  # reference strips alt before whitelisting
     f'<div class="{W}"><img alt=" Post Upvotes ">7</div>',
     "[Post Upvotes]: 7", True),
    ("img_inside_script_ignored",
     f'<div class="{W}"><script><img alt="Impressions"></script>x</div>',
     "x", True),
    ("multi_class_attr",
     f'<div class="foo {W} bar">multi</div>',
     "multi", True),
    ("entities_decoded",
     f'<div class="{W}">a &amp; b &lt;c&gt;</div>',
     "a & b <c>", True),
    ("text_outside_wrapper_dropped",
     f'before<div class="{W}">in</div>after',
     "in", True),
    ("no_wrapper_empty",
     '<div class="other">nope</div>',
     "", True),
    ("interleaved_inline_tags",
     f'<div class="{W}"><b>bold <i>both</b> italic</i></div>',
     "bold both italic", True),
    ("sibling_wrappers_joined",
     f'<div class="{W}">one</div><p>mid</p><div class="{W}">two</div>',
     "one two", True),
    ("nested_wrappers",  # DIVERGENCE: bs4 would emit "outer inner tail inner"
     f'<div class="{W}">outer <div class="{W}">inner</div> tail</div>',
     "outer inner tail", False),
]


@pytest.mark.parametrize("name,html,expected,_agrees",
                         FIXTURES, ids=[f[0] for f in FIXTURES])
def test_malformed_corpus_pinned(name, html, expected, _agrees):
    assert extract_post_text_py(html) == expected


def _bs4_reference_extract(html_content: str) -> str:
    """The reference pipeline verbatim (htmlConverter.py:12-43)."""
    from bs4 import BeautifulSoup
    soup = BeautifulSoup(html_content, "html.parser")
    wrappers = soup.find_all("div", class_=W)
    if not wrappers:
        return ""
    all_text = []
    for wrapper in wrappers:
        for script in wrapper(["script", "style"]):
            script.extract()
        for img in wrapper.find_all("img"):
            alt_text = img.get("alt", "").strip()
            if alt_text in ["Impressions", "Post Comments",
                            "Post Echoes", "Post Upvotes"]:
                img.replace_with(f"[{alt_text}]:")
            else:
                img.extract()
        text = wrapper.get_text(separator=" ")
        cleaned = " ".join(text.split())
        if cleaned.strip():
            all_text.append(cleaned.strip())
    return " ".join(all_text)


def test_differential_vs_bs4():
    """Corpus-wide differential against the real reference pipeline —
    runs wherever bs4 is installed; the agrees flag marks the one
    documented divergence (nested wrappers)."""
    pytest.importorskip("bs4")
    for name, html, expected, agrees in FIXTURES:
        got_bs4 = _bs4_reference_extract(html)
        if agrees:
            assert got_bs4 == expected, name
        else:
            assert got_bs4 != expected, name  # divergence is real & known
