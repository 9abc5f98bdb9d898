"""HTML extraction state machine (llm/html.py): the three planted hazards
(quoted '>', script rawtext, comment markup), entity decoding, the loud
failure matrix, and the synthesis replay the oracle relies on."""

from __future__ import annotations

import pytest

from aci_export_spark.llm.html import (
    N_ENTITIES,
    _SCRIPT,
    _STYLE,
    html_to_text,
    synth_html,
)


def test_quoted_attr_gt_does_not_close_tag():
    r = html_to_text('<p title="a > b">kept</p> tail')
    assert r["text"] == "kept tail"
    assert r["n_tags"] == 2


def test_single_quoted_attr():
    r = html_to_text("<a href='x' data-v='1>2'>link</a>")
    assert r["text"] == "link"


def test_script_rawtext_ends_only_at_script_close():
    html = '<script>var s = "</div>"; if (a<b) {}</script>after'
    r = html_to_text(html)
    assert r["text"] == "after"
    assert r["n_raw_chars"] == len('var s = "</div>"; if (a<b) {}')
    assert r["n_tags"] == 2  # <script> and </script>


def test_style_rawtext():
    r = html_to_text("<style>p > a { color: red }</style>visible")
    assert r["text"] == "visible"
    assert r["n_raw_chars"] == len("p > a { color: red }")


def test_comment_markup_skipped():
    r = html_to_text("before<!-- has <p>fake</p> tags -->after")
    assert r["text"] == "before after"
    assert r["n_comments"] == 1 and r["n_tags"] == 0


def test_entity_decoding():
    r = html_to_text("Tom &amp; J&#39;s &lt;x&gt; &quot;q&quot; &#x41;")
    assert r["text"] == 'Tom & J\'s <x> "q" A'
    assert r["n_entities"] == 7


def test_bare_ampersand_passes_through():
    r = html_to_text("a & b &notanentity c")
    assert r["text"] == "a & b &notanentity c"
    assert r["n_entities"] == 0


def test_whitespace_collapse_across_tags():
    r = html_to_text("<p>one</p>\n\n  <p>two</p>")
    assert r["text"] == "one two"


def test_unterminated_structures_raise():
    for html, pat in [
        ("<p>text<span", "unterminated tag"),
        ("<!-- never closed", "unterminated comment"),
        ("<script>var x = 1;", "unterminated"),
    ]:
        with pytest.raises(ValueError, match=pat):
            html_to_text(html)


def test_synth_round_trip_counts_and_text():
    text = " ".join(f"tok{i}" for i in range(30))  # 30 tokens → 3 paras
    page = synth_html(7, "srcX", text)
    r = html_to_text(page)
    n_paras = 3
    n_bold = 1  # paras 0 only (i % 4 == 0 among 0,1,2)
    assert r["n_tags"] == 16 + 2 * n_paras + 2 * n_bold
    assert r["n_comments"] == 1
    assert r["n_entities"] == N_ENTITIES
    assert r["n_raw_chars"] == len(_STYLE) + len(_SCRIPT)
    assert r["text"] == (
        "srcX-7 Doc 7 " + text + ' Tom & J\'s <tag> "q"'
    )


def test_synth_bold_every_fourth_para():
    text = " ".join(f"w{i}" for i in range(12 * 9))  # 9 paras → bold 0,4,8
    r = html_to_text(synth_html(1, "s", text))
    assert r["n_tags"] == 16 + 2 * 9 + 2 * 3


def test_synth_rejects_markup_text():
    with pytest.raises(ValueError, match="markup characters"):
        synth_html(1, "s", "a <b> c")


def test_numeric_entity_invalid_falls_through():
    r = html_to_text("&#xzz; &#; stay")
    assert r["text"] == "&#xzz; &#; stay"
    assert r["n_entities"] == 0
