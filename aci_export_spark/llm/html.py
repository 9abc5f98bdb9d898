"""HTML text extraction — the boilerplate-stripping front door of every
web-scale LLM corpus (the C4/RefinedWeb preprocessing step): strip markup,
skip script/style raw text and comments, decode character entities, and
collapse whitespace, leaving the trainable text plus exact counts of what
was removed.

The parser is a real single-pass STATE MACHINE over the markup (modes:
text / tag / single-quoted attr / double-quoted attr / comment / rawtext),
not a regex — the synthesized corpus plants the three hazards that break
regex strippers and naive tokenizers:

- a ``>`` inside a QUOTED ATTRIBUTE VALUE (``title="a > b"``) — a regex
  ``<[^>]*>`` truncates the tag early and leaks ``b">`` into the text;
- ``</div>`` inside a SCRIPT STRING — rawtext mode must end only at the
  matching ``</script``, never at an arbitrary close tag;
- markup inside a COMMENT (``<!-- has <p> inside -->``) — comment content
  is skipped wholesale, including tag-lookalikes.

Spark shape: synthesis and extraction are each one Arrow-batched
mapInPandas over the corpus scan — zero shuffle, linear, the multimodal
decoder discipline (`multimodal.py`) applied to markup.  The DuckDB oracle
replays the SYNTHESIS arithmetic (it knows what extraction must yield and
every count), so any state-machine bug — a tag-mode off-by-one, an entity
mis-decode, rawtext leaking — breaks the value hash.

Float discipline: all counts are integers; the extracted text is compared
verbatim.

Reference parity note: the reference engine (madninja/aci-export) has no
markup surface; this extends the beyond-reference curation operators.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokens per synthesized paragraph
PARA_TOKENS = 12

#: fixed head/footer fragments (the planted hazards live here)
_STYLE = "p { color: #000; margin: 0 auto; }"
_SCRIPT = 'if (a<b && c>d) { s = "</div>"; } // <p>not a tag</p>'
_COMMENT = " has <p>markup</p> inside "
_FOOTER_HTML = "Tom &amp; J&#39;s &lt;tag&gt; &quot;q&quot;"
_FOOTER_TEXT = 'Tom & J\'s <tag> "q"'
#: entity count in the footer (amp, #39, lt, gt, quot, quot)
N_ENTITIES = 6


def synth_html(doc_id: int, source: str, text: str) -> str:
    """A genuine small HTML page wrapping the document's (whitespace-
    collapsed) tokens: PARA_TOKENS-token ``<p>`` paragraphs, every 4th
    paragraph's first token bolded, plus head (title/style/script), an
    attribute carrying ``>``, a comment carrying markup, and an
    entity-encoded footer.

    The wrap assumes markup-free tokens (the synthesized corpus is); a
    token carrying markup characters would change the page's parse
    structure, so it raises loudly instead of synthesizing ambiguity."""
    if any(c in text for c in "<>&"):
        raise ValueError("synth_html: document text carries markup characters")
    toks = text.split()
    paras = [
        toks[i: i + PARA_TOKENS] for i in range(0, len(toks), PARA_TOKENS)
    ]
    body = []
    for i, p in enumerate(paras):
        words = list(p)
        if i % 4 == 0 and words:
            words[0] = f"<b>{words[0]}</b>"
        body.append(f"<p>{' '.join(words)}</p>")
    return (
        f"<html><head><title>{source}-{doc_id}</title>"
        f"<style>{_STYLE}</style>"
        f"<script>{_SCRIPT}</script></head>"
        f'<body><h1 class="t" data-x="a > b">Doc {doc_id}</h1>'
        f"<!--{_COMMENT}-->"
        f"{''.join(body)}"
        f"<p>{_FOOTER_HTML}</p></body></html>"
    )


_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _decode_entity(name: str) -> str | None:
    if name.startswith("#x") or name.startswith("#X"):
        try:
            return chr(int(name[2:], 16))
        except ValueError:
            return None
    if name.startswith("#"):
        try:
            return chr(int(name[1:]))
        except ValueError:
            return None
    return _ENTITIES.get(name)


def html_to_text(html: str) -> dict:
    """Single-pass state-machine extraction.  Returns ``text`` (entity-
    decoded, whitespace-collapsed) plus exact removal counts: ``n_tags``
    (tag tokens stripped, open+close, comments excluded), ``n_comments``,
    ``n_entities`` (decoded references), ``n_raw_chars`` (characters
    dropped inside script/style rawtext)."""
    out: list[str] = []
    i, n = 0, len(html)
    n_tags = n_comments = n_entities = n_raw = 0
    rawtext_until: str | None = None
    while i < n:
        c = html[i]
        if rawtext_until is not None:
            end = html.lower().find(rawtext_until, i)
            if end < 0:
                raise ValueError(f"html_to_text: unterminated {rawtext_until!r}")
            n_raw += end - i
            i = end
            rawtext_until = None
            continue
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                if end < 0:
                    raise ValueError("html_to_text: unterminated comment")
                n_comments += 1
                out.append(" ")  # comments separate text like tags do
                i = end + 3
                continue
            # tag mode: honor quoted attribute values (a '>' inside quotes
            # does NOT close the tag)
            j = i + 1
            quote: str | None = None
            while j < n:
                ch = html[j]
                if quote is not None:
                    if ch == quote:
                        quote = None
                elif ch in ("'", '"'):
                    quote = ch
                elif ch == ">":
                    break
                j += 1
            if j >= n:
                raise ValueError("html_to_text: unterminated tag")
            tag = html[i + 1: j]
            name = tag.strip().split(None, 1)[0].lower() if tag.strip() else ""
            n_tags += 1
            if name in ("script", "style"):
                rawtext_until = f"</{name}"
            out.append(" ")
            i = j + 1
            continue
        if c == "&":
            semi = html.find(";", i + 1)
            if 0 < semi <= i + 10:
                decoded = _decode_entity(html[i + 1: semi])
                if decoded is not None:
                    out.append(decoded)
                    n_entities += 1
                    i = semi + 1
                    continue
            out.append(c)
            i += 1
            continue
        out.append(c)
        i += 1
    text = " ".join("".join(out).split())
    return {
        "text": text,
        "n_tags": n_tags,
        "n_comments": n_comments,
        "n_entities": n_entities,
        "n_raw_chars": n_raw,
    }


def attach_html(docs: DataFrame) -> DataFrame:
    """(doc_id, html) with synthesized page markup. mapInPandas, no
    shuffle."""
    src = docs.select("doc_id", "source", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "html": [
                        synth_html(int(d), s, t)
                        for d, s, t in zip(
                            pdf["doc_id"], pdf["source"], pdf["text"]
                        )
                    ],
                }
            )

    return src.mapInPandas(build, schema="doc_id long, html string")


HTML_EXTRACT_SCHEMA = (
    "doc_id long, text string, n_tags long, n_comments long, "
    "n_entities long, n_raw_chars long"
)


def html_extract(pages: DataFrame) -> DataFrame:
    """Extracted text + removal counts per page. mapInPandas, no shuffle;
    the stage parallelism is the scan's."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, h in zip(pdf["doc_id"], pdf["html"]):
                r = html_to_text(h)
                rows.append(
                    (
                        int(d),
                        r["text"],
                        r["n_tags"],
                        r["n_comments"],
                        r["n_entities"],
                        r["n_raw_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "text", "n_tags", "n_comments", "n_entities",
                    "n_raw_chars",
                ],
            )

    return pages.mapInPandas(run, schema=HTML_EXTRACT_SCHEMA)
