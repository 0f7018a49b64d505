"""CoNLL → reference-JSONL ingest (the ZELDA prep path, SURVEY.md S3).

Re-expresses the reference converter's semantics (scripts/zelda.py:19-133)
so users with CoNLL data get equivalent documents (byte-identical on
blank-line-terminated input; one deliberate robustness deviation below):

  - words join with single spaces; span char offsets derive from the
    joined text (zelda.py:66-79 ``_conll_words_to_text``);
  - spans follow BIO with two split rules (zelda.py:82-103): ``B-`` always
    opens a new span, and an ``I-`` whose label differs from the open
    span's label closes it and opens a new one; a virtual trailing ``O``
    closes the last span;
  - ``-DOCSTART-`` ends a document, ``# <id>`` (tab-split, first field)
    names it, blank lines end sentences (zelda.py:30-52). **Deliberate
    deviation**: this parser also flushes a PENDING (unterminated)
    sentence at ``-DOCSTART-`` and at EOF, where zelda.py does neither —
    there, a sentence not closed by a blank line before ``-DOCSTART-``
    leaks its words into the NEXT document, and a final sentence with no
    trailing newline is silently dropped. We keep the safer flush (no
    data loss, no cross-document leakage) and document it here the same
    way the positional ``pop(0)`` fix is documented in
    plans/candidates.py; files whose sentences are all blank-line
    terminated (the published corpora) parse byte-identically either way;
  - output documents: ``{id, examples: [{id: "<doc>-<i>", text,
    entities: [{start, end, label: [..], title: [..], text}]}]}``
    with the document id falling back to its ordinal (zelda.py:118-131).

Spark-first shape: one CoNLL FILE is the unit of parallelism
(``spark.read.text(wholetext=True)`` → ``mapInPandas`` with the pure
parser kernel) — corpora ship as many files, and a single file's parse is
inherently sequential state. The result is the exact nested document
frame ``sources/jsonl.read_reference_dataset`` consumes, and
``df.write.json`` emits reference-compatible ``*.jsonl``.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .jsonl import DATASET_SCHEMA


def _words_to_text(words: list[str]) -> tuple[str, list[tuple[int, int]]]:
    text_parts: list[str] = []
    positions: list[tuple[int, int]] = []
    offset = 0
    for w in words:
        if text_parts:
            offset += 1
        positions.append((offset, offset + len(w)))
        offset += len(w)
        text_parts.append(w)
    return " ".join(text_parts), positions


def _tags_to_spans(tags: list[str], links: list[str]) -> Iterator[tuple[int, int, str, str]]:
    """BIO spans with the reference's exact split rules (zelda.py:82-103):
    B- always opens; I- with a different label closes+opens; trailing
    virtual O closes the last open span."""
    start, label, link = -1, None, None
    for i, (tag, link_tag) in enumerate(zip(list(tags) + ["O"], list(links) + ["O"])):
        if tag == "O":
            if start >= 0:
                yield (start, i, label, link)
                start, label, link = -1, None, None
        else:
            cur_label, cur_link = tag[2:], link_tag[2:]
            if tag.startswith("B") or cur_label != label:
                if start >= 0:
                    yield (start, i, label, link)
                start, label, link = i, cur_label, cur_link


def _sentence_example(words: list[str], tags: list[str], links: list[str]) -> dict[str, Any]:
    text, pos = _words_to_text(words)
    entities = [
        {
            "start": pos[s][0],
            "end": pos[e - 1][1],
            "label": [label],
            "title": [title],
            "text": text[pos[s][0] : pos[e - 1][1]],
        }
        for s, e, label, title in _tags_to_spans(tags, links)
    ]
    return {"text": text, "entities": entities}


def parse_conll_str(
    content: str,
    delimiter: str = "\t",
    word_column: int = 0,
    tag_column: int = 1,
    link_column: int = 2,
) -> list[dict[str, Any]]:
    """Pure parser kernel: one CoNLL file's text → reference documents."""
    docs: list[dict[str, Any]] = []
    sentences: list[dict[str, Any]] = []
    words: list[str] = []
    tags: list[str] = []
    links: list[str] = []
    doc_id = ""

    def flush_sentence() -> None:
        nonlocal words, tags, links
        if words:
            sentences.append(_sentence_example(words, tags, links))
            words, tags, links = [], [], []

    def flush_doc() -> None:
        nonlocal sentences, doc_id
        if sentences:
            did = str(doc_id) if doc_id else str(len(docs))
            docs.append(
                {
                    "doc-id": did,
                    "examples": [
                        {"id": f"{did}-{si}", "text": s["text"], "entities": s["entities"]}
                        for si, s in enumerate(sentences)
                    ],
                }
            )
            sentences, doc_id = [], ""

    for line in content.splitlines():
        line = line.rstrip()
        if line.startswith("-DOCSTART-"):
            flush_sentence()
            flush_doc()
        elif line.startswith("# "):
            doc_id = line[2:].strip().split("\t")[0]
        elif not line:
            flush_sentence()
        else:
            cols = line.split(delimiter)
            words.append(cols[word_column])
            tags.append(cols[tag_column])
            links.append(cols[link_column])
    flush_sentence()
    flush_doc()
    return docs


def read_conll_dataset(
    spark: SparkSession, path: str, delimiter: str = "\t"
) -> DataFrame:
    """CoNLL file(s) → nested reference-document DataFrame (one file per
    task; ``sources/jsonl.read_reference_dataset``-compatible after
    ``write.json``)."""
    files = spark.read.text(path, wholetext=True).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for doc in parse_conll_str(r["value"], delimiter=delimiter):
                    ents = lambda es: [
                        (e["start"], e["end"], e["label"], e["title"], e["text"], None)
                        for e in es
                    ]
                    rows.append(
                        {
                            "doc-id": doc["doc-id"],
                            "examples": [
                                (ex["id"], ex["text"], ents(ex["entities"]))
                                for ex in doc["examples"]
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc-id", "examples"])

    return files.mapInPandas(parse, DATASET_SCHEMA)
