"""Deterministic synthetic web-page corpus for tests and benchmarks.

Generates the exact input shape mandated by BASELINE.json ``input_hint``:

    pages: url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

plus companion oracle tables (never read by the pipeline, only by tests):

    entities:      id, name, description, aliases ARRAY<STRING>
    mentions_gold: url, mention_id, start, end, surface, labels ARRAY<STRING>
    labeled_pairs: mention_a, mention_b, is_match

Semantics mirror the reference toy corpus
(/root/reference/tests/test_data/dataset_toy.jsonl:1-5):
  - alias surfaces for the same entity ("Facebook" -> Meta, line 3);
  - case-folded surfaces ("amazon" -> Amazon, line 3);
  - multi-gold labels (["000014","-1"], line 3);
  - NIL-gold mentions (["-1"], line 4: Toyota/Sony absent from dictionary);
  - zero-entity pages (line 5);
plus a deliberately hot blocking key (many entities sharing a first token)
to exercise salting, per FIXTURES.md §2.

Everything is seeded (``random.Random(seed)``), no wall-clock, no external
data. The generator is pure Python on the driver for unit/e2e scale and a
parallelized Spark ``mapInPandas`` path for bench scale.
"""

from __future__ import annotations

import html as _html
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
NIL_ID = "-1"

_FIRST = [
    "Acme", "Borealis", "Cascade", "Datum", "Everest", "Fulcrum", "Granite",
    "Helios", "Ironwood", "Juniper", "Kestrel", "Lumen", "Meridian", "Nimbus",
    "Obsidian", "Pinnacle", "Quartz", "Redwood", "Summit", "Tundra",
    "Umbra", "Vertex", "Willow", "Xenon", "Yonder", "Zephyr",
]
_SECOND = [
    "Systems", "Dynamics", "Analytics", "Industries", "Holdings", "Partners",
    "Technologies", "Networks", "Logistics", "Robotics", "Ventures",
    "Materials", "Energy", "Biosciences", "Aerospace", "Microdevices",
]
_SUFFIX = ["Inc", "Corp", "Ltd", "Group", "Co"]
_CITY = [
    "Osaka", "Denver", "Lagos", "Porto", "Tallinn", "Quito", "Perth",
    "Geneva", "Nairobi", "Reykjavik", "Montevideo", "Hanoi",
]
# The hot first token: ~8% of entities share it -> a hot blocking key.
_HOT_TOKEN = "Global"

_TEMPLATES = [
    (t, t.index("{m}"))
    for t in [
        "{m} announced a new product line this quarter.",
        "Analysts expect {m} to expand into new markets.",
        "The merger between {m} and a regional supplier closed today.",
        "Shares of {m} rose after the earnings call.",
        "Employees at {m} ratified a new agreement.",
        "Regulators opened an inquiry into {m} practices.",
        "A spokesperson for {m} declined to comment.",
    ]
]
_FILLER = [
    "Markets were mixed across the region.",
    "The quarterly report cited supply constraints.",
    "Officials described the outlook as stable.",
    "Trading volume stayed near seasonal averages.",
    "The committee will reconvene next month.",
]
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "ja"]


@dataclass
class Entity:
    id: str
    name: str
    description: str
    aliases: list[str] = field(default_factory=list)

    def surfaces(self) -> list[str]:
        return [self.name, *self.aliases]


def _typo(rng: random.Random, s: str) -> str:
    """Edit-distance-1 corruption away from the first 4 chars (keeps the
    Jaro-Winkler prefix and the normalized blocking key intact)."""
    if len(s) < 8:
        return s.lower()
    i = rng.randrange(4, len(s) - 1)
    kind = rng.randrange(3)
    if kind == 0:  # drop
        return s[:i] + s[i + 1 :]
    if kind == 1:  # swap
        return s[:i] + s[i + 1] + s[i] + s[i + 2 :]
    return s[:i] + rng.choice("aeiou") + s[i + 1 :]  # substitute


def make_entities(rng: random.Random, n: int, wide: bool = False) -> list[Entity]:
    """n dictionary entities + deterministic alias surfaces each.

    ``wide=True`` draws from a much larger, less-confusable name space
    (three-token bases — ~5k distinct before fallbacks, vs 416 two-token
    bases) — the REALISTIC high-vocabulary shape: Common-Crawl
    dictionaries have millions of mostly-distinct names, not dozens of
    entities per base name. The default (False) keeps the adversarial
    small-namespace generator and its rng stream byte-identical (every
    existing test/bench corpus is unchanged); the round-3 highvocab
    profile's near-total cluster collapse (263 clusters for 8k entities)
    was an artifact of that adversarial namespace at scale."""
    names: list[tuple[str, str]] = []
    seen: set[str] = set()
    misses = 0
    while len(names) < n:
        if len(names) % 12 == 3:  # hot-key family
            first = _HOT_TOKEN
        else:
            first = rng.choice(_FIRST)
        if wide:
            base = f"{first} {rng.choice(_SECOND)} {rng.choice(_CITY)}"
        else:
            base = f"{first} {rng.choice(_SECOND)}"
        if base in seen:
            base = f"{base} {rng.choice(_SUFFIX)}"
        if base in seen:
            # the token vocabularies are finite (26x16 bases, 96
            # hot-family names): once n outgrows the namespace the retry
            # loop LIVELOCKS (hit at n>~1150 by the round-3 high-vocab
            # leg). Retry as before (keeps the rng stream — and therefore
            # every existing corpus — identical at small n), but after a
            # burst of consecutive misses disambiguate with len(names),
            # which is fresh per accepted name and never collides with a
            # vocabulary base (bases don't end in digits).
            misses += 1
            if misses < 200:
                continue
            base = f"{base} {len(names)}"
        misses = 0
        seen.add(base)
        names.append((base, rng.choice(_CITY)))
    out: list[Entity] = []
    for k, (name, city) in enumerate(names):
        aliases = [name.lower(), _typo(rng, name)]
        if rng.random() < 0.3:
            aliases.append(f"{name} {rng.choice(_SUFFIX)}")
        # Distinct code-name alias (the "Facebook"->Meta analog): string-sim
        # can't recover it; only the dictionary knows. Deterministic shape.
        if rng.random() < 0.2:
            aliases.append(f"{name.split()[0]}{k % 97:02d} project")
        out.append(
            Entity(
                id=f"E{k:05d}",
                name=name,
                description=f"{name} is a company based in {city}.",
                aliases=sorted(set(a for a in aliases if a != name)),
            )
        )
    return out


def _render_html(title: str, text: str, boiler_kb: int = 0, rng: random.Random | None = None) -> bytes:
    """Template page. ``extract_text`` must invert this byte-identically.

    ``boiler_kb`` appends that many KB of script/style/comment boilerplate
    (stripped by extraction, so the invariant holds) — bench corpora use it
    to give pages realistic Common-Crawl weight so per-page extraction cost
    is honest.
    """
    body = _html.escape(text, quote=False)
    boiler = ""
    if boiler_kb > 0:
        r = rng or random.Random(len(text))
        unit = (
            "<script>var a%d=%d;function f%d(x){return x*%d+%d;}</script>"
            "<style>.c%d{margin:%dpx;padding:%dpx;color:#%06x;}</style>"
        )
        parts = []
        total = 0
        while total < boiler_kb * 1024:
            s = unit % tuple(r.randrange(1 << 20) for _ in range(9))
            parts.append(s)
            total += len(s)
        boiler = "".join(parts)
    page = (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>{_html.escape(title, quote=False)}</title>"
        f"<script>var x=1;</script>{boiler}</head>"
        f"<body><nav>home | about</nav><article>{body}</article>"
        "<footer>(c) example</footer></body></html>"
    )
    return page.encode("utf-8")


def make_corpus(
    seed: int = 42,
    n_pages: int = 200,
    n_entities: int = 20,
) -> dict[str, list]:
    """Returns dict of row-lists: pages, entities, mentions_gold.

    ~70% of pages carry 1-3 entity mentions; ~10% mention out-of-dictionary
    names (NIL gold); ~20% have zero mentions (dataset_toy.jsonl:5 analog).
    """
    rng = random.Random(seed)
    entities = make_entities(rng, n_entities)
    nil_names = [f"{rng.choice(_FIRST)}{rng.choice(_SECOND)}X{j}" for j in range(max(3, n_entities // 5))]

    pages: list[dict] = []
    mentions: list[dict] = []
    for i in range(n_pages):
        url = f"https://site{i % 37}.example/page/{i}"
        ts = EPOCH + timedelta(seconds=137 * i)
        lang = _LANGS[rng.randrange(len(_LANGS))]
        roll = rng.random()
        parts: list[str] = [rng.choice(_FILLER)]
        page_mentions: list[tuple[str, list[str]]] = []  # (surface, labels)
        if roll < 0.70:
            for _ in range(rng.randrange(1, 4)):
                ent = rng.choice(entities)
                surface = rng.choice(ent.surfaces())
                labels = [ent.id]
                if rng.random() < 0.05:  # multi-gold analog ["000014","-1"]
                    labels = [ent.id, NIL_ID]
                page_mentions.append((surface, labels))
        elif roll < 0.80:
            page_mentions.append((rng.choice(nil_names), [NIL_ID]))
        # else: zero-mention page

        text_parts: list[str] = []
        offset = 0
        for chunk in parts:
            text_parts.append(chunk)
            offset += len(chunk) + 1
        for j, (surface, labels) in enumerate(page_mentions):
            tmpl, rel = rng.choice(_TEMPLATES)
            sent = tmpl.format(m=surface)
            start = offset + rel
            end = start + len(surface)
            mentions.append(
                {
                    "url": url,
                    "mention_id": f"{url}#m{j}",
                    "start": start,
                    "end": end,
                    "surface": surface,
                    "labels": labels,
                }
            )
            text_parts.append(sent)
            offset += len(sent) + 1
        text_parts.append(rng.choice(_FILLER))
        text = " ".join(text_parts)
        pages.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": _render_html(f"page {i}", text),
                "text": text,
                "lang": lang,
            }
        )

    return {
        "pages": pages,
        "entities": [
            {"id": e.id, "name": e.name, "description": e.description, "aliases": e.aliases}
            for e in entities
        ],
        "mentions_gold": mentions,
    }


def labeled_pairs(mentions_gold: list[dict], max_negatives_per_pos: int = 3, seed: int = 7) -> list[dict]:
    """Gold pairwise labels: positive iff gold label sets intersect on a
    non-NIL id (FIXTURES.md §4). Negatives sampled deterministically."""
    rng = random.Random(seed)
    pos: list[dict] = []
    by_label: dict[str, list[str]] = {}
    mlabels: dict[str, set[str]] = {}
    for m in mentions_gold:
        mlabels[m["mention_id"]] = {x for x in m["labels"] if x != NIL_ID}
        for lb in m["labels"]:
            if lb != NIL_ID:
                by_label.setdefault(lb, []).append(m["mention_id"])
    seen: set[tuple[str, str]] = set()
    for ids in by_label.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = sorted((ids[i], ids[j]))
                if (a, b) not in seen:
                    seen.add((a, b))
                    pos.append({"mention_a": a, "mention_b": b, "is_match": True})
    all_ids = sorted(mlabels)
    neg: list[dict] = []
    target = min(len(pos) * max_negatives_per_pos, len(all_ids) * 2)
    attempts = 0
    while len(neg) < target and attempts < target * 20:
        attempts += 1
        a, b = rng.sample(all_ids, 2)
        a, b = sorted((a, b))
        if (a, b) in seen:
            continue
        if mlabels[a] & mlabels[b]:
            continue
        seen.add((a, b))
        neg.append({"mention_a": a, "mention_b": b, "is_match": False})
    return pos + neg


# ---------------------------------------------------------------------------
# distributed generation (bench scale): per-page independent RNG so page i
# is reproducible regardless of partitioning — the generator itself scales
# like the pipeline it feeds


def _gen_page(
    i: int, seed: int, entities: list[Entity], nil_names: list[str], boiler_kb: int = 0
) -> dict:
    rng = random.Random((seed << 24) ^ i)
    url = f"https://site{i % 37}.example/page/{i}"
    ts = EPOCH + timedelta(seconds=137 * i)
    lang = _LANGS[rng.randrange(len(_LANGS))]
    roll = rng.random()
    page_mentions: list[tuple[str, list[str]]] = []
    if roll < 0.70:
        for _ in range(rng.randrange(1, 4)):
            ent = rng.choice(entities)
            surface = rng.choice(ent.surfaces())
            labels = [ent.id] if rng.random() >= 0.05 else [ent.id, NIL_ID]
            page_mentions.append((surface, labels))
    elif roll < 0.80:
        page_mentions.append((rng.choice(nil_names), [NIL_ID]))

    text_parts = [rng.choice(_FILLER)]
    offset = len(text_parts[0]) + 1
    mentions = []
    for j, (surface, labels) in enumerate(page_mentions):
        tmpl, rel = rng.choice(_TEMPLATES)
        sent = tmpl.format(m=surface)
        mentions.append(
            {
                "mention_id": f"{url}#m{j}",
                "start": offset + rel,
                "end": offset + rel + len(surface),
                "surface": surface,
                "labels": labels,
            }
        )
        text_parts.append(sent)
        offset += len(sent) + 1
    text_parts.append(rng.choice(_FILLER))
    text = " ".join(text_parts)
    return {
        "url": url,
        "warc_ts": ts,
        "html": _render_html(f"page {i}", text, boiler_kb=boiler_kb, rng=rng),
        "text": text,
        "lang": lang,
        "mentions": mentions,
    }


CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "mentions array<struct<mention_id:string, start:int, end:int, "
    "surface:string, labels:array<string>>>"
)


def distributed_corpus(
    spark,
    n_pages: int,
    n_entities: int = 300,
    seed: int = 11,
    boiler_kb: int = 0,
    wide_names: bool = False,
):
    """(corpus_df, entities_df): corpus generated executor-side via
    mapInPandas over index ranges; entity catalog broadcast from the driver
    (dimension-sized). Page i is identical under any partitioning.
    ``wide_names``: realistic (less-confusable) dictionary — see
    ``make_entities``."""
    import pandas as pd

    rng = random.Random(seed)
    entities = make_entities(rng, n_entities, wide=wide_names)
    nil_names = [
        f"{rng.choice(_FIRST)}{rng.choice(_SECOND)}X{j}" for j in range(max(3, n_entities // 5))
    ]
    bc = spark.sparkContext.broadcast((entities, nil_names))

    def gen(batches):
        ents_l, nils_l = bc.value
        for pdf in batches:
            rows = [_gen_page(int(i), seed, ents_l, nils_l, boiler_kb) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["mentions"] = out["mentions"].map(
                lambda ms: [
                    (m["mention_id"], m["start"], m["end"], m["surface"], m["labels"])
                    for m in ms
                ]
            )
            yield out

    corpus = (
        spark.range(n_pages)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )
    ents_df = spark.createDataFrame(
        [(e.id, e.name, e.description, e.aliases) for e in entities],
        schema=ENTITIES_SCHEMA,
    )
    return corpus, ents_df


# ---------------------------------------------------------------------------
# Spark materialization


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
ENTITIES_SCHEMA = "id string, name string, description string, aliases array<string>"
MENTIONS_SCHEMA = (
    "url string, mention_id string, start int, end int, surface string, labels array<string>"
)
PAIRS_SCHEMA = "mention_a string, mention_b string, is_match boolean"


def corpus_dfs(spark, seed: int = 42, n_pages: int = 200, n_entities: int = 20):
    """Materialize the corpus as DataFrames: (pages, entities, mentions_gold,
    labeled_pairs)."""
    c = make_corpus(seed=seed, n_pages=n_pages, n_entities=n_entities)
    pages = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in c["pages"]],
        schema=PAGES_SCHEMA,
    )
    ents = spark.createDataFrame(
        [(e["id"], e["name"], e["description"], e["aliases"]) for e in c["entities"]],
        schema=ENTITIES_SCHEMA,
    )
    golds = spark.createDataFrame(
        [
            (m["url"], m["mention_id"], m["start"], m["end"], m["surface"], m["labels"])
            for m in c["mentions_gold"]
        ],
        schema=MENTIONS_SCHEMA,
    )
    lp = labeled_pairs(c["mentions_gold"])
    pairs = spark.createDataFrame(
        [(p["mention_a"], p["mention_b"], p["is_match"]) for p in lp] or [("x", "y", False)],
        schema=PAIRS_SCHEMA,
    )
    return pages, ents, golds, pairs
