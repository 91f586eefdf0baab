"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1, §5).

Generates the `pages` table per BASELINE.json input_hint —
(url, warc_ts, html, text, lang) — with:

  * skewed hosts (a few hosts own ~30% of rows → exercises salted
    repartitioning),
  * dictionary entity mentions embedded at known token positions (gold
    spans/links/triples are derivable, FIXTURES.md §6),
  * alias chains and an ambiguous alias (connected-components
    canonicalization is actually exercised, FIXTURES.md §5),
  * edge rows: empty html, truncation-marker row (reference
    pubmed_parser.py:10-12), unicode `25 °C ( 77 °F )` row (reference
    tests/model/test_n_gram_encoder.py:28), one giant document.

Text layout contract (kept deliberately simple so tokenization is
native-SQL-expressible): one sentence per line ('\n'-joined), tokens
single-space separated within a sentence. HTML wraps each sentence in <p>
plus nav/footer/script boilerplate the extractor must strip; the extractor's
block-join ('\n') therefore reproduces `text` byte-identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 1234  # reference test seed (tests/model/test_annotator.py:27-29)

# --- alias dictionary (UMLS/MeSH-style, synthetic) -------------------------
# Chains: C0000001 (aspirin) ↔ 'asa' ↔ C0000009 (ambiguous alias bridges two
# canonical ids); C0000005 has multi-word aliases.
CONCEPTS: dict[str, list[str]] = {
    "C0000001": ["aspirin", "acetylsalicylic acid"],
    "C0000002": ["ibuprofen", "advil"],
    "C0000003": ["headache", "cephalalgia"],
    "C0000004": ["fever", "pyrexia"],
    "C0000005": ["escherichia coli", "e coli"],
    "C0000006": ["penicillin"],
    "C0000007": ["migraine"],
    "C0000008": ["inflammation"],
    "C0000009": ["asa"],  # ambiguous: also aliased to C0000001 below
    "C0000010": ["insulin"],
    "C0000011": ["diabetes", "diabetes mellitus"],
}
# Extra alias edges creating ambiguity / chains beyond the 1:1 map above.
EXTRA_ALIASES: list[tuple[str, str]] = [
    ("asa", "C0000001"),  # 'asa' → both C0000009 and C0000001
]
CANONICAL_NAMES: dict[str, str] = {cid: aliases[0] for cid, aliases in CONCEPTS.items()}

# Predicate lexicon: a triple's predicate is the first lexicon verb strictly
# between two mentions in a sentence, else 'co_occurs_with'.
# single source of truth: the engine's predicate lexicon (triples.py) — a
# re-typed copy here would drift from what extract_triples actually matches
from bioner_spark.triples import DEFAULT_PREDICATES as PREDICATES  # noqa: E402

# Sentence templates; {0}/{1} are entity slots, <pred> a predicate verb.
_TEMPLATES = [
    ("{0} treats {1} .", "treats"),
    ("{0} causes {1} in adults .", "causes"),
    ("{0} inhibits {1} growth .", "inhibits"),
    ("{0} prevents {1} .", "prevents"),
    ("{0} reduces {1} severity .", "reduces"),
    ("patients with {0} received {1} daily .", None),
    ("studies link {0} and {1} closely .", None),
]
_FILLER_SENTENCES = [
    "the trial enrolled two hundred adults .",
    "results were published last year .",
    "no adverse events were reported .",
    "follow up lasted six months .",
    "samples were stored at 25 °C ( 77 °F ) .",
]

_HOSTS = [f"host{i}.example" for i in range(10)]
# host0+host1 own ~30% of pages (skew for salted-repartition tests).
_HOST_WEIGHTS = np.array([0.18, 0.12, 0.10, 0.10, 0.10, 0.10, 0.08, 0.08, 0.07, 0.07])

_BOILERPLATE_HEAD = (
    "<html><head><title>ignored title</title>"
    "<script>var x = 'never extracted';</script>"
    "<style>.c { color: red; }</style></head><body>"
    "<nav><ul><li>Home</li><li>About</li></ul></nav>"
    "<header>site chrome</header><div id=\"content\">"
)
_BOILERPLATE_TAIL = (
    "</div><aside>related links</aside>"
    "<footer>© 2024 example — terms</footer>"
    "<script>trackPageview();</script></body></html>"
)

TRUNCATION_MARKER = "(ABSTRACT TRUNCATED AT 250 WORDS)"


@dataclass
class GoldCorpus:
    """All frames a test needs, in pandas (small scale only)."""

    pages: pd.DataFrame
    alias_dict: pd.DataFrame
    tokens: pd.DataFrame  # gold tokens incl. BIO tags
    mentions: pd.DataFrame  # gold mentions with canonical_id (pre-CC)
    triples: pd.DataFrame = field(default=None)  # gold triples (post-CC subj/obj)


def alias_dict_rows() -> list[tuple[str, str, str]]:
    rows = [
        (alias, cid, CANONICAL_NAMES[cid])
        for cid, aliases in CONCEPTS.items()
        for alias in aliases
    ]
    rows += [(a, cid, CANONICAL_NAMES[cid]) for a, cid in EXTRA_ALIASES]
    return sorted(set(rows))


def _canonical_components() -> dict[str, str]:
    """Union-find over alias↔canonical edges → canonical_id → component id
    (deterministic min canonical_id in the component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep lexicographically smaller id as root → deterministic
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    alias_to_ids: dict[str, list[str]] = {}
    for alias, cid, _ in alias_dict_rows():
        alias_to_ids.setdefault(alias, []).append(cid)
    for ids in alias_to_ids.values():
        for other in ids[1:]:
            union(ids[0], other)
    return {cid: find(cid) for cid in CANONICAL_NAMES}


def _wrap_html(sentences: list[str]) -> bytes:
    body = "".join(f"<p>{s}</p>" for s in sentences)
    return (_BOILERPLATE_HEAD + body + _BOILERPLATE_TAIL).encode("utf-8")


def generate(
    n_docs: int = 200,
    seed: int = SEED,
    giant_doc_sentences: int = 400,
    sent_range: tuple[int, int] = (2, 7),
    with_gold: bool = True,
) -> GoldCorpus:
    """Deterministic corpus; same (n_docs, seed, sent_range) → byte-identical
    output. `sent_range` sizes documents — the (2, 7) default keeps unit
    tests fast; benchmarks use (20, 60) to model real web pages.

    with_gold=False skips the gold token/mention/triple side tables (only
    `pages` + `alias_dict` are built). The RNG draw sequence is identical
    either way, so pages are byte-identical to a with_gold=True run —
    scaling benchmarks need only the input tables, and materializing ~600
    gold token tuples per web-weight doc made large-n generation list-append
    bound (~240 M tuples / tens of GB at 400 k docs)."""
    rng = np.random.default_rng(seed)
    concept_ids = sorted(CONCEPTS)
    # one linear pass: min canonical_id per alias (ambiguity rule)
    alias_lookup: dict[str, str] = {}
    for a, cid, _ in alias_dict_rows():
        if a not in alias_lookup or cid < alias_lookup[a]:
            alias_lookup[a] = cid
    components = _canonical_components()

    pages_rows, token_rows, mention_rows, triple_rows = [], [], [], []
    t0 = datetime(2024, 1, 1)

    for d in range(n_docs):
        host = _HOSTS[rng.choice(len(_HOSTS), p=_HOST_WEIGHTS)]
        url = f"https://{host}/doc/{d}"
        n_sent = int(rng.integers(sent_range[0], sent_range[1]))
        if d == 1:
            n_sent = giant_doc_sentences  # the giant-document edge row
        sentences: list[str] = []
        doc_mentions: list[tuple[int, int, int, str, str]] = []

        for s in range(n_sent):
            if rng.random() < 0.35:
                sentences.append(str(rng.choice(_FILLER_SENTENCES)))
                continue
            tmpl, _pred = _TEMPLATES[int(rng.integers(0, len(_TEMPLATES)))]
            cid_a, cid_b = rng.choice(concept_ids, size=2, replace=False)
            alias_a = str(rng.choice(CONCEPTS[cid_a]))
            alias_b = str(rng.choice(CONCEPTS[cid_b]))
            sent = tmpl.format(alias_a, alias_b)
            sentences.append(sent)
            # locate mention token spans in the single-space-tokenized sentence
            words = sent.split(" ")
            for alias in (alias_a, alias_b):
                a_words = alias.split(" ")
                for i in range(len(words) - len(a_words) + 1):
                    if words[i : i + len(a_words)] == a_words:
                        doc_mentions.append(
                            (s, i, i + len(a_words) - 1, alias, alias_lookup[alias])
                        )
                        break

        # edge rows
        if d == 2:
            sentences[-1] = sentences[-1] + " " + TRUNCATION_MARKER
        text = "\n".join(sentences)
        if d == 2:
            # gold text has the marker stripped (extractor contract); the
            # trailing space left by the strip is rstripped like the
            # extractor does
            text = text[: -len(TRUNCATION_MARKER)].rstrip()
        html = b"" if d == 3 else _wrap_html(sentences)
        if d == 3:
            text = ""
            doc_mentions = []
            sentences = []
        lang = "en" if rng.random() < 0.9 else str(rng.choice(["de", "fr"]))
        pages_rows.append(
            (url, t0 + timedelta(minutes=d), html, text, lang)
        )

        if not with_gold:
            continue

        # gold tokens with offsets + BIO tags
        mention_by_pos = {}
        for (s, st, en, alias, cid) in doc_mentions:
            for t in range(st, en + 1):
                mention_by_pos[(s, t)] = ("B" if t == st else "I")
        for s, sent in enumerate(text.split("\n") if text else []):
            off = 0
            for t, w in enumerate(sent.split(" ")):
                token_rows.append(
                    (url, s, t, w, off, off + len(w), mention_by_pos.get((s, t), "O"))
                )
                off += len(w) + 1

        for (s, st, en, alias, cid) in doc_mentions:
            mention_rows.append((url, s, st, en, alias, cid))

        # gold triples: ordered mention pairs per sentence; pred = first
        # lexicon verb strictly between them, else co_occurs_with; subj/obj =
        # connected-component canonical ids.
        by_sent: dict[int, list] = {}
        for m in doc_mentions:
            by_sent.setdefault(m[0], []).append(m)
        for s, ms in by_sent.items():
            words = sentences[s].split(" ")
            ms = sorted(ms, key=lambda m: m[1])
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    between = words[ms[i][2] + 1 : ms[j][1]]
                    # lower() mirrors the engine's case-insensitive verb match
                    # (triples.extract_triples: F.lower(text).isin) — the
                    # synthetic corpus is lowercase today, but a capitalized
                    # predicate must not silently split gold vs engine
                    pred = next(
                        (w.lower() for w in between if w.lower() in PREDICATES),
                        "co_occurs_with",
                    )
                    triple_rows.append(
                        (components[ms[i][4]], pred, components[ms[j][4]], url, s)
                    )

    pages = pd.DataFrame(
        pages_rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    alias_dict = pd.DataFrame(
        alias_dict_rows(), columns=["alias", "canonical_id", "canonical_name"]
    )
    tokens = pd.DataFrame(
        token_rows,
        columns=["doc_id", "sentence_id", "token_id", "text", "start", "end", "tag"],
    )
    mentions = pd.DataFrame(
        mention_rows,
        columns=["doc_id", "sentence_id", "start_tok", "end_tok", "mention_text", "canonical_id"],
    )
    triples = pd.DataFrame(
        sorted(set(triple_rows)), columns=["subj", "pred", "obj", "doc_id", "sentence_id"]
    )
    return GoldCorpus(pages, alias_dict, tokens, mentions, triples)


def pages_spark_df(spark, corpus: GoldCorpus):
    from bioner_spark.schemas import PAGES_SCHEMA

    return spark.createDataFrame(corpus.pages, schema=PAGES_SCHEMA)


def alias_dict_spark_df(spark, corpus: GoldCorpus):
    from bioner_spark.schemas import ALIAS_DICT_SCHEMA

    return spark.createDataFrame(corpus.alias_dict, schema=ALIAS_DICT_SCHEMA)
