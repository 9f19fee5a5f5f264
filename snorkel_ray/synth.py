"""Deterministic synthetic `pages` corpus with a planted knowledge base.

FIXTURES.md F1/F2: seeded, no wall-clock, no network.  Every page is a
pure function of ``(seed, row_index)`` so generation parallelizes over
``ray.data.range(n)`` and is identical under any partitioning.  The
same per-row plan that renders the HTML also yields the planted-truth
triples, so expected golden triples are computable without running the
pipeline — they are the "reference output" for the P/R ≥ 0.95 gate
(the real reference mount was empty; SURVEY.md §0).

Adversarial HTML cases exercised (F5): script/style drop, HTML
entities, nested inline tags, void tags, malformed nesting, comments,
giant pages (row-size skew), non-en pages (lang filter).
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
DEFAULT_SEED = 42

# ---------------------------------------------------------------------------
# Planted KB (F2): entities with alias variants, typed predicates, facts
# ---------------------------------------------------------------------------

_ORG_STEMS = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Tyrell", "Cyberdyne",
    "Hooli", "Vandelay", "Wonka", "Soylent", "Aperture", "Blackmesa", "Oscorp",
    "Duff", "Sirius", "Gringotts", "Monarch", "Zenith",
]
_PERSON_FIRST = [
    "Alice", "Robert", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
    "Irene", "Jack", "Karen", "Liam", "Mona", "Nolan", "Olga",
]
_PERSON_LAST = [
    "Johnson", "Smith", "Mueller", "Tanaka", "Okafor", "Silva", "Novak", "Haddad",
    "Kim", "Larsen", "Moreau", "Petrov", "Quinn", "Rossi", "Santos",
]
_PLACE_NAMES = [
    "Springfield", "Rivertown", "Lakeview", "Harborside", "Eastfield", "Westmont",
    "Northgate", "Southbank", "Midvale", "Oakford", "Pinehurst", "Maplewood",
    "Cedar Falls", "Elm Grove", "Birchwood",
]

# predicate -> (subject type, object type, positive templates, negative templates)
PREDICATES: dict[str, tuple[str, str, list[str], list[str]]] = {
    "founded_by": (
        "org", "person",
        ["{S} was founded by {O}.", "{S}, which was founded by {O}, grew quickly."],
        ["{S} was never founded by {O}.", "It is false that {S} was founded by {O}."],
    ),
    "born_in": (
        "person", "place",
        ["{S} was born in {O}.", "{S}, born in {O}, moved away early."],
        ["{S} was not born in {O}."],
    ),
    "acquired": (
        "org", "org",
        ["{S} acquired {O}.", "{S} announced that it acquired {O} last year."],
        ["{S} never acquired {O}.", "{S} denied rumors that it acquired {O}."],
    ),
    "headquartered_in": (
        "org", "place",
        ["{S} is headquartered in {O}.", "{S} is based in {O}."],
        ["{S} is no longer headquartered in {O}."],
    ),
    "ceo_of": (
        "person", "org",
        ["{S} is the CEO of {O}.", "{S} serves as chief executive of {O}."],
        ["{S} stepped down as CEO of {O}.", "{S} is not the CEO of {O}."],
    ),
    "works_for": (
        "person", "org",
        ["{S} works for {O}.", "{S} joined the staff of {O}."],
        ["{S} no longer works for {O}."],
    ),
    "located_in": (
        "place", "org",  # unused direction guard; see below
        [], [],
    ),
    "partnered_with": (
        "org", "org",
        ["{S} partnered with {O}.", "{S} signed a partnership with {O}."],
        ["{S} ended its partnership with {O}."],
    ),
}
# located_in: place -> place
PREDICATES["located_in"] = (
    "place", "place",
    ["{S} is located in {O}.", "{S} lies within {O}."],
    ["{S} is not located in {O}."],
)

_NOISE_VOCAB = (
    "the market report shows steady growth across regions while analysts expect "
    "further updates on policy trade weather sports culture science travel and "
    "technology with local officials commenting on infrastructure education health "
    "budgets elections museums festivals rivers mountains harbors railways"
).split()


def _org_name(i: int) -> str:
    suffix = ["Corporation", "Industries", "Systems", "Labs", "Holdings"][i % 5]
    return f"{_ORG_STEMS[i]} {suffix}"


def build_kb(seed: int = DEFAULT_SEED) -> dict:
    """Entities, alias table (F2), facts. Pure function of seed."""
    rng = random.Random(seed * 1_000_003)
    entities: list[dict] = []  # {qid, name, type, aliases}
    qid = 0

    def add(name: str, etype: str, aliases: list[str]) -> None:
        nonlocal qid
        qid += 1
        entities.append({"qid": f"Q{qid}", "name": name, "type": etype, "aliases": aliases})

    for i in range(len(_ORG_STEMS)):
        name = _org_name(i)
        stem = _ORG_STEMS[i]
        suffix = name.split(" ", 1)[1]
        abbrev = {"Corporation": "Corp.", "Industries": "Inds.", "Systems": "Sys.",
                  "Holdings": "Hldgs.", "Labs": "Labs"}[suffix]
        add(name, "org", [name, f"{stem} {abbrev}", stem, stem.upper()])
    for i in range(len(_PERSON_FIRST)):
        first, last = _PERSON_FIRST[i], _PERSON_LAST[i]
        name = f"{first} {last}"
        add(name, "person", [name, f"{first[0]}. {last}", last.upper() + ", " + first])
    for i, name in enumerate(_PLACE_NAMES):
        add(name, "place", [name, name.upper(), name.lower()])

    by_type: dict[str, list[dict]] = {"org": [], "person": [], "place": []}
    for e in entities:
        by_type[e["type"]].append(e)

    # Colliding alias across two entities (linker tie-break by prior):
    # "Springfield" also aliases org #19 in the DICTIONARY ONLY (never
    # rendered for the org — `aliases` drives rendering, `extra_aliases`
    # only joins the alias table). Prior favors the place.
    by_type["org"][-1]["extra_aliases"] = ["Springfield"]

    # facts: ~140 typed truths; hot-entity skew = org 0 over-represented.
    facts: set[tuple[str, str, str]] = set()
    preds = [p for p in PREDICATES if PREDICATES[p][2]]
    while len(facts) < 140:
        pred = rng.choice(preds)
        st, ot, _, _ = PREDICATES[pred]
        # hot key: 30% of org-subject facts use org 0
        if st == "org" and rng.random() < 0.30:
            s = by_type["org"][0]
        else:
            s = rng.choice(by_type[st])
        o = rng.choice(by_type[ot])
        if s["qid"] == o["qid"]:
            continue
        facts.add((s["qid"], pred, o["qid"]))

    ent_by_qid = {e["qid"]: e for e in entities}
    # alias rows for the linker dictionary (F2)
    alias_rows: list[tuple[str, str, float]] = []
    for e in entities:
        for j, a in enumerate(e["aliases"]):
            alias_rows.append((a, e["qid"], 1.0 - 0.1 * j))
        for a in e.get("extra_aliases", ()):
            alias_rows.append((a, e["qid"], 0.2))  # lose ties to the owner

    return {
        "entities": entities,
        "by_type": by_type,
        "by_qid": ent_by_qid,
        "facts": sorted(facts),
        "alias_rows": alias_rows,
    }


def alias_table(kb: dict) -> pa.Table:
    a, q, p = zip(*kb["alias_rows"])
    return pa.table(
        {"alias": pa.array(a, pa.string()), "entity_qid": pa.array(q, pa.string()),
         "prior": pa.array(p, pa.float32())}
    )


# ---------------------------------------------------------------------------
# Per-page plan → (html, expected triples)
# ---------------------------------------------------------------------------

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "es", "zh"]


def _alias_of(rng: random.Random, ent: dict) -> str:
    return ent["aliases"][rng.randrange(len(ent["aliases"]))]


def _noise_sentence(rng: random.Random) -> str:
    n = rng.randrange(6, 14)
    ws = [_NOISE_VOCAB[rng.randrange(len(_NOISE_VOCAB))] for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def plan_page(i: int, kb: dict, seed: int = DEFAULT_SEED) -> dict:
    """Deterministic plan for page i: sentences + expected fact triples."""
    rng = random.Random((seed << 32) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    url = f"https://site-{i % 1000:04d}.test/p/{i}"
    lang = _LANGS[rng.randrange(len(_LANGS))]
    facts = kb["facts"]
    by_qid = kb["by_qid"]

    sentences: list[str] = []
    expected: list[tuple[str, str, str]] = []  # (subj_qid, pred, obj_qid)
    n_sent = rng.randrange(3, 9)
    for _ in range(n_sent):
        r = rng.random()
        if r < 0.45:  # positive planted fact
            sq, pred, oq = facts[rng.randrange(len(facts))]
            _, _, pos_t, _ = PREDICATES[pred]
            t = pos_t[rng.randrange(len(pos_t))]
            s_alias = _alias_of(rng, by_qid[sq])
            o_alias = _alias_of(rng, by_qid[oq])
            sentences.append(t.format(S=s_alias, O=o_alias))
            if lang == "en":
                expected.append((sq, pred, oq))
        elif r < 0.60:  # negated CORRUPTED fact — must NOT be extracted
            sq, pred, oq = facts[rng.randrange(len(facts))]
            _, ot, _, neg_t = PREDICATES[pred]
            # corrupt the object so (sq, pred, oq') is (almost surely)
            # not a planted truth — exercises negation + DS-unknown LFs
            cands = kb["by_type"][ot]
            oq2 = cands[rng.randrange(len(cands))]["qid"]
            t = neg_t[rng.randrange(len(neg_t))]
            sentences.append(t.format(S=_alias_of(rng, by_qid[sq]), O=_alias_of(rng, by_qid[oq2])))
        elif r < 0.70:  # co-occurrence without relation (far apart)
            a = rng.choice(kb["entities"])
            b = rng.choice(kb["entities"])
            filler = " ".join(_NOISE_VOCAB[rng.randrange(len(_NOISE_VOCAB))] for _ in range(14))
            sentences.append(
                f"{_alias_of(rng, a)} appeared in a report about {filler} and {_alias_of(rng, b)}."
            )
        else:
            sentences.append(_noise_sentence(rng))

    return {
        "i": i, "url": url, "lang": lang, "sentences": sentences,
        "expected": expected, "rng_tail": rng.random(),
        "case": i % 13, "giant": (i % 997 == 0),
    }


def render_html(plan: dict) -> bytes:
    """Render a plan to adversarial HTML. The extractor spec must
    recover exactly '\\n'.join(sentences) (after entity decoding) —
    asserted in tests; this alignment is what makes downstream goldens
    exact."""
    i, case = plan["i"], plan["case"]
    sents = list(plan["sentences"])
    if plan["giant"]:  # giant-page skew: ~100x body
        sents = sents * 100
    parts = ["<html><head><title></title>",
             "<script>var x = 'IGNORE ME &amp; more';</script>",
             "<style>p { color: red; }</style></head><body>"]
    if case == 3:
        parts.append("<!-- a comment that must vanish -->")
    for j, s in enumerate(sents):
        esc = s.replace("&", "&amp;")
        k = (i + j) % 7
        if k == 0:
            parts.append(f"<p>{esc}</p>")
        elif k == 1:
            # nested inline tags must not split text
            a, b = esc[: len(esc) // 2], esc[len(esc) // 2:]
            parts.append(f"<p><b>{a}</b><i>{b}</i></p>")
        elif k == 2:
            parts.append(f"<div>{esc}</div>")
        elif k == 3:
            # char-ref encoding of a letter; HTMLParser decodes it
            parts.append(f"<p>{esc[:-1]}&#46;</p>" if esc.endswith(".") else f"<p>{esc}</p>")
        elif k == 4:
            parts.append(f"<li>{esc}</li>")
        elif k == 5:
            # malformed: unclosed <p>, stray </em>
            parts.append(f"<p>{esc}</em>")
        else:
            # source-formatting whitespace that must collapse
            mid = esc.replace(" ", "\n   ", 1) if " " in esc else esc
            parts.append(f"<p>\n  {mid}\n</p>")
    if case == 7:
        parts.append("<p>   </p>")  # whitespace-only block → dropped
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def expected_text(plan: dict) -> str:
    sents = list(plan["sentences"])
    if plan["giant"]:
        sents = sents * 100
    return "\n".join(sents)


# ---------------------------------------------------------------------------
# Ray Data generation (parallel, deterministic) + driver-side goldens
# ---------------------------------------------------------------------------

def _pages_batch(batch: dict, seed: int) -> pa.Table:
    kb = _kb_cached(seed)
    ids = batch["id"]
    rows = [plan_page(int(i), kb, seed) for i in ids]
    ts = np.asarray(ids, dtype="int64") + int(EPOCH.timestamp())
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(ts * 1_000_000, pa.timestamp("us")),
            "html": pa.array([render_html(r) for r in rows], pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


_KB_CACHE: dict[int, dict] = {}


def _kb_cached(seed: int) -> dict:
    kb = _KB_CACHE.get(seed)
    if kb is None:
        kb = _KB_CACHE[seed] = build_kb(seed)
    return kb


def pages_dataset(n: int, seed: int = DEFAULT_SEED, *, blocks: int | None = None):
    """Distributed deterministic corpus: range(n) → map_batches(plan+render)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=blocks or max(8, n // 2000))
    return ds.map_batches(
        lambda b: _pages_batch(b, seed), batch_format="numpy", batch_size=512
    )


def expected_triples(n: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Distinct planted (subj_qid, pred, obj_qid) truths over pages [0, n).
    Driver-side (no HTML rendering) — O(n) python, used for goldens."""
    kb = _kb_cached(seed)
    out: set[tuple[str, str, str]] = set()
    for i in range(n):
        out.update(plan_page(i, kb, seed)["expected"])
    sq, pred, oq = zip(*sorted(out)) if out else ((), (), ())
    return pa.table(
        {"subj_qid": pa.array(sq, pa.string()), "pred": pa.array(pred, pa.string()),
         "obj_qid": pa.array(oq, pa.string())}
    )
