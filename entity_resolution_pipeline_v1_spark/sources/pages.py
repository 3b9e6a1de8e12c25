"""Deterministic synthetic `pages` corpus generator.

Canonical engine input (BASELINE.json input_hint):

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Generated DISTRIBUTED (mapInPandas over spark.range) and PER-ROW
deterministic: every attribute derives from md5(seed, row/entity id,
tag), so the same (seed, n_records) always yields byte-identical rows
regardless of partitioning — the generation analogue of the
reference's seed-42 determinism (reference config.yml:9).

Latent ground truth mirrors the reference's catalog-record shape
(fields person/title/provision/subjects/roles, reference
config.yml:36-40): E latent entities, skewed cluster sizes, name
variants per record including the ten birth/death-year formats
(reference tests/birth_death_year_regexes.py), ~40% NULL provision and
~25% NULL subjects (imputation targets, reference config.yml:38).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

FULL_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "record_id string, entity_id bigint, person string, title string, "
    "provision string, subjects string, roles string"
)

_SURNAMES = [
    "Smith", "Johnson", "Müller", "Garcia", "Chen", "Kowalski", "Dubois",
    "Rossi", "Tanaka", "Andersson", "Novak", "Silva", "Petrov", "Haddad",
    "Okafor", "Nguyen", "Fernandez", "Schmidt", "Brown", "Taylor", "Moreau",
    "Ricci", "Yamamoto", "Lindqvist", "Horak", "Costa", "Ivanov", "Nasser",
    "Adeyemi", "Pham", "Lopez", "Weber", "Wilson", "Clark", "Lefevre",
    "Conti", "Sato", "Berg", "Dvorak", "Almeida",
]
_GIVEN = [
    "John", "Maria", "Wei", "Anna", "Pierre", "Giulia", "Hiroshi", "Erik",
    "Jana", "Luis", "Dmitri", "Layla", "Chidi", "Linh", "Carmen", "Hans",
    "Emma", "James", "Claire", "Marco", "Yuki", "Astrid", "Pavel", "Ines",
    "Sergei", "Amira", "Ngozi", "Minh", "Sofia", "Karl", "Alice", "Edward",
    "Margaret", "Thomas", "Harriet", "Samuel", "Eleanor", "Walter",
]
_TITLE_WORDS = [
    "history", "treatise", "essays", "letters", "collected", "works",
    "introduction", "principles", "studies", "survey", "analysis",
    "observations", "chronicle", "memoirs", "lectures", "commentary",
    "fragments", "papers", "notes", "selected", "journal", "travels",
    "poems", "dialogues", "elements", "foundations", "critique", "annals",
]
_SUBJECT_VOCAB = [
    "Philosophy", "Natural history", "Mathematics", "Astronomy", "Medicine",
    "Theology", "Law", "Poetry", "Navigation", "Botany", "Chemistry",
    "Geography", "Music", "Architecture", "Rhetoric", "Agriculture",
    "Economics", "Logic", "Mineralogy", "Antiquities",
]
_PUBLISHERS = [
    "Printed for T. Cadell", "Apud Franciscum Halma", "Clarendon Press",
    "Gedruckt bey J. F. Gleditsch", "Chez Firmin Didot", "B. Franklin",
    "Typis academicis", "W. Strahan", "Elzevir", "Officina Plantiniana",
]
_ROLES = ["author", "editor", "translator", "contributor", "compiler"]
_CITIES = ["London", "Paris", "Leipzig", "Amsterdam", "Boston", "Oxford", "Venice"]


def _h64(*parts) -> int:
    """Deterministic 64-bit stream: md5 of the joined parts."""
    key = ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "little")


def _u(*parts) -> float:
    return _h64(*parts) / 2**64


def _pick(pool, *parts):
    return pool[_h64(*parts) % len(pool)]


_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na", "pe", "qui",
    "ra", "so", "tu", "ve", "wi", "xa", "yo", "zu", "chor", "dran", "fel",
    "gos", "lin", "mar", "nor", "pol", "ser", "tan",
]


def _pseudo_word(*parts) -> str:
    """Deterministic pronounceable rare word — makes each title
    distinctive the way real titles are (proper nouns, places)."""
    h = _h64(*parts)
    n = 2 + h % 3
    return "".join(
        _SYLLABLES[_h64(*parts, k) % len(_SYLLABLES)] for k in range(n)
    ).capitalize()


def _entity_attrs(seed: int, ent: int) -> dict:
    # collision-free (surname, given) assignment: two distinct entities
    # never share the full name (identical full names are humanly
    # unresolvable and would poison the F1 oracle); same SURNAME across
    # entities still happens constantly — those are the hard negatives.
    slot = ent % (len(_SURNAMES) * len(_GIVEN))
    surname = _SURNAMES[slot % len(_SURNAMES)]
    given = _GIVEN[(slot // len(_SURNAMES)) % len(_GIVEN)]
    # beyond name-pool capacity, a deterministic middle token keeps
    # entities distinguishable
    overflow = ent // (len(_SURNAMES) * len(_GIVEN))
    if overflow:
        given = f"{given} {_pseudo_word(seed, 'mid', ent)}"
    has_years = _u(seed, "ent", ent, "hy") < 0.7
    birth = 1500 + _h64(seed, "ent", ent, "by") % 430
    death = birth + 25 + _h64(seed, "ent", ent, "dy") % 60
    n_works = 1 + _h64(seed, "ent", ent, "nw") % 3
    works = []
    for w in range(n_works):
        n_words = 3 + _h64(seed, "ent", ent, "wlen", w) % 5
        words = [
            _pick(_TITLE_WORDS, seed, "ent", ent, "tw", w, k) for k in range(n_words)
        ]
        # two rare proper-noun-ish words make titles discriminative,
        # as real titles are (places, names, subjects)
        rare1 = _pseudo_word(seed, "ent", ent, "rw1", w)
        rare2 = _pseudo_word(seed, "ent", ent, "rw2", w)
        works.append(f"The {' '.join(words[:2])} of {rare1} {rare2} {' '.join(words[2:])}".strip())
    n_subj = 1 + _h64(seed, "ent", ent, "ns") % 4
    subjects = "; ".join(
        sorted({_pick(_SUBJECT_VOCAB, seed, "ent", ent, "sv", k) for k in range(n_subj)})
    )
    return {
        "surname": surname,
        "given": given,
        "has_years": has_years,
        "birth": birth,
        "death": death,
        "works": works,
        "subjects": subjects,
    }


def _person_variant(seed: int, i: int, ent_attrs: dict) -> str:
    sn, gv = ent_attrs["surname"], ent_attrs["given"]
    birth, death = ent_attrs["birth"], ent_attrs["death"]
    v = _h64(seed, "rec", i, "variant") % 8
    if not ent_attrs["has_years"] and v in (0, 4, 5, 6):
        v = 1
    if v == 0:
        return f"{sn}, {gv}, {birth}-{death}"
    if v == 1:
        return f"{sn}, {gv}"
    if v == 2:
        return f"{gv} {sn}"
    if v == 3:
        return f"{sn}, {gv[0]}."
    if v == 4:
        return f"{sn}, {gv}, approximately {birth}-{death}"
    if v == 5:
        return f"{sn}, {gv}, b. {birth}"
    if v == 6:
        return f"{sn}, {gv}, {birth}-"
    # v == 7: single-char typo in the given name (levenshtein signal)
    if len(gv) > 3:
        pos = 1 + _h64(seed, "rec", i, "typo") % (len(gv) - 2)
        gv = gv[:pos] + gv[pos + 1 :]
    return f"{sn}, {gv}"


def _make_row(seed: int, i: int, n_entities: int, n_hosts: int) -> dict:
    # skewed entity assignment: u^2.2 concentrates records on low entity ids
    u = _u(seed, "rec", i, "ent")
    ent = int(n_entities * (u**2.2))
    ent = min(ent, n_entities - 1)
    attrs = _entity_attrs(seed, ent)

    person = _person_variant(seed, i, attrs)
    work_idx = _h64(seed, "rec", i, "wk") % len(attrs["works"])
    title = attrs["works"][work_idx]
    if _u(seed, "rec", i, "tvar") < 0.2:
        title = title + " : a new edition"

    if _u(seed, "rec", i, "prov") < 0.4:
        provision = None
    else:
        city = _pick(_CITIES, seed, "ent", ent, "city")
        pub = _pick(_PUBLISHERS, seed, "ent", ent, "pub")
        year = attrs["birth"] + 20 + _h64(seed, "rec", i, "pyear") % 40
        provision = f"{city} : {pub}, {year}"

    subjects = None if _u(seed, "rec", i, "subj") < 0.25 else attrs["subjects"]
    roles = _pick(_ROLES, seed, "rec", i, "role")

    text = " | ".join([person, title, provision or "", subjects or ""])

    # hot hosts: ~5% of rows on 3 hosts (skew fixture, FIXTURES.md §1)
    if _u(seed, "rec", i, "hot") < 0.05:
        host = _h64(seed, "rec", i, "hh") % 3
    else:
        host = 3 + _h64(seed, "rec", i, "host") % n_hosts
    record_id = f"r{i:09d}"
    url = f"https://host{host}.example/p/{record_id}"

    lu = _u(seed, "rec", i, "lang")
    lang = "en" if lu < 0.9 else ("de" if lu < 0.94 else ("fr" if lu < 0.97 else "zh"))

    html = (
        "<html><head><title>" + title + "</title>"
        f'<meta name="record-id" content="{record_id}"/></head>'
        f'<body><h1 class="person">{person}</h1>'
        f'<div class="provision">{provision or ""}</div>'
        f'<div class="subjects">{subjects or ""}</div>'
        f"<main>{text}</main></body></html>"
    ).encode("utf-8")

    ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(seconds=i)

    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang,
        "record_id": record_id,
        "entity_id": ent,
        "person": person,
        "title": title,
        "provision": provision,
        "subjects": subjects,
        "roles": roles,
    }


def generate_corpus(
    spark: SparkSession,
    n_records: int = 2000,
    n_entities: int | None = None,
    seed: int = 42,
    n_hosts: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Full corpus with ground truth columns. Distributed generation:
    spark.range partitions the id space; each Arrow batch is built in
    pandas. Select PAGES_COLUMNS for the canonical input table."""
    if n_entities is None:
        n_entities = max(2, n_records // 8)
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_make_row(seed, int(i), n_entities, n_hosts) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_records, numPartitions=partitions)
        .mapInPandas(gen, schema=FULL_SCHEMA)
    )


def pages_view(corpus: DataFrame) -> DataFrame:
    return corpus.select(*PAGES_COLUMNS)


def labeled_pairs(corpus: DataFrame, max_pos_per_entity: int = 200) -> DataFrame:
    """Deterministic labeled pairs from the generated corpus:
    positives = consecutive records within an entity (by record_id),
    hard negatives = same-surname cross-entity record pairs, plus the
    reference's (left, right, match) shape (src/preprocessing.py:237-247).
    """
    from pyspark.sql import Window

    recs = corpus.select(
        "record_id",
        "entity_id",
        F.split(F.col("person"), ",").getItem(0).alias("surname_token"),
    )
    w = Window.partitionBy("entity_id").orderBy("record_id")
    within = (
        recs.withColumn("nxt", F.lead("record_id").over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("rn") <= max_pos_per_entity))
        .select(
            F.col("record_id").alias("left"),
            F.col("nxt").alias("right"),
            F.lit(True).alias("match"),
        )
    )
    l = recs.alias("l")
    r = recs.alias("r")
    wneg = Window.partitionBy("l.record_id").orderBy("r.record_id")
    hard_negatives = (
        l.join(r, on=(F.col("l.surname_token") == F.col("r.surname_token")))
        .filter(F.col("l.entity_id") != F.col("r.entity_id"))
        .filter(F.col("l.record_id") < F.col("r.record_id"))
        .withColumn("rn", F.row_number().over(wneg))
        .filter(F.col("rn") <= 2)
        .select(
            F.col("l.record_id").alias("left"),
            F.col("r.record_id").alias("right"),
            F.lit(False).alias("match"),
        )
    )
    # random cross-entity negatives: without them a trained model never
    # sees the "names share nothing" region of feature space and can
    # assign it arbitrary scores. Pairing is derived from
    # xxhash64(record_id) buckets — records shuffle into 64 hash
    # buckets, are ordered by a second hash WITHIN each bucket
    # (parallel windows, never a global sort), and consecutive rows
    # pair up. Deterministic, no driver actions, scales with buckets.
    n_buckets = 64
    hashed = recs.withColumn(
        "_b", F.pmod(F.xxhash64("record_id"), F.lit(n_buckets))
    )
    wb = Window.partitionBy("_b").orderBy(
        F.xxhash64(F.lit("pair-shuffle"), F.col("record_id")), F.col("record_id")
    )
    ranked = hashed.withColumn("_rn", F.row_number().over(wb))
    a = ranked.filter(F.col("_rn") % 2 == 1).withColumn("_k", (F.col("_rn") + 1) / 2)
    b = ranked.filter(F.col("_rn") % 2 == 0).withColumn("_k", F.col("_rn") / 2)
    random_negatives = (
        a.alias("a")
        .join(b.alias("b"), on=["_b", "_k"])
        .filter(F.col("a.entity_id") != F.col("b.entity_id"))
        .select(
            F.least(F.col("a.record_id"), F.col("b.record_id")).alias("left"),
            F.greatest(F.col("a.record_id"), F.col("b.record_id")).alias("right"),
            F.lit(False).alias("match"),
        )
    )
    return (
        within.unionByName(hard_negatives)
        .unionByName(random_negatives)
        .dropDuplicates(["left", "right"])
    )
