"""Deterministic synthetic transcript corpus (FIXTURES.md F1).

Schema from BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Sentences follow the reference test corpora patterns
(/root/reference/tests/tst.txt, tests/test.txt, test/problems.txt):
Dutch news text with names, quotes, dates, ALL-CAPS lines, unicode
apostrophes. conv_id is skewed (a few hot conversations) to exercise
salting; turn_idx is dense 0..n per conv and ts monotone per conv.

Generation is pure-function deterministic (seed -> rows), so the same
corpus can be rebuilt on the driver or distributed via
``spark.range(n_turns).mapInPandas`` without materializing it driver-side
— the distributed path is what a 10^12-turn run uses.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# Sentence inventory modeled on the reference test corpora (see
# /root/reference/tests/tst.txt, tests/test.txt, test/problems.txt).
# The first entry is the golden-test sentence (tests/tst.ok covers it).
SENTENCES: list[str] = [
    "Dit is een test van Frog op de datum 09-01-2012!",
    "De oprichter van Wikipedia, Jimmy Wales, wil een nieuwe zoekmachine lanceren.",
    "Dit meldt de Britse krant The Times.",
    "Wales hoopt dat de nieuwe zoekmachine kan concurreren met Google en Yahoo.",
    "Wikiasari maakt gebruik van dezelfde technologie als Wikipedia zelf.",
    "Google is een zeer goede zoekmachine maar vaak levert een zoekresultaat niets op.",
    "Probeer maar eens te zoeken op Tampa Hotels.",
    "Je komt geen bruikbare resultaten tegen.",
    "Het algoritmische zoekprogramma van Google zou volgens Wales makkelijk zijn.",
    "Wij hebben een veel betere manier om een pagina te beoordelen.",
    "Meestal is een seconde genoeg om te bepalen of een website goed is.",
    "De goede reputatie moet garant staan voor een betrouwbare zoekmachine.",
    "Ik denk dat ik en jij beide naar de stad gaan.",
    "Dit pikt Tadpole niet!",
    "DIT IS EEN TADPOLE BUG.",
    "de kat en zo'n hond, weet je wel?",
    "jan kopieert het boek en het geld",
    "de Algemene Rekenkamer controleert de uitgaven.",
    "De minister bezoekt de Tweede Kamer in Den Haag.",
    "Anna leest een boek over de geschiedenis van Nederland.",
    "Piet verkoopt zijn oude fiets aan Jan.",
    "De verzekering dekt de schade niet.",
    "Hangende het onderzoek werden we verwezen naar de website.",
    "De nieuwe directeur van Philips presenteert de resultaten morgen.",
    "Hij is met name bekend om Wikipedia.",
    "Dhr. Jansen verkoopt drie fietsen.",
    "Ten slotte bezoekt hij de 3e verdieping.",
    "\"Dit is prachtig\", zegt Anna.",
    "De heer Smit werkt bij dhr. Visser in Rotterdam.",
    "Waarom levert de nieuwe aanpak geen betere resultaten op?",
]

ROLES = ["user", "assistant", "tool"]
TOOLS = [None, None, None, "search", "calculator", "browser"]

# Variant substitution pools (bench corpora): swapping names/dates yields
# realistically-distinct sentences so executor-side caches see real miss
# rates while sentence STRUCTURE (and thus per-sentence cost) stays fixed.
_VARIANT_PERSONS = [
    f"{n}{i}" for i in range(1, 21)
    for n in ("Jansen", "Bakker", "Visser", "Smit", "Meyer", "Mulder",
              "Bos", "Vos", "Peters", "Hendriks")
]
_VARIANT_ORGS = [
    f"{n}{i}" for i in range(1, 11)
    for n in ("Altavista", "Lycos", "Infoseek", "Excite", "Webcrawler")
]
_PERSON_TOKENS = {"Anna", "Piet", "Jan", "Jimmy", "Wales", "Frog", "Tadpole"}
_ORG_TOKENS = {"Wikipedia", "Google", "Yahoo", "Philips", "Wikiasari"}


def _variant_sentence(sent: str, rng: random.Random) -> str:
    out = []
    for tok in sent.split(" "):
        bare = tok.strip(".,!?")
        suffix = tok[len(bare):]
        if bare in _PERSON_TOKENS:
            out.append(_VARIANT_PERSONS[rng.randrange(len(_VARIANT_PERSONS))] + suffix)
        elif bare in _ORG_TOKENS:
            out.append(_VARIANT_ORGS[rng.randrange(len(_VARIANT_ORGS))] + suffix)
        elif bare == "09-01-2012":
            out.append(
                f"{rng.randrange(1, 29):02d}-{rng.randrange(1, 13):02d}-{rng.randrange(1990, 2026)}"
                + suffix
            )
        else:
            out.append(tok)
    return " ".join(out)


def _conv_ids(n_convs: int, rng: random.Random) -> list[str]:
    return [f"conv-{i:06d}" for i in range(n_convs)]


def generate_rows(
    n_turns: int,
    n_convs: int | None = None,
    seed: int = 42,
    skew: float = 1.5,
) -> pd.DataFrame:
    """Driver-side deterministic generation (small scales / tests).

    conv sizes follow a Zipf-ish distribution: conv 0 is the hot key
    (~``skew`` * mean size) so salting has something to chew on.
    """
    if n_convs is None:
        n_convs = max(1, n_turns // 12)
    rng = random.Random(seed)
    convs = _conv_ids(n_convs, rng)
    # Zipf-ish weights: weight_i ~ 1/(i+1)^0.7, conv 0 hottest.
    weights = [(1.0 / (i + 1) ** 0.7) ** skew for i in range(n_convs)]
    total_w = sum(weights)
    rows = []
    base_ts = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    # Allocate turn counts per conv deterministically.
    counts = [max(1, int(round(n_turns * w / total_w))) for w in weights]
    # Trim/extend to exactly n_turns.
    while sum(counts) > n_turns:
        counts[counts.index(max(counts))] -= 1
    i = 0
    while sum(counts) < n_turns:
        counts[i % n_convs] += 1
        i += 1
    for ci, (conv, cnt) in enumerate(zip(convs, counts)):
        crng = random.Random(seed * 1_000_003 + ci)
        for t in range(cnt):
            n_sents = 1 + (crng.random() < 0.3)
            sents = [SENTENCES[crng.randrange(len(SENTENCES))] for _ in range(n_sents)]
            role = ROLES[t % 3] if crng.random() < 0.9 else ROLES[crng.randrange(3)]
            tool = TOOLS[crng.randrange(len(TOOLS))] if role == "tool" else None
            rows.append(
                (
                    conv,
                    t,
                    role,
                    " ".join(sents),
                    tool,
                    base_ts + _dt.timedelta(seconds=ci * 9001 + t * 37),
                )
            )
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return df


def transcripts_df(
    spark: SparkSession,
    n_turns: int = 480,
    n_convs: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Small-scale corpus as a Spark DataFrame (driver-generated)."""
    pdf = generate_rows(n_turns, n_convs, seed)
    pdf["ts"] = pdf["ts"].dt.tz_localize(None)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def transcripts_df_distributed(
    spark: SparkSession,
    n_turns: int,
    n_convs: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
    variants: bool = False,
) -> DataFrame:
    """Scale path: generate the corpus ON the executors.

    ``spark.range`` assigns each task a conv-id range; each task generates
    its convs' turns locally via ``mapInPandas`` — no driver materialization,
    so the same code generates 10^9 turns on a cluster.
    """
    if n_convs is None:
        n_convs = max(1, n_turns // 12)
    turns_per_conv = max(1, n_turns // n_convs)
    rng_base = spark.range(
        0, n_convs, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_ts = _dt.datetime(2025, 1, 1)
        for b in batches:
            out = []
            for ci in b["id"]:
                ci = int(ci)
                conv = f"conv-{ci:06d}"
                crng = random.Random(seed * 1_000_003 + ci)
                # hot head conv gets skew x turns
                cnt = turns_per_conv * (3 if ci == 0 else 1)
                for t in range(cnt):
                    n_sents = 1 + (crng.random() < 0.3)
                    sents = [
                        SENTENCES[crng.randrange(len(SENTENCES))]
                        for _ in range(n_sents)
                    ]
                    if variants:
                        sents = [_variant_sentence(s, crng) for s in sents]
                    role = (
                        ROLES[t % 3] if crng.random() < 0.9 else ROLES[crng.randrange(3)]
                    )
                    tool = TOOLS[crng.randrange(len(TOOLS))] if role == "tool" else None
                    out.append(
                        (
                            conv,
                            t,
                            role,
                            " ".join(sents),
                            tool,
                            base_ts + _dt.timedelta(seconds=ci * 9001 + t * 37),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return rng_base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: view the driver's ``documents`` parquet as a transcript table.

    Deterministic mapping so Spark and the DuckDB oracle agree:
    conv_id = doc_id // 8, turn_idx = doc_id % 8.
    """
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return doc.select(
        F.format_string("conv-%06d", (F.col("doc_id") / 8).cast("long")).alias(
            "conv_id"
        ),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
