"""Custom stateful streaming operator (SURVEY.md §2.1 S3 extension).

``conversation_entity_state``: a per-conversation running entity memory
maintained across micro-batches with ``applyInPandasWithState`` — the
Structured Streaming analogue of the reference server keeping per-
connection context (/root/reference/src/FrogAPI.cxx:1619-1797), except
state here is keyed, fault-tolerant, and checkpointed by the engine.

Each update emits the conversation's cumulative turn count and entity
mention histogram (gazetteer-matched, broadcast dictionary — the cheap
N7-style path, appropriate for a streaming hot loop).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", LongType(), False),
        StructField("n_entity_mentions", LongType(), False),
        StructField("top_entity", StringType(), True),
        StructField("top_entity_count", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType(), False),
        StructField("ent_names", ArrayType(StringType()), False),
        StructField("ent_counts", ArrayType(LongType()), False),
    ]
)


def conversation_entity_state(
    stream: DataFrame,
    gazetteer_names: Iterable[str],
    state_ttl_minutes: int = 60,
) -> DataFrame:
    """stream: streaming transcript turns -> per-conversation running
    entity stats, one output row per conversation per micro-batch.

    State per conversation expires ``state_ttl_minutes`` after its last
    turn (processing-time timeout) — without a TTL the state store grows
    monotonically with every conv_id ever seen, which is unbounded on
    the target stream. Gazetteer names are matched as TOKEN N-GRAMS up
    to the longest entry ('Algemene Rekenkamer' is two tokens; a
    single-token scan can never count it)."""
    from frog_spark.operators.tokenizer import tokenize_text

    name_set = {n.lower() for n in gazetteer_names}
    max_n = max((len(n.split()) for n in name_set), default=1)

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n_turns, names, counts = state.get
            hist = dict(zip(names, counts))
        else:
            n_turns, hist = 0, {}
        for pdf in pdfs:
            n_turns += len(pdf)
            for text in pdf["text"]:
                toks = [t.word.lower() for t in tokenize_text(text or "")]
                i = 0
                while i < len(toks):
                    # longest match first per position; a match CONSUMES
                    # its tokens, so a name nested inside a longer
                    # matched name ('rekenkamer' in 'algemene
                    # rekenkamer') is not double-counted
                    matched = 0
                    for n in range(min(max_n, len(toks) - i), 0, -1):
                        g = " ".join(toks[i : i + n])
                        if g in name_set:
                            hist[g] = hist.get(g, 0) + 1
                            matched = n
                            break
                    i += matched or 1
        state.update((n_turns, list(hist.keys()), list(hist.values())))
        state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        top = max(hist.items(), key=lambda kv: (kv[1], kv[0]), default=(None, 0))
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_turns": n_turns,
                    "n_entity_mentions": sum(hist.values()),
                    "top_entity": top[0],
                    "top_entity_count": top[1],
                }
            ]
        )

    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
