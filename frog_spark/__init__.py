"""frog_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of LanguageMachines/frog
(reference at /root/reference, v0.35): Ucto-style rule tokenization,
memory-based (IGTree / MBT-style) POS tagging, lemmatization, morphological
analysis, NER, IOB chunking, MWU resolution and constraint-based dependency
parsing — implemented as vectorized pandas/Arrow UDF stages over DataFrames
of multi-turn transcripts, then lifted into (subj, pred, obj) triples with
MinHash-LSH entity linking and connected-components canonicalization.

This is NOT a port: the reference is a per-sentence C++ object pipeline;
this engine is a declarative DataFrame DAG where every model is a
driver-loaded broadcast object evaluated over Arrow batches.
"""

__version__ = "0.1.0"

from frog_spark.session import get_spark  # noqa: F401
