"""ungoliant_spark — a PySpark-native language-ID + quality-filter +
PII/toxicity-scrub engine with the decision semantics of
oscar-project/ungoliant (reference at /root/reference, Rust).

This is NOT a port: the reference is a single-process rayon iterator
pipeline over gzipped WET shards; this engine is a Catalyst/DataFrame
job over Iceberg/Parquet tables of audio clip + transcript pairs.
Every heuristic rule is expressed as built-in Spark SQL expressions
(higher-order array functions, regex) so it stays inside whole-stage
codegen; only the model operators (fastText-style LID, ARPA
perplexity, TLSH) are vectorized Arrow pandas UDFs.
"""

__version__ = "0.1.0"
