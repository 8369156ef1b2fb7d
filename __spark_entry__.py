"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship heuristic quality-filter query on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
                EXACTLY 50 entries: the driver's correctness artifact
                records at most 50 rows (r05 registered 46 -> recorded
                46; r06 registered 52 -> recorded exactly the first 50
                in dict order), so tightly-coupled operator pairs share
                a combined, still fully value-hashed row (audio_signals
                = speech_rate + audio_vad; knn_ann_ivf = both quantizer
                variants) rather than silently losing coverage.
oracle_sql()  — DuckDB twins for the SQL-expressible ones.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ungoliant_spark import oracle_sql as osql
from ungoliant_spark import oracle_sql_clips as osqlc
from ungoliant_spark import oracle_sql_dataset as osqld
from ungoliant_spark.plans import clips_queries as cq
from ungoliant_spark.plans import dataset_queries as dsq
from ungoliant_spark.plans import document_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: heuristic keep/drop + PII scrub over sf0.001."""
    return dq.q_heuristic_keep(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # quality-filter stages (reference operators, SURVEY.md §2)
        "trim_bounds": dq.q_trim_bounds,
        "pfilter": dq.q_pfilter,
        "quality_annotations": dq.q_quality_annotations,
        "heuristic_keep": dq.q_heuristic_keep,
        "pii_scrub": dq.q_pii_scrub,
        "keep_stats": dq.q_keep_stats,
        "meanlength": dq.q_meanlength,
        "conv_trim": dq.q_conv_trim,
        # training-data pipeline ops
        "dedup_exact": dsq.q_dedup_exact,
        "dedup_reps": dsq.q_dedup_reps,
        "dedup_stats": dsq.q_dedup_stats,
        "dedup_against": dsq.q_dedup_against,
        "decontam_flags": dsq.q_decontam_flags,
        "dedup_components": dsq.q_dedup_components,
        "dedup_components_rep": dsq.q_dedup_components_rep,
        "dedup_components_minhash": dsq.q_dedup_components_minhash,
        "dedup_components_jaccard": dsq.q_dedup_components_jaccard,
        "dedup_components_embedding": dsq.q_dedup_components_embedding,
        "dedup_jaccard": dsq.q_dedup_jaccard,
        "dedup_minhash": dsq.q_dedup_minhash,
        "dedup_embedding": dsq.q_dedup_embedding,
        "simhash": dsq.q_simhash,
        "dedup_simhash_pairs": dsq.q_dedup_simhash_pairs,
        "knn_cosine": dsq.q_knn_cosine,
        "knn_ann_lsh": dsq.q_knn_ann_lsh,
        "knn_ann_ivf": dsq.q_knn_ann_ivf,
        "curation_sample": dsq.q_curation_sample,
        "curation_pack_tokens": dsq.q_curation_pack_tokens,
        "curation_topk": dsq.q_curation_topk,
        "curation_sequences": dsq.q_curation_sequences,
        "repetition_signals": dsq.q_repetition_signals,
        "text_stats": dsq.q_text_stats,
        "quality_by_source": dsq.q_quality_by_source,
        "zipf_check": dsq.q_zipf_check,
        "events_hourly": dsq.q_events_hourly,
        "events_running_avg": dsq.q_events_running_avg,
        "events_sessions": dsq.q_events_sessions,
        "events_sessions_streaming": dsq.q_events_sessions_streaming,
        "stream_dedup": dsq.q_stream_dedup,
        # clips-table model/binary ops (fixture-expected-table oracles
        # + F1/SNR/parity gates in tests/)
        "clips_decisions": cq.q_clips_decisions,
        "clips_kept": cq.q_clips_kept,
        "lid_documents": cq.q_lid_documents,
        "audio_stats": cq.q_audio_stats,
        "audio_frames": cq.q_audio_frames,
        "audio_resample": cq.q_audio_resample,
        "audio_quality": cq.q_audio_quality,
        "audio_dup_pairs": cq.q_audio_dup_pairs,
        "audio_dup_components": cq.q_audio_dup_components,
        "audio_dedup_against": cq.q_audio_dedup_against,
        "audio_signals": cq.q_audio_signals,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "trim_bounds": osql.oracle_trim_bounds(),
        "pfilter": osql.oracle_pfilter(),
        "quality_annotations": osql.oracle_quality_annotations(),
        "heuristic_keep": osql.oracle_heuristic_keep(),
        "pii_scrub": osql.oracle_pii_scrub(),
        "keep_stats": osql.oracle_keep_stats(),
        "meanlength": osql.oracle_meanlength(),
        "conv_trim": osql.oracle_conv_trim(),
        "dedup_exact": osqld.oracle_dedup_exact(),
        "dedup_reps": osqld.oracle_dedup_reps(),
        "dedup_stats": osqld.oracle_dedup_stats(),
        "dedup_against": osqld.oracle_dedup_against(),
        "decontam_flags": osqld.oracle_decontam_flags(),
        "dedup_components": osqld.oracle_dedup_components(),
        "dedup_components_rep": osqld.oracle_dedup_components(),
        "dedup_components_minhash": osqld.oracle_dedup_components_minhash(),
        "dedup_components_jaccard": osqld.oracle_dedup_components_jaccard(),
        "dedup_components_embedding": osqld.oracle_dedup_components_embedding(),
        "dedup_jaccard": osqld.oracle_dedup_jaccard(),
        "dedup_minhash": osqld.oracle_dedup_minhash(),
        "dedup_embedding": osqld.oracle_dedup_embedding(0.5),
        "simhash": osqld.oracle_simhash(),
        "dedup_simhash_pairs": osqld.oracle_dedup_simhash_pairs(),
        "knn_cosine": osqld.oracle_knn_cosine(),
        "knn_ann_lsh": osqld.oracle_knn_ann_lsh(),
        "knn_ann_ivf": osqld.oracle_knn_ann_ivf_variants(),
        "curation_sample": osqld.oracle_curation_sample(),
        "curation_pack_tokens": osqld.oracle_curation_pack_tokens(),
        "curation_topk": osqld.oracle_curation_topk(),
        "curation_sequences": osqld.oracle_curation_sequences(),
        "repetition_signals": osqld.oracle_repetition_signals(),
        "text_stats": osqld.oracle_text_stats(),
        "quality_by_source": osqld.oracle_quality_by_source(),
        "zipf_check": osqld.oracle_zipf_check(),
        "events_hourly": osqld.oracle_events_hourly(),
        "events_running_avg": osqld.oracle_events_running_avg(),
        "events_sessions": osqld.oracle_events_sessions(),
        "events_sessions_streaming": osqld.oracle_events_sessions_streaming(),
        "stream_dedup": osqld.oracle_stream_dedup(),
        # clips-table model/binary ops: fixture-expected-table oracles
        # (ground truth computed outside Spark; see oracle_sql_clips)
        "clips_decisions": osqlc.oracle_clips_decisions(),
        "clips_kept": osqlc.oracle_clips_kept(),
        "lid_documents": osqlc.oracle_lid_documents(),
        "audio_stats": osqlc.oracle_audio_stats(),
        "audio_frames": osqlc.oracle_audio_frames(),
        "audio_resample": osqlc.oracle_audio_resample(),
        "audio_quality": osqlc.oracle_audio_quality(),
        "audio_dup_pairs": osqlc.oracle_audio_dup_pairs(),
        "audio_dup_components": osqlc.oracle_audio_dup_components(),
        "audio_dedup_against": osqlc.oracle_audio_dedup_against(),
        "audio_signals": osqlc.oracle_audio_signals(),
    }
