"""JSONL transcripts source: the wire format LLM-pipeline corpora
actually arrive in (one JSON object per line), read into the engine's
canonical transcripts schema.

north_rule input shape: (conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp). Spark-first: the native JSON
reader with an EXPLICIT schema (schema inference is a full extra scan
of 100 TB — never at scale), PERMISSIVE mode, and a retained
``_corrupt_record`` column so malformed lines are COUNTED and
quarantined instead of silently dropped (the tick parser's
silent-drop semantics are the reference's contract for ITS format —
ref:ticks.c — but JSON corpora need the audit trail).

``read_transcripts_jsonl`` returns (clean_df, corrupt_df): the clean
frame in canonical column order and types, and the quarantine frame of
raw corrupt lines for inspection/replay. Timestamps accept epoch
seconds (number) or ISO-8601 strings — both appear in the wild; the
parse goes through one explicit coalesce, not locale-dependent
inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_FIELDS = (
    "conv_id string, turn_idx int, role string, text string, tool string"
)
_READ_SCHEMA = (
    f"{TRANSCRIPT_FIELDS}, ts string, _corrupt_record string"
)


def read_transcripts_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) frames from a JSONL transcripts directory/file."""
    raw = (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark disallows scans whose referenced columns are ONLY the
    # internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # carrying conv_id (NULL for truly unparseable lines) keeps the
    # query legal without caching the raw scan
    corrupt = raw.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line"), "conv_id"
    )
    # epoch-seconds (integer/float rendered as digits) or ISO-8601
    ts = F.when(
        F.col("ts").rlike(r"^\d+(\.\d+)?$"),
        F.timestamp_seconds(F.col("ts").cast("double")),
    ).otherwise(F.to_timestamp("ts"))
    clean = (
        raw.where(F.col("_corrupt_record").isNull())
        .where(F.col("conv_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            "tool",
            ts.alias("ts"),
        )
    )
    return clean, corrupt
