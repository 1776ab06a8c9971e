"""Streaming curation stages: online exact dedup + quality gate for
an incrementally-ingested document corpus.

A 100 TB training corpus is rarely assembled in one batch — crawls and
feeds land continuously, and the cheap curation stages belong at
ingest time so the lake only accumulates documents that can survive
them. This module runs the batch operators' exact semantics under
Structured Streaming:

* :func:`streaming_exact_dedup` — first-seen-wins exact dedup on a
  content digest across micro-batches, via the engine's keyed state
  store (``dropDuplicates`` on the digest column).  State is one
  ~32-byte digest per distinct document, checkpointed — the stream
  restarts without re-admitting previously seen content.  Unbounded
  by default (a corpus digest set IS unbounded state, sized at
  ~digest × distinct docs — 3 GB per 100M docs, a deliberate cost);
  pass ``watermark=(ts_col, delay)`` to bound state by event time
  when upstream guarantees duplicates arrive within the window
  (``dropDuplicatesWithinWatermark``).
* :func:`streaming_quality_gate` — the batch quality gate's
  expressions (token count + mean-token-length) applied per row;
  stateless, identical to ``curate_corpus`` stage 4 on the same text
  (near-dup and layout stages stay batch: candidate joins and prefix
  sums need corpus-wide visibility; the reference point is
  Kafka-style ingest → landed parquet → periodic batch compaction,
  the same split the store uses for samples).

Both return transformed streaming frames — compose them between
``readStream`` and ``writeStream`` like any projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_expr


def streaming_exact_dedup(
    stream: DataFrame,
    cols: list[str],
    watermark: tuple[str, str] | None = None,
    digest_col: str = "_digest",
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming frame.

    ``cols`` are digested (sha256 over a 0x1e-joined concat — the
    batch ``exact_dedup`` digest, ``dedup.py``) and duplicates of any
    previously-seen digest are dropped via the streaming state store.
    Batch-mode parity: on a non-streaming frame this degrades to the
    same ``dropDuplicates``, keeping an arbitrary row per digest —
    use batch ``exact_dedup`` when min-id representatives matter.

    ``watermark=(ts_col, "10 minutes")`` switches to
    ``dropDuplicatesWithinWatermark``: state is evicted once the
    watermark passes, bounding it for sources whose duplicates are
    time-local (retries, at-least-once replays) rather than global.
    """
    digest = F.sha2(
        F.concat_ws("\x1e", *[F.col(c) for c in cols]), 256
    )
    out = stream.withColumn(digest_col, digest)
    if watermark is not None:
        ts_col, delay = watermark
        out = out.withWatermark(ts_col, delay)
        deduped = out.dropDuplicatesWithinWatermark([digest_col])
    else:
        deduped = out.dropDuplicates([digest_col])
    return deduped.drop(digest_col)


def streaming_quality_gate(
    stream: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_mean_token_len: float = 40.0,
) -> DataFrame:
    """The batch quality gate (``curate_corpus`` stage 4) as a
    stateless streaming projection: keep documents with at least
    ``min_tokens`` whitespace tokens and a mean token length at most
    ``max_mean_token_len``.  Adds ``n_tokens``."""
    out = stream.withColumn(
        "n_tokens", F.size(tokens_expr(F.col(text_col)))
    )
    return out.filter(
        (F.col("n_tokens") >= min_tokens)
        & (
            F.when(
                F.col("n_tokens") > 0,
                F.length(text_col) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0))
            <= max_mean_token_len
        )
    )
