"""Streaming deduplication with bounded state.

The batch dedup tiers (operators/dedup.py) assume the corpus is at
rest; an ingest pipeline needs the same guarantee on a stream —
at-least-once sources (file drops, Kafka with producer retries)
deliver duplicates, and the reference's answer (re-running the batch
dedup over the whole accumulated history, reference
jobs/create_employee_all.py:74-81) is O(history) per micro-batch.

``dropDuplicatesWithinWatermark`` keeps one state entry per key and
EXPIRES it once the watermark passes, so state is bounded by
(key arrival rate x watermark horizon), not by stream lifetime —
plain ``dropDuplicates`` on a stream grows state forever and is a
guaranteed OOM at 100 TB/day. The cost: a duplicate arriving later
than the horizon is re-emitted; pick the horizon from the source's
actual redelivery window (file-drop retries: minutes; Kafka
transactional replays: the transaction timeout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_scd_spark.functions.time import as_event_time


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Drop per-key duplicates arriving within ``horizon`` of the
    first occurrence. ``events`` must be a streaming DataFrame; the
    watermark on ``ts_col`` both gates state expiry here and feeds
    any downstream windowed aggregation."""
    events = events.withColumn(ts_col, as_event_time(ts_col))
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(keys)
    )


def neardup_filter_batch(
    signature_store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    accept_sink=None,
):
    """foreachBatch near-duplicate filter against a persisted
    MinHash signature store — the continuous-ingest form of the batch
    dedup tiers.

    Per micro-batch:
      1. band signatures are computed for the batch's documents
         (operators/dedup.py minhash pipeline, same parameters);
      2. a document is REJECTED if any of its band signatures already
         exists in the store (near-dup of previously accepted corpus)
         — or collides with an earlier doc of the same batch (the
         within-batch tiebreak keeps the minimum id);
      3. survivors' band signatures are appended to the store and the
         surviving rows handed to ``accept_sink(df, batch_id)``.

    The store holds (band, sig) pairs only — |accepted docs| x bands
    rows of two longs, independent of document size, so state stays
    compact at corpus scale; the membership check is one join per
    batch (broadcast while the store is small, shuffle after). Band
    membership without an exact-verify tier is the standard
    signature-store trade: it admits the LSH false-positive rate
    (~(1-(1-j^r)^b) at jaccard j) in exchange for never re-reading
    accepted documents' text.
    """
    import os

    from pyspark.sql import Window as W

    from pyspark_scd_spark.operators.dedup import (
        _shingles,
        _signatures_from_shingles,
    )

    def _band_sigs(df):
        sh = _shingles(df, id_col, text_col, n, None)
        sig = _signatures_from_shingles(sh, num_hashes)
        rows_per_band = num_hashes // bands
        cols = []
        for b in range(bands):
            members = [
                F.col(f"mh_{i}")
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ]
            cols.append(
                F.struct(
                    F.lit(b).alias("band"), F.xxhash64(*members).alias("sig")
                )
            )
        return sig.select(
            F.col("__id").alias(id_col),
            F.explode(F.array(*cols)).alias("bs"),
        ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    def _process(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()
        bsig = _band_sigs(batch_df).localCheckpoint()

        rejected = None
        if os.path.exists(signature_store_dir):
            store = spark.read.parquet(signature_store_dir)
            rejected = (
                bsig.join(store, ["band", "sig"], "left_semi")
                .select(id_col)
                .distinct()
            )
        # within-batch: of docs sharing a band signature, keep min id
        w = W.partitionBy("band", "sig")
        batch_losers = (
            bsig.withColumn("__min_id", F.min(id_col).over(w))
            .filter(F.col(id_col) != F.col("__min_id"))
            .select(id_col)
            .distinct()
        )
        drop = (
            batch_losers
            if rejected is None
            else rejected.unionByName(batch_losers).distinct()
        )
        survivors = batch_df.join(drop, id_col, "left_anti").localCheckpoint()
        surv_sigs = bsig.join(
            survivors.select(id_col), id_col, "left_semi"
        )
        surv_sigs.write.mode("append").parquet(signature_store_dir)
        if accept_sink is not None:
            accept_sink(survivors, batch_id)

    return _process


def debounce_stream(
    events: DataFrame,
    gap_seconds: int = 5,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Streaming twin of ``operators/sequence.debounce_events``: emit
    each burst's LEADER on arrival, suppress events while consecutive
    gaps stay ≤ ``gap_seconds`` (a suppressed event still EXTENDS the
    burst — the chained rule). State per (user, type) is ONE long (the
    burst's last event time), so state size is O(active key pairs)
    regardless of throughput; bursts spanning micro-batches chain
    correctly through the carried state.

    Emission contract: leaders are final on arrival (append mode, no
    watermark needed); suppression counts belong to the batch twin,
    which sees closed bursts. Within a micro-batch rows fold in
    (ts, id) order; cross-batch ordering is the file-replay order —
    the same contract as scd_status_stream.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000
    in_schema = events.schema
    out_schema = T.StructType(
        [
            T.StructField(id_col, in_schema[id_col].dataType),
            T.StructField(user_col, in_schema[user_col].dataType),
            T.StructField(type_col, in_schema[type_col].dataType),
            T.StructField(ts_us_col, T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_us", T.LongType())])

    def _fold(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs)).sort_values(
            [ts_us_col, id_col], kind="mergesort"
        )
        keep_id, keep_ts = [], []
        for ts, eid in zip(batch[ts_us_col], batch[id_col]):
            ts = int(ts)
            if last is None or ts - last > gap_us:
                keep_id.append(eid)  # native dtype: id may be any type
                keep_ts.append(ts)
            last = ts  # suppressed events extend the burst chain
        state.update((last,))
        yield pd.DataFrame(
            {
                id_col: keep_id,
                user_col: [key[0]] * len(keep_id),
                type_col: [key[1]] * len(keep_id),
                ts_us_col: keep_ts,
            }
        )

    return events.groupBy(user_col, type_col).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
