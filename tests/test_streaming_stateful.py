"""applyInPandasWithState sessionization == the batch sessionize query
on the same events, with sessions spanning micro-batch boundaries."""

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint"
    )


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    from knowledgeextraction_spark.streaming.stateful import sessionize_stream

    t0 = dt.datetime(2025, 1, 1)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: u1 has an open session; u2 closes one inside the batch
    batch1 = [
        (1, at(0), 10),
        (1, at(5), 11),
        (2, at(0), 20),
        (2, at(120), 21),  # >30 min gap → closes u2 session 0 in-batch
    ]
    # batch 2: u1's new event 2h later closes u1 session 0 (state
    # crossed the micro-batch boundary); u2 continues session 1
    batch2 = [
        (1, at(300), 12),
        (2, at(125), 22),
    ]
    in_dir = str(tmp_path / "in")
    _events(spark, batch1).coalesce(1).write.mode("append").parquet(in_dir)
    _events(spark, batch2).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, event_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)

    got = {
        (r.user_id, r.session_id, r.n_events, r.first_event, r.last_event)
        for r in spark.read.parquet(out_dir).collect()
    }
    # closed sessions only (1-based ids like the batch query):
    # u2 session 1 (1 event), u1 session 1 (2 events)
    assert got == {(2, 1, 1, 20, 20), (1, 1, 2, 10, 11)}, got


def test_stateful_closed_sessions_match_batch_query(spark, tmp_path):
    """Property: stream-closed sessions == the batch sessionize query's
    rows for every session except each user's last (still open)."""
    import numpy as np

    from knowledgeextraction_spark.queries_relational import q_sessionize
    from knowledgeextraction_spark.streaming.stateful import sessionize_stream

    rng = np.random.default_rng(3)
    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for u in range(5):
        minutes = np.cumsum(rng.integers(1, 90, size=20))
        # event ids deliberately NOT monotone in ts: the batch query's
        # min/max aggregates must match regardless of id order
        ids = rng.permutation(1000 * u + np.arange(20))
        for m, eid in zip(minutes, ids):
            rows.append((u, t0 + dt.timedelta(minutes=int(m)), int(eid)))
    in_dir = str(tmp_path / "in")
    # three arbitrary micro-batch splits
    for chunk in (rows[:30], rows[30:70], rows[70:]):
        _events(spark, chunk).coalesce(1).write.mode("append").parquet(in_dir)

    # batch reference on the SAME parquet dir (q_sessionize reads
    # events.parquet from a dir; replicate its logic inline instead)
    ev = spark.read.parquet(in_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    batch = (
        ev.withColumn("new_s", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_s").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )
    last_sess = batch.groupBy("user_id").agg(F.max("session_id").alias("last"))
    want = {
        tuple(r)
        for r in batch.join(last_sess, "user_id")
        .filter(F.col("session_id") < F.col("last"))
        .select("user_id", "session_id", "n_events", "first_event", "last_event")
        .collect()
    }

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, event_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert got == want and len(got) > 5


def test_neardup_stream_matches_batch_lsh_rule(spark, tmp_path):
    """Incremental minhash-LSH dedup: the stream's per-bucket
    representatives must equal the batch rule rep = min(doc_id) over
    (band, sig) when drops ascend in doc_id — including state carried
    ACROSS micro-batches (replicas of batch-1 docs arrive in batch 3) —
    and every planted exact replica must fold to keep=false with its
    source as dup_of."""
    from pyspark.sql import functions as F

    from knowledgeextraction_spark.operators.dedup import minhash_signatures
    from knowledgeextraction_spark.streaming.stateful import neardup_stream

    base = [
        (i, f"doc number {i} talks about topic {i % 3} with several shared words "
            f"plus unique marker {i} here")
        for i in range(8)
    ]
    near = [(20, base[0][1].replace("marker 0", "marker twenty"))]  # near-dup of 0
    exact = [(100 + i, base[i][1]) for i in (0, 3, 5)]  # exact replicas
    drops = [base[:4], base[4:] + near, exact]  # ascending doc_id ranges

    in_dir = str(tmp_path / "in")
    import os as _os
    import time as _time

    for i, chunk in enumerate(drops):
        df = spark.createDataFrame(chunk, "doc_id bigint, text string")
        df.coalesce(1).write.mode("append").parquet(in_dir)
        t_stamp = 1_600_000_000 + i * 3600
        for f_name in _os.listdir(in_dir):
            p = _os.path.join(in_dir, f_name)
            if f_name.endswith(".parquet"):
                st = _os.stat(p)
                if st.st_mtime > 1_600_000_000 + i * 3600 - 1:
                    _os.utime(p, (t_stamp, t_stamp))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        neardup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {
        (r.doc_id, r.band): r.rep_id for r in spark.read.parquet(out_dir).collect()
    }

    # batch rule over the same docs: rep = min(doc_id) per (band, sig)
    all_docs = spark.createDataFrame(
        [d for chunk in drops for d in chunk], "doc_id bigint, text string"
    )
    sig = minhash_signatures(all_docs)
    rep = sig.groupBy("band", "sig").agg(F.min("doc_id").alias("rep_id"))
    want = {
        (r.doc_id, r.band): r.rep_id for r in sig.join(rep, ["band", "sig"]).collect()
    }
    assert got == want and len(got) == 12 * 8

    # per-doc fold: exact replicas (identical shingles ⇒ identical band
    # sigs, which arrived in an earlier batch) see exactly their
    # source's bucket reps and fold to keep=false; the near-dup hits at
    # least one earlier bucket; the globally-minimal doc keeps
    import collections

    verdict = collections.defaultdict(set)
    for (doc, _band), rep_id in got.items():
        verdict[doc].add(rep_id)
    for rid, src in ((100, 0), (103, 3), (105, 5)):
        assert verdict[rid] == verdict[src], (rid, verdict[rid], verdict[src])
        assert all(r < rid for r in verdict[rid])  # keep=false fold
    assert any(r < 20 for r in verdict[20])  # near-dup dropped
    assert verdict[0] == {0}  # the global-min doc keeps everything it opened
