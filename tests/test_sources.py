"""zarr-lite store round-trip (SURVEY T-RT): chunked write via
executors + Python DataSource read, one partition per chunk —
zappy's from_zarr/to_zarr semantics."""

from __future__ import annotations

import json

import numpy as np
import pytest

from zappy_spark.frame import ZappyFrame
from zappy_spark.sources.zarrlite import read_zarrlite


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(103, 7))  # deliberately not divisible by chunk
    path = str(tmp_path_factory.mktemp("zl") / "store")
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=5)
    zf.to_zarrlite(path, chunk_rows=25)
    return X, path


def test_round_trip(spark, store):
    X, path = store
    back = ZappyFrame.from_zarrlite(spark, path)
    assert back.shape == X.shape
    assert np.allclose(back.asndarray(), X)


def test_one_partition_per_chunk(spark, store):
    X, path = store
    meta = json.load(open(f"{path}/meta.json"))
    assert meta["n_chunks"] == 5  # ceil(103/25)
    df = read_zarrlite(spark, path)
    assert df.rdd.getNumPartitions() == meta["n_chunks"]
    # chunk-aligned row ranges: partition i holds rows [25i, 25(i+1))
    counts = (
        df.selectExpr("floor(row_id/25) c")
        .groupBy("c")
        .count()
        .orderBy("c")
        .collect()
    )
    assert [r["count"] for r in counts] == [25, 25, 25, 25, 3]


def test_store_is_operable(spark, store):
    """Ops compose on a store-backed frame exactly as on ingested."""
    X, path = store
    zf = ZappyFrame.from_zarrlite(spark, path)
    got = (zf.abs() + 1.0).log().sum(axis=0)
    ref = np.log(np.abs(X) + 1.0).sum(axis=0)
    assert np.allclose(got, ref)


def test_datasource_writer_round_trip(spark, tmp_path):
    """df.write.format('zarrlite'): task-per-chunk write + driver
    commit, including uneven (post-filter) chunk row counts."""
    import numpy as np

    from zappy_spark.sources.zarrlite import register_zarrlite

    register_zarrlite(spark)
    rng = np.random.default_rng(9)
    X = rng.normal(size=(50, 4))
    zf = ZappyFrame.from_ndarray(spark, X)
    # boolean filter → uneven chunks, zappy's partition_row_counts case
    kept = zf[zf.sum(axis=1) > 0, :]
    ref = X[X.sum(axis=1) > 0, :]

    path = str(tmp_path / "uneven")
    (
        kept.df.repartitionByRange(3, "row_id")
        .write.format("zarrlite")
        .option("path", path)
        .mode("append")
        .save()
    )
    meta = json.load(open(f"{path}/meta.json"))
    assert sum(meta["chunk_row_counts"]) == ref.shape[0]
    back = ZappyFrame.from_zarrlite(spark, path)
    # row ids re-densified; row ORDER preserved by range partitioning
    assert np.allclose(back.asndarray(), ref)


def test_chunk_id_expr_integer_precision(spark):
    """Chunk assignment must hold beyond int32 and near 2^53, where
    float division starts rounding (VERDICT r1 §wrong-3)."""
    from zappy_spark.sources.zarrlite import chunk_id_expr

    big = 2**31 + 7
    huge = 2**53 - 1  # largest exactly-representable double; div must
    # still assign exactly, float division of huge+odd would round
    rows = [(0,), (big,), (big + 1,), (huge,), (huge - 1,)]
    df = spark.createDataFrame(rows, "row_id bigint")
    got = {
        r["row_id"]: r["c"]
        for r in df.select(
            "row_id", chunk_id_expr(1000).alias("c")
        ).collect()
    }
    assert got == {k: k // 1000 for k, in rows}


def test_jsonl_round_trip_and_corrupt_quarantine(spark, tmp_path):
    """JSONL corpus: documents round-trip value-identical; a planted
    malformed line lands in quarantine with its raw text, and clean
    rows are unaffected (PERMISSIVE + retained corrupt column)."""
    import glob

    from pyspark.sql import functions as F

    from zappy_spark.session import load_table
    from zappy_spark.sources.jsonl import (
        read_jsonl_corpus,
        split_corrupt,
        write_jsonl,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    d = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, d)

    # plant a shard containing a corrupt line (a fresh file — editing
    # an existing shard trips Hadoop's .crc sidecar checksums)
    assert glob.glob(d + "/part-*.json")
    with open(d + "/part-99999-planted.json", "w") as f:
        f.write('{"doc_id": 7, "text": BROKEN\n')

    back = read_jsonl_corpus(spark, d, docs.schema)
    clean, quarantine = split_corrupt(back)

    q = quarantine.collect()
    assert len(q) == 1 and "BROKEN" in q[0].raw_line

    want = sorted(tuple(r) for r in docs.collect())
    got = sorted(
        tuple(r) for r in clean.select(*docs.columns).collect()
    )
    assert got == want


def test_zarrlite_stream_tail_exactly_once(spark, tmp_path):
    """Streaming tail of an append-only zarrlite store: each
    availableNow drain serves exactly the chunks appended since the
    checkpointed offset — no replays, no gaps, even when the initial
    store ends in a short (non-uniform) last chunk."""
    import numpy as np

    from zappy_spark.frame import ZappyFrame
    from zappy_spark.sources.zarrlite import (
        append_zarrlite,
        read_zarrlite,
        read_zarrlite_stream,
    )

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # 8 rows at chunk_rows=3 -> chunks of 3/3/2: the short last chunk
    # is the regression shape (uniform meta must not assume full).
    a = np.arange(24, dtype=float).reshape(8, 3)
    ZappyFrame.from_ndarray(spark, a).to_zarrlite(store, chunk_rows=3)

    def drain():
        q = (
            read_zarrlite_stream(spark, store)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 8

    append_zarrlite(store, np.full((4, 3), 99.0))
    append_zarrlite(store, np.full((2, 3), 7.0))
    drain()
    rows = spark.read.parquet(out).orderBy("row_id").collect()
    assert [r.row_id for r in rows] == list(range(14))
    assert rows[8].vec == [99.0] * 3 and rows[13].vec == [7.0] * 3

    # batch reader agrees with the drained stream
    m = read_zarrlite(spark, store).orderBy("row_id").collect()
    assert [tuple(r) for r in m] == [tuple(r) for r in rows]

    # appending a wrong width is refused before touching the store
    import pytest as _pytest

    with _pytest.raises(ValueError):
        append_zarrlite(store, np.ones((2, 5)))


def test_variant_column_persists_to_parquet(spark, tmp_path):
    """The parse-once-at-ingest contract l11 documents: a VARIANT
    column writes to parquet and reads back with typed extraction
    intact, so downstream queries never re-parse the raw string."""
    from pyspark.sql import functions as F

    from zappy_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_variant.parquet")
    (
        ev.select(
            "event_id", "event_type", F.parse_json("props").alias("v")
        ).write.parquet(path)
    )
    back = spark.read.parquet(path)
    assert back.schema["v"].dataType.typeName() == "variant"
    got = (
        back.select(F.variant_get("v", "$.k", "int").alias("k"))
        .agg(F.sum("k").alias("s"))
        .first()["s"]
    )
    want = (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .agg(F.sum("k").alias("s"))
        .first()["s"]
    )
    assert got == want
