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


# -- zarr v2 interop (round 5): golden-file spec pinning ------------------
#
# The stores below are HAND-WRITTEN v2 bytes (json + struct-packed
# C-order buffers) — not produced by zarrlite — so these tests pin the
# reader to the published zarr v2 spec, and the writer test decodes
# with plain numpy, so a future swap to the real `zarr` library is a
# format no-op in both directions.


def _hand_written_v2_store(path, compressor=None, sep="."):
    """A 5x3 float64 array, chunks of 2 rows (last chunk padded)."""
    import struct

    X = np.arange(15, dtype="<f8").reshape(5, 3)
    path.mkdir()
    for i in range(3):
        chunk = np.zeros((2, 3), dtype="<f8")
        rows = X[2 * i : 2 * i + 2]
        chunk[: rows.shape[0]] = rows
        buf = b"".join(struct.pack("<d", v) for v in chunk.ravel(order="C"))
        if compressor == "zlib":
            import zlib

            buf = zlib.compress(buf)
        (path / f"{i}{sep}0").write_bytes(buf)
    (path / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [5, 3],
                "chunks": [2, 3],
                "dtype": "<f8",
                "compressor": (
                    None if compressor is None else {"id": compressor}
                ),
                "fill_value": 0.0,
                "order": "C",
                "filters": None,
                **({"dimension_separator": sep} if sep != "." else {}),
            }
        )
    )
    return X


def test_zarr_v2_golden_read(spark, tmp_path):
    """Reader consumes a hand-written spec-conformant v2 store:
    padded tail chunk trimmed by shape, values exact."""
    X = _hand_written_v2_store(tmp_path / "v2")
    zf = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v2"))
    assert zf.shape == (5, 3)
    assert np.array_equal(zf.asndarray(), X)


def test_zarr_v2_golden_read_zlib(spark, tmp_path):
    X = _hand_written_v2_store(tmp_path / "v2z", compressor="zlib")
    got = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v2z")).asndarray()
    assert np.array_equal(got, X)


def test_zarr_v2_one_partition_per_chunk(spark, tmp_path):
    _hand_written_v2_store(tmp_path / "v2p")
    df = read_zarrlite(spark, str(tmp_path / "v2p"))
    assert df.rdd.getNumPartitions() == 3


def test_zarr_v2_float32_input_and_slash_separator(spark, tmp_path):
    """dtype <f4 + dimension_separator "/" (both legal v2 variants)
    normalize to the engine's float64 vectors."""
    import struct

    path = tmp_path / "v2f32"
    path.mkdir()
    X = np.arange(6, dtype="<f4").reshape(3, 2)
    buf = b"".join(struct.pack("<f", v) for v in X.ravel(order="C"))
    (path / "0/0").parent.mkdir(exist_ok=True)
    (path / "0").mkdir(exist_ok=True)
    (path / "0" / "0").write_bytes(buf)
    (path / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [3, 2],
                "chunks": [3, 2],
                "dtype": "<f4",
                "compressor": None,
                "fill_value": 0.0,
                "order": "C",
                "filters": None,
                "dimension_separator": "/",
            }
        )
    )
    got = ZappyFrame.from_zarrlite(spark, str(path)).asndarray()
    assert np.array_equal(got, X.astype(np.float64))


def test_zarr_v2_writer_golden(spark, tmp_path):
    """write_zarr_v2 output decoded with PLAIN numpy/json (no zarrlite
    code): .zarray fields exactly as the spec's v2 defaults, chunk
    files raw C-order little-endian f8, tail chunk padded with the
    fill value."""
    from zappy_spark.sources.zarrlite import write_zarr_v2

    rng = np.random.default_rng(11)
    X = rng.normal(size=(7, 4))
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=3)
    out = str(tmp_path / "w2")
    write_zarr_v2(zf.df.select("row_id", "vec"), out, chunk_rows=3, ncols=4)

    z = json.load(open(f"{out}/.zarray"))
    assert z == {
        "zarr_format": 2,
        "shape": [7, 4],
        "chunks": [3, 4],
        "dtype": "<f8",
        "compressor": None,
        "fill_value": 0.0,
        "order": "C",
        "filters": None,
    }
    rebuilt = []
    for i in range(3):
        raw = open(f"{out}/{i}.0", "rb").read()
        chunk = np.frombuffer(raw, dtype="<f8").reshape(3, 4)
        rebuilt.append(chunk)
    full = np.concatenate(rebuilt)
    assert np.allclose(full[:7], X)
    assert np.all(full[7:] == 0.0)  # spec padding


def test_zarr_v2_write_read_round_trip_compressed(spark, tmp_path):
    from zappy_spark.sources.zarrlite import write_zarr_v2

    rng = np.random.default_rng(12)
    X = rng.normal(size=(10, 3))
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    out = str(tmp_path / "wz")
    write_zarr_v2(
        zf.df.select("row_id", "vec"), out, 4, 3, compressor="zlib"
    )
    back = ZappyFrame.from_zarrlite(spark, out)
    assert np.allclose(back.asndarray(), X)


def test_zarr_v2_unsupported_fields_raise(tmp_path):
    from zappy_spark.sources.zarrlite import _normalize_v2_meta

    base = {
        "zarr_format": 2,
        "shape": [4, 2],
        "chunks": [2, 2],
        "dtype": "<f8",
        "compressor": None,
        "fill_value": 0.0,
        "order": "C",
        "filters": None,
    }
    with pytest.raises(NotImplementedError, match="Fortran"):
        _normalize_v2_meta({**base, "order": "F"})
    with pytest.raises(NotImplementedError, match="column-chunked"):
        _normalize_v2_meta({**base, "chunks": [4, 1]})
    with pytest.raises(NotImplementedError, match="blosc"):
        _normalize_v2_meta({**base, "compressor": {"id": "blosc"}})
    with pytest.raises(ValueError, match="zarr_format"):
        _normalize_v2_meta({**base, "zarr_format": 3})


def test_zarr_v2_append_partial_and_aligned(spark, tmp_path):
    """Appends fold into the padded tail chunk per the v2 spec; the
    store stays readable (and plain-numpy decodable) after partial,
    aligned, and multi-chunk appends, compressed or not."""
    from zappy_spark.sources.zarrlite import append_zarr_v2, write_zarr_v2

    rng = np.random.default_rng(21)
    X = rng.normal(size=(7, 3))  # chunk_rows=4 → tail of 3
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    out = str(tmp_path / "a2")
    write_zarr_v2(zf.df.select("row_id", "vec"), out, 4, 3, compressor="zlib")

    extra1 = rng.normal(size=(1, 3))  # completes the tail chunk
    extra2 = rng.normal(size=(9, 3))  # aligned start, partial end
    append_zarr_v2(out, extra1)
    append_zarr_v2(out, extra2)
    want = np.concatenate([X, extra1, extra2])

    back = ZappyFrame.from_zarrlite(spark, out)
    assert back.shape == (17, 3)
    assert np.allclose(back.asndarray(), want)

    # plain-numpy decode (no zarrlite code): spec bytes, padded tail
    import zlib

    z = json.load(open(f"{out}/.zarray"))
    assert z["shape"] == [17, 3] and z["chunks"] == [4, 3]
    chunks = []
    for i in range(5):
        raw = zlib.decompress(open(f"{out}/{i}.0", "rb").read())
        chunks.append(np.frombuffer(raw, dtype="<f8").reshape(4, 3))
    full = np.concatenate(chunks)
    assert np.allclose(full[:17], want)
    assert np.all(full[17:] == 0.0)


def test_zarr_v2_append_rejects_bad_width(spark, tmp_path):
    from zappy_spark.sources.zarrlite import append_zarr_v2, write_zarr_v2

    X = np.ones((4, 3))
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=1)
    out = str(tmp_path / "a3")
    write_zarr_v2(zf.df.select("row_id", "vec"), out, 2, 3)
    with pytest.raises(ValueError, match=r"\(k, 3\)"):
        append_zarr_v2(out, np.ones((2, 4)))


def test_zarr_v2_stream_tail_chunk_aligned(spark, tmp_path):
    """Streaming tail over a REAL zarr v2 store: chunk-aligned
    appends (the streaming-safe mode — padded-tail rewrites would
    mutate served chunks) drain exactly-once across restarts, and
    the batch reader agrees with the drained stream."""
    from zappy_spark.sources.zarrlite import (
        append_zarr_v2,
        read_zarrlite,
        read_zarrlite_stream,
        write_zarr_v2,
    )

    store = str(tmp_path / "v2s")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    a = np.arange(18, dtype=float).reshape(6, 3)  # 2 full chunks of 3
    zf = ZappyFrame.from_ndarray(spark, a, num_partitions=2)
    write_zarr_v2(zf.df.select("row_id", "vec"), store, 3, 3)

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
    assert spark.read.parquet(out).count() == 6

    append_zarr_v2(store, np.full((3, 3), 42.0))  # one aligned chunk
    drain()
    rows = spark.read.parquet(out).orderBy("row_id").collect()
    assert [r.row_id for r in rows] == list(range(9))
    assert rows[6].vec == [42.0] * 3

    m = read_zarrlite(spark, store).orderBy("row_id").collect()
    assert [tuple(r) for r in m] == [tuple(r) for r in rows]


def test_csv_round_trip_and_quarantine(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from zappy_spark.sources import csvsrc

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "with,comma and \"quotes\"")],
        schema,
    )
    p = str(tmp_path / "csv_clean")
    csvsrc.write_csv(df, p)
    back = csvsrc.read_csv_corpus(spark, p, schema)
    clean, quarantined = csvsrc.split_corrupt(back)
    assert quarantined.count() == 0
    got = sorted((r["doc_id"], r["text"]) for r in clean.collect())
    assert got == [(1, "hello world"), (2, 'with,comma and "quotes"')]

    # planted corrupt line: wrong arity + broken quoting
    bad = tmp_path / "csv_bad"
    bad.mkdir()
    (bad / "part-00000.csv").write_text(
        'doc_id,text\n1,ok\nnot_a_number,"unterminated\n'
    )
    back2 = csvsrc.read_csv_corpus(spark, str(bad), schema)
    clean2, quar2 = csvsrc.split_corrupt(back2)
    assert clean2.filter(F.col("doc_id") == 1).count() == 1
    assert quar2.count() >= 1  # damage quarantined, job survived


# -- zarr v3 interop (round 6): golden-file spec pinning ------------------
#
# Hand-written v3 stores (zarr.json + struct-packed buffers under the
# default "c/<i>/0" key encoding) pin the reader to the published
# zarr v3 core spec; the writer test decodes with plain numpy.


def _hand_written_v3_store(
    path, compressor=None, key_encoding="default", endian="little",
    data_type="float64",
):
    """A 5x3 array, chunks of 2 rows (last chunk padded)."""
    X = np.arange(15, dtype="<f8").reshape(5, 3)
    np_dt = {"float64": "f8", "float32": "f4", "int32": "i4"}[data_type]
    bo = "<" if endian == "little" else ">"
    path.mkdir()
    for i in range(3):
        chunk = np.zeros((2, 3), dtype=bo + np_dt)
        rows = X[2 * i : 2 * i + 2]
        chunk[: rows.shape[0]] = rows
        buf = chunk.tobytes(order="C")
        if compressor == "gzip":
            import gzip

            buf = gzip.compress(buf)
        if key_encoding == "default":
            (path / "c" / str(i)).mkdir(parents=True, exist_ok=True)
            (path / "c" / str(i) / "0").write_bytes(buf)
        else:  # v2-style keys
            (path / f"{i}.0").write_bytes(buf)
    codecs = [{"name": "bytes", "configuration": {"endian": endian}}]
    if compressor:
        codecs.append(
            {"name": compressor, "configuration": {"level": 6}}
        )
    enc = (
        {"name": "default", "configuration": {"separator": "/"}}
        if key_encoding == "default"
        else {"name": "v2", "configuration": {"separator": "."}}
    )
    (path / "zarr.json").write_text(
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "array",
                "shape": [5, 3],
                "data_type": data_type,
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": [2, 3]},
                },
                "chunk_key_encoding": enc,
                "fill_value": 0.0,
                "codecs": codecs,
            }
        )
    )
    return X.astype(np.float64)


def test_zarr_v3_golden_read(spark, tmp_path):
    """Reader consumes a hand-written spec-conformant v3 store
    (default chunk keys c/<i>/0, bytes codec little-endian)."""
    X = _hand_written_v3_store(tmp_path / "v3")
    zf = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v3"))
    assert zf.shape == (5, 3)
    assert np.array_equal(zf.asndarray(), X)


def test_zarr_v3_golden_read_gzip_and_v2_keys(spark, tmp_path):
    X = _hand_written_v3_store(
        tmp_path / "v3g", compressor="gzip", key_encoding="v2"
    )
    got = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v3g")).asndarray()
    assert np.array_equal(got, X)


def test_zarr_v3_big_endian_and_int_dtype(spark, tmp_path):
    """bytes codec endian=big + int32 data_type normalize to the
    engine's float64 vectors."""
    X = _hand_written_v3_store(
        tmp_path / "v3b", endian="big", data_type="int32"
    )
    got = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v3b")).asndarray()
    assert np.array_equal(got, X)


def test_zarr_v3_writer_round_trip_and_layout(spark, tmp_path):
    """write_zarr_v3 emits spec bytes a plain-numpy decoder accepts:
    zarr.json core fields, default c/<i>/0 keys, padded last chunk."""
    from zappy_spark.sources.zarrlite import write_zarr_v3

    rng = np.random.default_rng(7)
    X = rng.normal(size=(7, 4))
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=3)
    store = tmp_path / "v3w"
    write_zarr_v3(zf.df, str(store), chunk_rows=3, ncols=4)
    meta = json.loads((store / "zarr.json").read_text())
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    assert meta["shape"] == [7, 4]
    assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [3, 4]
    # decode chunk 2 (padded tail) with plain numpy
    raw = (store / "c" / "2" / "0").read_bytes()
    tail = np.frombuffer(raw, dtype="<f8").reshape(3, 4)
    assert np.allclose(tail[:1], X[6:7]) and np.all(tail[1:] == 0.0)
    # and the zarrlite reader round-trips it
    back = ZappyFrame.from_zarrlite(spark, str(store)).asndarray()
    assert np.allclose(back, X)
    # compressed variant round-trips too
    store2 = tmp_path / "v3wc"
    write_zarr_v3(zf.df, str(store2), chunk_rows=3, ncols=4,
                  compressor="gzip")
    back2 = ZappyFrame.from_zarrlite(spark, str(store2)).asndarray()
    assert np.allclose(back2, X)


def test_zarr_v3_unsupported_fields_raise(tmp_path):
    from zappy_spark.sources.zarrlite import _load_meta

    base = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [4, 2],
        "data_type": "float64",
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": [2, 2]},
        },
        "chunk_key_encoding": {"name": "default"},
        "fill_value": 0.0,
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}}
        ],
    }
    import copy

    import pytest as _pytest

    cases = [
        ("codecs", [{"name": "bytes"}, {"name": "zstd"}]),
        ("codecs", [{"name": "sharding_indexed"}]),
        ("chunk_grid", {"name": "rectilinear"}),
        ("data_type", "complex128"),
        ("chunk_key_encoding", {"name": "exotic"}),
        ("shape", [2, 2, 2]),
    ]
    for field, val in cases:
        z = copy.deepcopy(base)
        z[field] = val
        d = tmp_path / f"bad_{field}_{hash(str(val)) % 1000}"
        d.mkdir()
        (d / "zarr.json").write_text(json.dumps(z))
        with _pytest.raises((NotImplementedError, KeyError)):
            _load_meta(str(d))


def test_lz4_block_spec_vectors():
    """The pure-Python LZ4 block decoder against hand-authored spec
    vectors — one per format feature: overlap (RLE) match, periodic
    match, literal-length extension, match-length extension — plus
    the malformed-input failure modes. These bytes are written from
    the public block spec, NOT from this module's own encoder, so
    the decoder is checked against the format, not against itself."""
    import pytest

    from zappy_spark.sources.lz4lite import (
        compress_block_stored,
        decompress_block,
    )

    # RLE via overlap: 1 literal 'a', match offset 1 len 4, then the
    # spec-mandated literals-only final sequence
    assert decompress_block(b"\x10a\x01\x00\x30aaa", 8) == b"a" * 8
    # periodic: literals 'abc', match offset 3 len 4, 5-literal tail
    assert (
        decompress_block(b"\x30abc\x03\x00\x50bcabc", 12)
        == b"abc" * 4
    )
    # literal-length extension: 15+5=20 literals, no match
    assert (
        decompress_block(b"\xf0\x05" + b"L" * 20, 20) == b"L" * 20
    )
    # match-length extension: 1 literal + match len 15ext+19=34,
    # 5-literal tail
    assert (
        decompress_block(b"\x1fx\x01\x00\x0f\x50xxxxx", 40)
        == b"x" * 40
    )
    # two sequences, spec-shaped tail (>=5 final literals)
    assert (
        decompress_block(b"\x1f\x00\x01\x00\x17\x50" + b"\x00" * 5, 48)
        == b"\x00" * 48
    )
    for bad, size in [
        (b"\x13a\x00\x00", 8),  # offset 0
        (b"\x13a\x05\x00", 8),  # offset beyond decoded bytes
        (b"\x35abc\x03", 12),  # truncated offset
        (b"\xf0", 20),  # truncated literal extension
        (b"\x30abc\x03\x00\x50bcabc", 11),  # dst_size mismatch
        (b"\x10a\x01\x00", 8),  # ends after a match, short output
    ]:
        with pytest.raises(ValueError):
            decompress_block(bad, size)
    # stored-form encoder round-trips through the decoder at the
    # length-extension boundaries
    for n in (0, 1, 14, 15, 16, 269, 270, 271, 1000):
        data = bytes(range(256)) * (n // 256 + 1)
        data = data[:n]
        assert decompress_block(compress_block_stored(data), n) == data


def test_zarr_v2_lz4_match_bearing_chunk(spark, tmp_path):
    """DataSource reads a v2 store whose chunk was compressed with a
    REAL match-bearing LZ4 stream (hand-authored: literal + overlap
    match + 5-literal tail, per the encoder-side spec rules) inside
    the numcodecs uint32-size frame — the native-library interop
    shape, not this module's own stored form."""
    import struct

    path = tmp_path / "v2lz4"
    path.mkdir()
    # 2x3 zeros = 48 zero bytes: 1 literal, match len 42, 5 literals
    block = b"\x1f\x00\x01\x00\x17\x50" + b"\x00" * 5
    (path / "0.0").write_bytes(struct.pack("<I", 48) + block)
    (path / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [2, 3],
                "chunks": [2, 3],
                "dtype": "<f8",
                "compressor": {"id": "lz4"},
                "fill_value": 0.0,
                "order": "C",
                "filters": None,
            }
        )
    )
    got = ZappyFrame.from_zarrlite(spark, str(path)).asndarray()
    assert got.shape == (2, 3)
    assert np.array_equal(got, np.zeros((2, 3)))


def test_zarr_v2_write_read_round_trip_lz4(spark, tmp_path):
    """write_zarr_v2(compressor='lz4') -> numcodecs-framed chunks
    that read back exactly (and via append_zarr_v2 too)."""
    from zappy_spark.sources.zarrlite import append_zarr_v2, write_zarr_v2

    X = np.arange(21, dtype=np.float64).reshape(7, 3)
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    out = str(tmp_path / "v2out_lz4")
    write_zarr_v2(
        zf.df.select("row_id", "vec"), out, 3, 3, compressor="lz4"
    )
    got = ZappyFrame.from_zarrlite(spark, out)
    assert got.shape == (7, 3)
    assert np.array_equal(got.asndarray(), X)
    extra = np.arange(100, 106, dtype=np.float64).reshape(2, 3)
    append_zarr_v2(out, extra)
    got2 = ZappyFrame.from_zarrlite(spark, out).asndarray()
    assert np.array_equal(got2, np.concatenate([X, extra]))


# ---------- pnglite: spec pins (hand-authored vectors) ----------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    # independent chunk assembly (test-side duplicate on purpose)
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_bytes(w, h, ctype_i, scanlines, plte=None):
    import struct
    import zlib as _z

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_i, 0, 0, 0)
    out = sig + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", _z.compress(scanlines))
    return out + _png_chunk(b"IEND", b"")


def test_png_sub_filter_hand_vector():
    """Spec §6.6 Sub: Recon(x) = Filt(x) + Recon(a). Row [10,20,30]
    filters to [10,10,10]; [5,5,250] to [5,0,245] — authored by hand,
    decoded back exactly."""
    import numpy as np

    from zappy_spark.sources.pnglite import decode_png

    scan = bytes([1, 10, 10, 10]) + bytes([1, 5, 0, 245])
    img, meta = decode_png(_png_bytes(3, 2, 0, scan))
    assert meta["width"] == 3 and meta["height"] == 2
    assert img[:, :, 0].tolist() == [[10, 20, 30], [5, 5, 250]]
    assert img.dtype == np.uint8


def test_png_up_average_paeth_hand_vectors():
    """Up/Average/Paeth unfilters against hand-computed filtered
    bytes (gray, 2x2 stacked rows; predictors evaluated on paper
    from the spec formulas)."""
    from zappy_spark.sources.pnglite import decode_png

    # Up: row0 raw [100,200] (filter 0); row1 [150,255] -> [50,55]
    scan = bytes([0, 100, 200]) + bytes([2, 50, 55])
    img, _ = decode_png(_png_bytes(2, 2, 0, scan))
    assert img[:, :, 0].tolist() == [[100, 200], [150, 255]]

    # Average: row1 [60,130] over [100,200]: x0 avg(0,100)=50 ->10;
    # x1 avg(60,200)=130 -> 0
    scan = bytes([0, 100, 200]) + bytes([3, 10, 0])
    img, _ = decode_png(_png_bytes(2, 2, 0, scan))
    assert img[:, :, 0].tolist() == [[100, 200], [60, 130]]

    # Paeth: row1 [150,255] over [100,200]: x0 pred=b=100 -> 50;
    # x1 a=150,b=200,c=100 -> p=250, pb=50 smallest -> pred=200 -> 55
    scan = bytes([0, 100, 200]) + bytes([4, 50, 55])
    img, _ = decode_png(_png_bytes(2, 2, 0, scan))
    assert img[:, :, 0].tolist() == [[100, 200], [150, 255]]


def test_png_palette_expansion():
    from zappy_spark.sources.pnglite import decode_png

    plte = bytes([255, 0, 0, 0, 0, 255])  # idx0 red, idx1 blue
    scan = bytes([0, 0, 1])  # one row, two pixels
    img, meta = decode_png(_png_bytes(2, 1, 3, scan, plte=plte))
    assert meta["channels"] == 3
    assert img.tolist() == [[[255, 0, 0], [0, 0, 255]]]


def test_png_round_trip_all_filters_and_channels():
    """encode→decode identity for every filter type × channel count
    on random arrays (the inverse-consistency half; the spec half is
    the hand vectors above)."""
    import numpy as np

    from zappy_spark.sources.pnglite import decode_png, encode_png

    rng = np.random.default_rng(5)
    for nch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(7, 5, nch), dtype=np.uint8)
        for ft in range(5):
            img, meta = decode_png(encode_png(arr, filter_type=ft))
            assert (img == arr).all(), (nch, ft)
            assert meta["channels"] == nch


def test_png_loud_rejections():
    import struct
    import zlib as _z

    import pytest as _pytest

    from zappy_spark.sources.pnglite import PngFormatError, decode_png

    # 16-bit depth
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = (
        sig
        + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", _z.compress(bytes([0, 0, 0])))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(PngFormatError, match="bit depth"):
        decode_png(data)
    # interlace
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    data = (
        sig
        + _png_chunk(b"IHDR", ihdr_i)
        + _png_chunk(b"IDAT", _z.compress(bytes([0, 0])))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(PngFormatError, match="interlace"):
        decode_png(data)
    # corrupt CRC
    good = _png_bytes(1, 1, 0, bytes([0, 7]))
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    with _pytest.raises(PngFormatError, match="CRC|IEND"):
        decode_png(bad)


# ---------- wavlite: spec pins ----------


def test_wav_hand_authored_bytes():
    """A RIFF/PCM stream assembled by hand (independent struct
    spelling): 2 mono 16-bit frames at 8 kHz, values 1000 and -2
    (little-endian 0xE8 0x03 / 0xFE 0xFF)."""
    import struct

    from zappy_spark.sources.wavlite import decode_wav

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm = bytes([0xE8, 0x03, 0xFE, 0xFF])
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + pcm
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(data)
    assert rate == 8000
    assert s.tolist() == [[1000], [-2]]


def test_wav_round_trip_and_8bit():
    import numpy as np

    from zappy_spark.sources.wavlite import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    stereo = rng.integers(-32768, 32767, size=(50, 2), dtype=np.int16)
    s, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and (s == stereo).all()
    # 8-bit: quantized to the top byte, recentred on decode
    mono = np.array([0, 256, -256, 32512], dtype=np.int16)
    s8, _ = decode_wav(encode_wav(mono, 16000, bits=8))
    assert s8[:, 0].tolist() == [0, 256, -256, 32512]


def test_wav_loud_rejections():
    import struct

    import pytest as _pytest

    from zappy_spark.sources.wavlite import WavFormatError, decode_wav

    with _pytest.raises(WavFormatError, match="RIFF"):
        decode_wav(b"OggS not a wav")
    # IEEE-float format tag 3
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(WavFormatError, match="format tag"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_png_decodes_real_third_party_file():
    """EXTERNAL validation (round 7): a PNG produced by a real
    encoder — IPython's 2×2 grayscale test image (BSD-3-licensed
    test data, 71 bytes, embedded hex) — must decode to its known
    pixels. This pins pnglite against the wider PNG ecosystem, not
    just this repo's own vectors."""
    from zappy_spark.sources.pnglite import decode_png

    data = bytes.fromhex(
        "89504e470d0a1a0a0000000d4948445200000002000000020800000000"
        "57dd52f80000000e49444154789c636c60606260000002920084f77ca3"
        "580000000049454e44ae426082"
    )
    img, meta = decode_png(data)
    assert (meta["width"], meta["height"], meta["channels"]) == (2, 2, 1)
    assert img.reshape(-1).tolist() == [128, 128, 128, 128]


def test_wav_decodes_real_third_party_file():
    """EXTERNAL validation: CPython's test-suite sndhdr.wav
    (PSF-licensed test data, 64 bytes, embedded hex) — 5 stereo
    silence frames at 44.1 kHz from a real writer."""
    from zappy_spark.sources.wavlite import decode_wav

    data = bytes.fromhex(
        "524946463800000057415645666d7420100000000100020044ac0000"
        "10b102000400100064617461140000000000000000000000000000000"
        "000000000000000"
    )
    s, rate = decode_wav(data)
    assert rate == 44100
    assert s.shape == (5, 2)
    assert (s == 0).all()


# CPython test-suite goldens (PSF-licensed test data): the same
# 16x16 image written by two independent real encoders.
_PYTHON_BMP = bytes.fromhex(
        "424d8a040000000000008a0000007c0000001000000010000000010020000300"
        "000000040000000000000000000000000000000000000000ff0000ff0000ff00"
        "0000000000ff4247527380c2f52860b81e152085eb0140333313806666264066"
        "6606a09999093c0ad703245c8f32000000000000000000000000040000000000"
        "0000000000000000000000000000000000000000000000000000000000080000"
        "001d00000035000000420000004700000045000000380000001f000000080000"
        "00000000000000000000000000000000000000000000000000003fd0f14c39d3"
        "facc2fd2fdf726d0ffff1cccffff19c7fad81297c07b0000003b000000120000"
        "00000000000000000000000000000000000000000000000000004edefdf744db"
        "ffff3ad8ffff30d4ffff26d0ffffffffffff1bcbfdf7000000400000001c0000"
        "000900000005000000010000000200000009000000130000001258e3ffff4edf"
        "ffff44dbffff3ad7ffff30d3ffff25d0ffff1cccffff00000041000000350000"
        "002c0000001e0000000b00000008000000210000003c0000003562e7ffff58e3"
        "ffff4edfffff3dc7e8aa34c5eba92ac2eba921beeba918bbeba918bbeba9129b"
        "c6790000004100000020a375406fa2733df79c703aff0000004b6cebffff62e7"
        "ffff58e3ffff4edfffff43dbffff39d7ffff2fd3ffff24cfffff1cccffff1ccc"
        "ffff129ac27a00000034ae7d43d7a87941ffa1743dff4b321c5b6fe3f5b36ceb"
        "ffff61e7ffff57e3ffff4ddfffff43dbffff39d7ffff2ed3ffff24cfffff1ccc"
        "ffff1ac1f3c200000041b28146f7ad7d44ffa67840ff916736aa0000004e6ee1"
        "f2a66ae9fdf761e6ffff57e3ffff4ddfffff42dbffff38d7ffff2ed3ffff24cf"
        "ffff1bcbfdf700000047b9874affb28147ffab7c43ffa5763fff936936b64531"
        "1b5c0000004c00000048000000470000004145c3e26b41d9fdf738d7ffff2dd3"
        "ffff23cfffff00000046be8b4dffb78549ffb08046ffaa7b42ffa3753eff9c70"
        "3bff966a37ff946936ff926835f7876032b60000004f45ceec8842daffff37d6"
        "ffff2dd3ffff0000003dc38f50ffbc894cffb58448ffaf7f45ffa87941ffa174"
        "3dff9b6f3aff946936ff946936ff946936ff876032b6000000434bdeffff41da"
        "ffff36d5fded00000024c69152bdc18d4fffbb884bffb48348ffad7d44ffa678"
        "40ffa0733dff996d39ff946936ff946936ff946936ff0000004855e2ffff4add"
        "fdf73ed5f9820000000a00000000c48f4e7ebf8a4ca0b68548a1ad7d43a3a174"
        "3da7966c39aa906636aa976c38ff946936ff946936ff00000048000000180000"
        "0000000000000000000000000000000000000000000000000000b78549ffb180"
        "46ffaa7b42ffa3753eff9d703bff966a37ff946936ff00000041000000150000"
        "0000000000000000000000000000000000000000000000000000bc8a4cffffff"
        "ffffaf7f45ffa87941ffa2743eff9b6f3aff946936ff000000280000000b0000"
        "0000000000000000000000000000000000000000000000000000c08d4eafba86"
        "4aedb48348ffad7e44ffa77840ff9e713cf7966837920000000b000000030000"
        "00000000000000000000"
    )
_PYTHON_PNG = bytes.fromhex(
        "89504e470d0a1a0a0000000d4948445200000010000000100803000000282d0f"
        "53000000206348524d00007a26000080840000fa00000080e8000075300000ea"
        "6000003a98000017709cba513c000001c5504c54450000004e8dc04a86ba3c71"
        "9e3768960000000000000000000000000000004e8fc44c8abf4885b6437dad3d"
        "74a1396c963666900000000000005291c6fddd4af9d53e000000326087000000"
        "fdd536000000356892000000ecce450000003669931b3145000000000000e2c3"
        "45fdd9410000004681b2366791000000f2e16efde96afdcb1b437dae1c324bf5"
        "e36ff3c11a4075a33d73a2000000c29a12000000000000000000000000000000"
        "e8c73debc534ebc22aebbe21ebbb18c69b120000000000000000000000000000"
        "00000000000000fdde4e000000000000000000000000f1d03ffad339fdd22ffa"
        "c719c097120000000000000000000000000000000000004883b4447ead4078a7"
        "4c8abcffffff457faf4179a83e74a23a6f9b3669944985b74680b1427baa3e75"
        "a33b709d376a96386c974f8dc14b88bb447dad4078a63d73a0396d99ffe25550"
        "8fc34c89bc4884b53d74a1ffde4bffda414d8bbe4680b03b709cffda42ffd637"
        "ffd32d4a87b94781b2437cab3f76a5ffd738ffcf23ffe661ffe357ffdf4dffdb"
        "42ffd32effcf24ffeb6cffe761ffdb43ffd739ffcc1c3a709cffe762ffe358ff"
        "df4effd32fffdb44ffd73affd330ffd025ffd83affd430ffd026924900020000"
        "005674524e5300afedf7920b032841157ea0a1a3a7aaaa4818bdf7820ab643ed"
        "24f74f883db65c4c476bf746f7aa4ea6f7f7d75bb3c26ff74b7a3408213c35aa"
        "a9a9a9a97920020913122c1ef7401c05014cccf7d87b3b1d4245381ff8321071"
        "00000001624b47445a03bba5a2000000f54944415418d36360000246a6b0f008"
        "661656360628888c8a8e898d8b6767850924242625a7a4c6737082795cdc3cbc"
        "7cfc0269f1f1824220be707a46586656764e3c50205744548c212fbf203aa630"
        "0ec81797282a9694622849284d4a2e4b8d971697912dafa89463a8aaaea99557"
        "501454e25056a9abac576550cbcc52d7d0d46a686c6aae6b69d55662d08929d4"
        "d56b6b6f6ceae86c69edd2e7603030ec366aebe9edebe8ec6fedea3236613035"
        "33b700f22dadac6d6c6ded38ec191c1c9d9c7bfb264c9c34b98bc3c2c515e27a"
        "b70953a64e8bd276f770f4f4020b78fbf84eebf2f30f708679ce34d022482938"
        "24d414c806004062427fc82d9be50000002574455874646174653a6372656174"
        "6500323031342d30312d32365432303a35393a33372b30323a3030fb9a077700"
        "00002574455874646174653a6d6f6469667900323031342d30312d3236543230"
        "3a35393a30302b30323a3030c1ef86a60000000049454e44ae426082"
    )


def test_bmp_decodes_real_v5_bitfields_file():
    """EXTERNAL validation: CPython's test-suite python.bmp (PSF
    test data, embedded hex) — a V5-header 32bpp BI_BITFIELDS file
    from a real writer — must decode to 16×16 RGBA."""
    from zappy_spark.sources.bmplite import decode_bmp

    img, meta = decode_bmp(_PYTHON_BMP)
    assert (meta["width"], meta["height"], meta["channels"]) == (16, 16, 4)
    assert meta["compression"] == 3 and meta["bpp"] == 32


def test_bmp_png_cross_format_pixel_agreement():
    """The STRONG codec pin: the same 16×16 Python-logo image exists
    in CPython's test data as BOTH a palette PNG and a V5 BMP,
    written by independent real encoders. Our two independent
    decoders must produce IDENTICAL RGB on every fully-opaque pixel
    — any filter, palette, mask-order, or row-order bug in either
    codec breaks this."""
    import numpy as np

    from zappy_spark.sources.bmplite import decode_bmp
    from zappy_spark.sources.pnglite import decode_png

    bmp, _ = decode_bmp(_PYTHON_BMP)
    png, _ = decode_png(_PYTHON_PNG)
    assert bmp.shape == (16, 16, 4) and png.shape == (16, 16, 3)
    opaque = bmp[:, :, 3] == 255
    assert int(opaque.sum()) == 109  # a real image, not vacuous
    assert (bmp[:, :, :3][opaque] == png[opaque]).all()


def test_bmp_round_trip_and_rejections():
    import numpy as np
    import pytest as _pytest

    from zappy_spark.sources.bmplite import (
        BmpFormatError,
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(4)
    # odd width exercises the 4-byte row padding
    a = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    img, meta = decode_bmp(encode_bmp(a))
    assert (img == a).all() and meta["bpp"] == 24
    with _pytest.raises(BmpFormatError, match="BM"):
        decode_bmp(b"PNG? not a bmp" + bytes(60))


def test_bmp_32bpp_bi_rgb_reserved_byte_is_not_alpha():
    """A 32 bpp BI_RGB file (reserved 4th byte = 0, the common
    real-writer form) must decode as opaque 3-channel RGB, not as a
    fully transparent RGBA image (round-8 ADVICE)."""
    import struct

    import numpy as np

    from zappy_spark.sources.bmplite import decode_bmp

    # hand-build a 2×2 32bpp BI_RGB bottom-up file, reserved byte 0
    px = {  # (x, y) -> RGB
        (0, 0): (10, 20, 30), (1, 0): (40, 50, 60),
        (0, 1): (70, 80, 90), (1, 1): (100, 110, 120),
    }
    rows = b""
    for y in (1, 0):  # bottom-up
        for x in (0, 1):
            r, g, b = px[(x, y)]
            rows += bytes((b, g, r, 0))
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, len(rows), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    img, meta = decode_bmp(head + info + rows)
    assert img.shape == (2, 2, 3) and meta["channels"] == 3
    for (x, y), rgb in px.items():
        assert tuple(img[y, x]) == rgb


def test_bmp_truncated_bitfields_header_raises_loudly():
    """A file whose DIB size field claims V4/V5 mask fields but is
    physically shorter must raise BmpFormatError, not struct.error
    (round-8 ADVICE)."""
    import struct

    import pytest as _pytest

    from zappy_spark.sources.bmplite import BmpFormatError, decode_bmp

    info40 = struct.pack(
        "<IiiHHIIiiII", 108, 2, 2, 1, 32, 3, 16, 2835, 2835, 0, 0
    )  # declares a 108-byte V4 header (masks at 54..70)...
    head = struct.pack("<2sIHHI", b"BM", 14 + 108 + 16, 0, 0, 122)
    # ...but the file ends right after the 40 core header bytes
    for cut in (54, 58, 66):
        with _pytest.raises(BmpFormatError, match="truncated DIB"):
            decode_bmp((head + info40)[:cut])


def test_codec_round_trips_edge_dimensions():
    """1×1, 1×N, N×1 and odd-stride shapes through all three codec
    round-trips — the dimensions where stride/padding/filter-window
    bugs live."""
    import numpy as np

    from zappy_spark.sources.bmplite import decode_bmp, encode_bmp
    from zappy_spark.sources.pnglite import decode_png, encode_png
    from zappy_spark.sources.wavlite import decode_wav, encode_wav

    rng = np.random.default_rng(17)
    for h, w in ((1, 1), (1, 9), (9, 1), (3, 7), (2, 2)):
        a3 = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in range(5):
            img, _ = decode_png(encode_png(a3, filter_type=ft))
            assert (img == a3).all(), ("png", h, w, ft)
        img, _ = decode_bmp(encode_bmp(a3))
        assert (img == a3).all(), ("bmp", h, w)
    for frames, nch in ((1, 1), (1, 2), (7, 3)):
        s = rng.integers(-32768, 32767, size=(frames, nch), dtype=np.int16)
        out, rate = decode_wav(encode_wav(s, 22050))
        assert rate == 22050 and (out == s).all(), ("wav", frames, nch)
    # round-8 codecs join the same harness: GIF (palette, LZW width
    # edges at tiny palettes) and PNM (P5/P6 raw, P4 bit padding)
    from zappy_spark.sources.giflite import decode_gif, encode_gif
    from zappy_spark.sources.pnmlite import decode_pnm, encode_pnm

    for h, w in ((1, 1), (1, 9), (9, 1), (3, 7), (2, 2)):
        pal = rng.integers(0, 256, size=(4, 3))
        a3 = pal[rng.integers(0, 4, size=(h, w))].astype(np.uint8)
        img, _ = decode_gif(encode_gif(a3))
        assert (img == a3).all(), ("gif", h, w)
        g3 = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_pnm(encode_pnm(g3))[0] == g3).all(), ("p6", h, w)
        g1 = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert (decode_pnm(encode_pnm(g1))[0] == g1).all(), ("p5", h, w)
        gb = (rng.integers(0, 2, size=(h, w)) * 255).astype(np.uint8)
        assert (decode_pnm(encode_pnm(gb, "P4"))[0] == gb).all(), (
            "p4", h, w,
        )


# CPython test-suite goldens (PSF-licensed test data): the same 16x16
# Python-logo image as written by MORE independent real encoders —
# ImageMagick GIF (64-color quantized, transparent background) and
# raw-binary Netpbm PPM/PGM/PBM.
_PYTHON_GIF = bytes.fromhex(
    "47494638396110001000f53f00ebbb18ebbe21f3c11afac719fdcb1bffcc1ceb"
    "c22affcf23ffcf24ffd025ffd32debc534e8c73dffd330ffd430fdd536fad339"
    "ffd739f9d53effd83aecce45ffda41ffdb44ffde4bffdf4effe255ffe358ffe7"
    "62f2e16ef5e36ffde96affeb6c326087366690366791366993376896376a9639"
    "6c963a6f9b3a709c3b709c3c719e3d73a23e74a23f76a54078a6427baa437cab"
    "437dad457faf4680b14781b24883b44885b64a86ba4c89bc4c8abc4c8abf4f8d"
    "c1508fc35291c6ffffff00000021ff0b496d6167654d616769636b0767616d6d"
    "613d300021f9040500003f002c000000001000100000069bc09ff0b7bbcd622d"
    "1569c814e67cb3170b556a326d5156aa34b2fe74b618cb143295aaccde0e5793"
    "b954a7d1f997b9487e3c1d4df6828ffe203f17150f5f3634522a67228114840a"
    "3f87302e5d4d15110a073f472e223f1c1e1b191815130a08043f31523f1d1f1b"
    "1a1816110d080502422b293fafb1a5a7050556b0180c0b060100005eb1b30d09"
    "c25e3fb2110e093ea9d23f10cf0503dae04341003b"
)
_PYTHON_PPM = bytes.fromhex(
    "50360a31362031360a3235350a0000000000000000000000004e8dc04a86ba48"
    "83b4447ead4078a73c719e376896000000000000000000000000000000000000"
    "0000000000000000004c8abcffffff457faf4179a83e74a23a6f9b3669940000"
    "000000000000000000000000000000000000000000000000004985b74680b142"
    "7baa3e75a33b709d376a96366994000000000000000000000000000000000000"
    "4e8fc44c8abf4885b6437dad3d74a1396c96366690386c973669943669940000"
    "000000000000000000000000005291c64f8dc14b88bb4883b4447dad4078a63d"
    "73a0396d99366994366994366994000000ffe255fddd4af9d53e000000508fc3"
    "4c89bc4884b5457faf4179a83d74a13a6f9b3669943669943669943260870000"
    "00ffde4bffda41fdd5360000004d8bbe4985b74680b0427baa3e75a33b709c37"
    "6a96366994356892326087000000ecce45ffda42ffd637ffd32d0000004a87b9"
    "4781b2437cab3f76a53669931b3145000000000000000000000000e2c345fdd9"
    "41ffd738ffd32dffcf230000004681b2447dad4078a6366791000000f2e16efd"
    "e96affe661ffe357ffdf4dffdb42ffd738ffd32effcf24fdcb1b000000437dae"
    "4179a83d74a11c324bf5e36fffeb6cffe761ffe357ffdf4dffdb43ffd739ffd3"
    "2effcf24ffcc1cf3c11a0000004075a33d73a23a709c000000ffeb6cffe762ff"
    "e358ffdf4effdb43ffd739ffd32fffcf24ffcc1cffcc1cc29a12000000000000"
    "000000000000000000ffe762ffe358ffdf4ee8c73debc534ebc22aebbe21ebbb"
    "18ebbb18c69b12000000000000000000000000000000000000ffe358ffdf4eff"
    "db44ffd73affd330ffd025ffcc1c000000000000000000000000000000000000"
    "000000000000000000fdde4effdb44ffd83affd430ffd026fffffffdcb1b0000"
    "00000000000000000000000000000000000000000000000000f1d03ffad339fd"
    "d22fffd026ffcc1cfac719c09712000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "00000000000000000000000000"
)
_PYTHON_PGM = bytes.fromhex(
    "50350a31362031360a3235350a00000000837d7a756f69610000000000000000"
    "0080ff76706c67610000000000000000007c77726d6862610000000000008581"
    "7c746c645f646161000000000087847f7a746f6b6561616100ded9d20085807b"
    "76706c676161615900dad7d200817c77726d686261605900cad7d3d0007e7873"
    "6e612e00000000c0d6d4d0cd0078746f6000dce4e2dfdbd8d4d0cdc90074706c"
    "2fdee6e2dfdbd8d4d0cdcac0006d6b6800e6e3dfdbd8d4d1cdcaca9900000000"
    "00e3dfdbc4c3c0bcb9b99a000000000000dfdbd8d4d1ceca0000000000000000"
    "00dad8d5d1ceffc9000000000000000000cdd0cfcecac5960000000000000000"
    "00000000000000000000000000"
)
_PYTHON_PBM = bytes.fromhex(
    "50340a31362031360afb7ff1bffadfd57fadb15bf1a5615fc15801b001b001f0"
    "07f01ff01ff03fffff"
)


def test_gif_decodes_hand_packed_spec_vector():
    """A GIF whose LZW bitstream was packed BY HAND from the spec
    (GIF89a appendix F), independent of this repo's encoder: pixels
    [[1,1],[0,2]], mcs=2 → codes (4,1,1,0,2,5) at widths
    (3,3,3,3,4,4) — the width bump fires after the decoder's table
    reaches 8 entries — packed LSB-first into bytes 4C 20 05."""
    import struct

    import numpy as np

    from zappy_spark.sources.giflite import decode_gif

    gct = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9))
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
        + gct
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        + bytes((2,))  # LZW min code size
        + bytes((3, 0x4C, 0x20, 0x05, 0))  # one sub-block + terminator
        + b"\x3b"
    )
    img, meta = decode_gif(data)
    assert (meta["width"], meta["height"], meta["channels"]) == (2, 2, 3)
    want = np.array(
        [[[0, 255, 0], [0, 255, 0]], [[255, 0, 0], [0, 0, 255]]],
        dtype=np.uint8,
    )
    assert (img == want).all()


def test_gif_decodes_real_third_party_file():
    """EXTERNAL validation: CPython's imghdrdata python.gif (PSF
    test data, 405 bytes) — written by ImageMagick (its application
    extension block names the writer), 64-color global palette,
    graphic-control transparency."""
    from zappy_spark.sources.giflite import decode_gif

    img, meta = decode_gif(_PYTHON_GIF)
    assert (meta["width"], meta["height"], meta["channels"]) == (16, 16, 4)
    assert meta["version"] == "89a" and meta["n_frames"] == 1


def test_gif_png_cross_format_pixel_agreement():
    """Cross-format pin: the same 16×16 image as ImageMagick-GIF and
    palette-PNG, decoded by two independent decoders. The GIF writer
    quantized to a 64-color palette, so opaque pixels must agree
    within the file's own quantization error (≤3/channel, measured)
    — any channel-order, row-order, or LZW bug produces differences
    orders of magnitude larger."""
    import numpy as np

    from zappy_spark.sources.giflite import decode_gif
    from zappy_spark.sources.pnglite import decode_png

    gif, _ = decode_gif(_PYTHON_GIF)
    png, _ = decode_png(_PYTHON_PNG)
    assert gif.shape == (16, 16, 4) and png.shape == (16, 16, 3)
    opaque = gif[:, :, 3] == 255
    assert int(opaque.sum()) == 149  # a real image, not vacuous
    diff = np.abs(
        gif[:, :, :3][opaque].astype(int) - png[opaque].astype(int)
    )
    assert int(diff.max()) <= 3


def test_ppm_png_cross_format_exact_agreement():
    """The STRONGEST pin in the codec suite: python.ppm (raw-binary
    Netpbm) decodes BYTE-IDENTICAL to the palette-PNG of the same
    image — both formats are lossless, both files from real writers,
    both decoders independent."""
    from zappy_spark.sources.pnglite import decode_png
    from zappy_spark.sources.pnmlite import decode_pnm

    ppm, meta = decode_pnm(_PYTHON_PPM)
    png, _ = decode_png(_PYTHON_PNG)
    assert meta["kind"] == "P6" and ppm.shape == (16, 16, 3)
    assert (ppm == png).all()


def test_pgm_pbm_decode_real_files():
    """python.pgm must sit within the file's own grayscale-conversion
    rounding of ITU-R 601 luma of the PNG; python.pbm is a real
    bit-packed bitmap whose black mask must cover the PGM's dark
    pixels."""
    import numpy as np

    from zappy_spark.sources.pnglite import decode_png
    from zappy_spark.sources.pnmlite import decode_pnm

    pgm, m1 = decode_pnm(_PYTHON_PGM)
    assert m1["kind"] == "P5" and pgm.shape == (16, 16)
    png, _ = decode_png(_PYTHON_PNG)
    luma = (
        0.299 * png[:, :, 0] + 0.587 * png[:, :, 1] + 0.114 * png[:, :, 2]
    )
    assert float(np.abs(pgm.astype(float) - luma).max()) < 8.0

    pbm, m2 = decode_pnm(_PYTHON_PBM)
    assert m2["kind"] == "P4" and pbm.shape == (16, 16)
    assert set(np.unique(pbm)) <= {0, 255}
    # the bitmap's black pixels must be dark in the grayscale render
    assert int(pgm[pbm == 0].max()) < 160


def test_pnm_ascii_variants_and_comments():
    """P2/P3 ASCII sample text with interleaved # comments and a
    sub-255 maxval (scaled on decode the way Netpbm exports do)."""
    import numpy as np

    from zappy_spark.sources.pnmlite import decode_pnm

    p2 = b"P2 # gray\n2 2\n# maxval next\n15\n0 15\n7 8\n"
    img, meta = decode_pnm(p2)
    assert meta["maxval"] == 15
    assert img.tolist() == [[0, 255], [119, 136]]
    p3 = b"P3\n1 2\n255\n1 2 3\n250 251 252\n"
    img3, meta3 = decode_pnm(p3)
    assert meta3["channels"] == 3
    assert img3.reshape(-1).tolist() == [1, 2, 3, 250, 251, 252]


def test_pnm_p1_run_together_bits_and_raster_comment():
    """Round-9 ADVICE pins: (a) plain PBM legally packs bits with no
    separating whitespace ('0110'); (b) a '#' comment between the
    last header token and the raw raster separator must be skipped,
    not read as raster bytes."""
    import pytest as _pytest

    from zappy_spark.sources.pnmlite import PnmFormatError, decode_pnm

    # P1 with run-together bits, a comment, and mixed separators
    p1 = b"P1 # bitmap\n4 2\n0110\n1 0 01\n"
    img, meta = decode_pnm(p1)
    assert meta["kind"] == "P1"
    # 1 = black -> 0; 0 = white -> 255
    assert img.tolist() == [[255, 0, 0, 255], [0, 255, 255, 0]]
    # non-bit sample text is a loud, accurate rejection
    with _pytest.raises(PnmFormatError, match="not '0'/'1'"):
        decode_pnm(b"P1\n2 1\n02\n")

    # P5 with a spec-legal comment between maxval and the raster:
    # '255 # c\n<data>' — the comment's EOL is the separator
    raw = bytes([0, 1, 2, 3])
    img5, _ = decode_pnm(b"P5 2 2 255 # trailing comment\n" + raw)
    assert img5.reshape(-1).tolist() == [0, 1, 2, 3]
    # two stacked comments before the raster also skip cleanly
    img5b, _ = decode_pnm(b"P5 2 2 255\n# a\n# b\n" + raw)
    assert img5b.reshape(-1).tolist() == [0, 1, 2, 3]
    # comment that never terminates -> loud truncation error
    with _pytest.raises(PnmFormatError, match="separator"):
        decode_pnm(b"P5 2 2 255 # never ends")
    # the ambiguity the length rule resolves: a raster whose FIRST
    # byte is 0x23 ('#') with an exact-fit length is RASTER, never a
    # comment (the m07 regression case — binary samples are
    # arbitrary bytes)
    hashy = bytes([0x23, 7, 11, 13])
    img5c, _ = decode_pnm(b"P5 2 2 255\n" + hashy)
    assert img5c.reshape(-1).tolist() == [0x23, 7, 11, 13]
    # and a comment whose following raster ALSO starts with '#'
    img5d, _ = decode_pnm(b"P5 2 2 255 # c\n" + hashy)
    assert img5d.reshape(-1).tolist() == [0x23, 7, 11, 13]

    # round-10 ADVICE pins: (a) a CRLF-terminated comment is ONE
    # delimiter — the '\n' must not leak into the raster as its
    # first byte (the +1-length case used to pass the truncation
    # check and silently shift every pixel)
    img5e, _ = decode_pnm(b"P5 2 2 255 # c\r\n" + raw)
    assert img5e.reshape(-1).tolist() == [0, 1, 2, 3]
    # a CR-only comment delimiter (classic-Mac writer) also works
    img5f, _ = decode_pnm(b"P5 2 2 255 # c\r" + raw)
    assert img5f.reshape(-1).tolist() == [0, 1, 2, 3]
    # (b) a '#'-leading raster with writer-appended trailing bytes
    # is neither an exact fit nor a viable comment+raster: LOUD
    # rejection, never a silent comment-eats-raster shift
    with _pytest.raises(PnmFormatError, match="ambiguous '#'"):
        decode_pnm(b"P5 2 2 255\n" + bytes([0x23, 7, 11, 13]) + b"\n")
    # a real comment followed by a full raster plus trailing bytes
    # still decodes (skip leaves >= need)
    img5g, _ = decode_pnm(b"P5 2 2 255 # c\n" + raw + b"\n")
    assert img5g.reshape(-1).tolist() == [0, 1, 2, 3]


def test_gif_pnm_round_trips_and_rejections():
    import numpy as np
    import pytest as _pytest

    from zappy_spark.sources.giflite import (
        GifFormatError,
        decode_gif,
        encode_gif,
    )
    from zappy_spark.sources.pnmlite import PnmFormatError, decode_pnm

    rng = np.random.default_rng(11)
    # palettes from tiny to full-width force every LZW code width
    for h, w, ncol in ((1, 1, 1), (1, 9, 3), (9, 1, 2), (16, 16, 250),
                       (40, 60, 256), (31, 33, 17)):
        pal = rng.integers(0, 256, size=(ncol, 3))
        a = pal[rng.integers(0, ncol, size=(h, w))].astype(np.uint8)
        out, _ = decode_gif(encode_gif(a))
        assert (out == a).all(), (h, w, ncol)
        out2, m2 = decode_gif(encode_gif(a, interlaced=True))
        assert m2["interlaced"] and (out2 == a).all(), (h, w, ncol)
    # >4096 dict entries forces the encoder's clear-code reset path
    seq = (np.arange(120 * 120) % 251).astype(np.uint8)
    pal = rng.integers(0, 256, size=(251, 3))
    big = pal[seq.reshape(120, 120)].astype(np.uint8)
    outb, _ = decode_gif(encode_gif(big))
    assert (outb == big).all()

    with _pytest.raises(GifFormatError, match="GIF87a/89a"):
        decode_gif(b"GIF90a" + bytes(20))
    with _pytest.raises(GifFormatError, match="colors"):
        k = np.arange(300)
        grad = np.stack([k % 256, k // 256, np.full_like(k, 7)], axis=1)
        encode_gif(grad.reshape(300, 1, 3).astype(np.uint8))
    # truncated LZW stream must fail loudly, not return short pixels
    good = encode_gif(pal[: 16].astype(np.uint8).reshape(4, 4, 3))
    with _pytest.raises(GifFormatError):
        decode_gif(good[: len(good) - 6] + bytes((0, 0x3B)))

    with _pytest.raises(PnmFormatError, match="P1..P6"):
        decode_pnm(b"P7\n1 1\n255\nx")
    with _pytest.raises(PnmFormatError, match="16-bit"):
        decode_pnm(b"P5\n1 1\n65535\n\x00\x00")
    with _pytest.raises(PnmFormatError, match="truncated raster"):
        decode_pnm(b"P6\n2 2\n255\n\x00\x01")


# -- zarr v3 sharding_indexed (round 8): spec pinning ----------------------


def test_crc32c_public_vectors():
    """The crc32c kernel against the public check vectors (RFC 3720
    appendix B.4 / the value every crc32c library prints for the
    9-byte check string), plus the empty-input identity."""
    from zappy_spark.sources.zarrlite import crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 bytes of zeros — iSCSI test vector
    assert crc32c(bytes(32)) == 0x8A9136AA
    # 32 bytes of 0xFF — iSCSI test vector
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def _hand_written_sharded_store(
    path, index_location="end", with_crc=True, missing_last=True
):
    """A 10x3 float64 array in TWO shard files of 6 rows, inner
    chunks of 2 rows (3 per shard). Shard 1 holds rows 6..9: its
    third inner chunk is entirely past the array end and is written
    as the spec's MISSING sentinel (when missing_last) — the sparse
    shard case. Bytes are hand-packed per the zarr v3 sharding
    spec, independent of the writer under test."""
    import struct

    X = np.arange(30, dtype="<f8").reshape(10, 3)
    path.mkdir()
    MISSING = 0xFFFFFFFFFFFFFFFF
    for s in range(2):
        blobs, table = [], []
        pos = 0
        for j in range(3):
            lo = s * 6 + j * 2
            if lo >= 10 and missing_last:
                table.append((MISSING, MISSING))
                continue
            chunk = np.zeros((2, 3), dtype="<f8")
            rows = X[lo : lo + 2]
            chunk[: rows.shape[0]] = rows
            b = chunk.tobytes(order="C")
            blobs.append(b)
            table.append((pos, len(b)))
            pos += len(b)
        idx = b"".join(struct.pack("<QQ", o, n) for o, n in table)
        if with_crc:
            from zappy_spark.sources.zarrlite import crc32c

            idx += struct.pack("<I", crc32c(idx))
        body = b"".join(blobs)
        if index_location == "end":
            data = body + idx
        else:
            # offsets are absolute within the file: shift by index
            shift = len(idx)
            idx = b"".join(
                struct.pack(
                    "<QQ",
                    o if o == MISSING else o + shift,
                    n,
                )
                for o, n in table
            )
            if with_crc:
                from zappy_spark.sources.zarrlite import crc32c

                idx += struct.pack("<I", crc32c(idx))
            data = idx + body
        (path / "c" / str(s)).mkdir(parents=True, exist_ok=True)
        (path / "c" / str(s) / "0").write_bytes(data)
    index_codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}}
    ]
    if with_crc:
        index_codecs.append({"name": "crc32c"})
    (path / "zarr.json").write_text(
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "array",
                "shape": [10, 3],
                "data_type": "float64",
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": [6, 3]},
                },
                "chunk_key_encoding": {
                    "name": "default",
                    "configuration": {"separator": "/"},
                },
                "fill_value": 0.0,
                "codecs": [
                    {
                        "name": "sharding_indexed",
                        "configuration": {
                            "chunk_shape": [2, 3],
                            "codecs": [
                                {
                                    "name": "bytes",
                                    "configuration": {
                                        "endian": "little"
                                    },
                                }
                            ],
                            "index_codecs": index_codecs,
                            "index_location": index_location,
                        },
                    }
                ],
            }
        )
    )
    return X.astype(np.float64)


def test_zarr_v3_sharded_golden_read(spark, tmp_path):
    """Reader consumes a hand-written spec-conformant SHARDED store
    byte-for-byte, including a MISSING inner chunk resolved to
    fill_value (the trimmed tail, so invisible in the result)."""
    X = _hand_written_sharded_store(tmp_path / "v3s")
    got = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v3s")).asndarray()
    assert np.array_equal(got, X)


def test_zarr_v3_sharded_index_at_start(spark, tmp_path):
    X = _hand_written_sharded_store(
        tmp_path / "v3ss", index_location="start", missing_last=False
    )
    got = ZappyFrame.from_zarrlite(spark, str(tmp_path / "v3ss")).asndarray()
    assert np.array_equal(got, X)


def test_zarr_v3_sharded_crc_mismatch_raises(spark, tmp_path):
    """A flipped bit in the shard index must fail LOUDLY with the
    crc32c values in the message — never decode garbage offsets."""
    _hand_written_sharded_store(tmp_path / "v3sc")
    f = tmp_path / "v3sc" / "c" / "0" / "0"
    data = bytearray(f.read_bytes())
    data[-20] ^= 0x01  # inside the offset table, before the crc
    f.write_bytes(bytes(data))
    with pytest.raises(Exception, match="crc32c mismatch"):
        ZappyFrame.from_zarrlite(
            spark, str(tmp_path / "v3sc")
        ).asndarray()


def test_zarr_v3_sharded_writer_round_trip(spark, tmp_path):
    """write_zarr_v3(shard_rows=...) emits spec bytes: (a) the
    reader round-trips them, (b) a PLAIN-NUMPY decode of the raw
    shard file (independent index parse + crc check) recovers the
    same rows, (c) the all-padding inner chunk of the last shard is
    the MISSING sentinel, not padding bytes."""
    import struct

    from zappy_spark.sources.zarrlite import crc32c, write_zarr_v3

    rng = np.random.default_rng(11)
    X = rng.normal(size=(10, 3))
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    store = tmp_path / "v3sw"
    write_zarr_v3(
        zf.df.selectExpr("row_id", "vec"),
        str(store),
        chunk_rows=2,
        ncols=3,
        shard_rows=6,
    )
    got = ZappyFrame.from_zarrlite(spark, str(store)).asndarray()
    assert np.allclose(got, X, atol=0)
    # independent decode of shard 1 (rows 6..9 + missing tail)
    data = (store / "c" / "1" / "0").read_bytes()
    idx = data[-(3 * 16 + 4) :]
    assert struct.unpack("<I", idx[-4:])[0] == crc32c(idx[:-4])
    table = np.frombuffer(idx[:-4], dtype="<u8").reshape(3, 2)
    assert (table[2] == 0xFFFFFFFFFFFFFFFF).all()  # MISSING
    o, n = (int(v) for v in table[0])
    rows = np.frombuffer(data[o : o + n], dtype="<f8").reshape(2, 3)
    assert np.allclose(rows, X[6:8], atol=0)


def test_zarr_v3_sharded_gzip_round_trip(spark, tmp_path):
    """Sharding composes with the inner gzip chain."""
    from zappy_spark.sources.zarrlite import write_zarr_v3

    X = np.arange(24, dtype=np.float64).reshape(8, 3)
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    store = tmp_path / "v3sg"
    write_zarr_v3(
        zf.df.selectExpr("row_id", "vec"),
        str(store),
        chunk_rows=2,
        ncols=3,
        compressor="gzip",
        shard_rows=4,
    )
    got = ZappyFrame.from_zarrlite(spark, str(store)).asndarray()
    assert np.array_equal(got, X)


def test_zarr_v2_consolidated_metadata(spark, tmp_path):
    """z34's surface: write_zarr_v2(consolidated=True) emits the real
    zarr ``.zmetadata`` document (zarr_consolidated_format 1, every
    metadata key inlined), the reader opens through it with the
    per-key ``.zarray`` DELETED, a stale-format version is loudly
    rejected, and the walk picks up nested group metadata keys."""
    import json as _json
    import os

    import pytest as _pytest

    from zappy_spark.sources.zarrlite import (
        write_consolidated_metadata,
        write_zarr_v2,
    )

    X = np.arange(30, dtype=np.float64).reshape(10, 3)
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    store = tmp_path / "v2c"
    write_zarr_v2(
        zf.df.selectExpr("row_id", "vec"),
        str(store),
        chunk_rows=4,
        ncols=3,
        compressor="zlib",
        consolidated=True,
    )
    doc = _json.loads((store / ".zmetadata").read_text())
    assert doc["zarr_consolidated_format"] == 1
    assert doc["metadata"][".zarray"]["zarr_format"] == 2
    # the proof read: only .zmetadata can serve the open
    os.remove(store / ".zarray")
    got = ZappyFrame.from_zarrlite(spark, str(store)).asndarray()
    assert np.array_equal(got, X)
    # nested keys are walked into the document with '/' separators
    sub = store / "grp"
    sub.mkdir()
    (sub / ".zgroup").write_text('{"zarr_format": 2}')
    write_consolidated_metadata(str(store))
    doc2 = _json.loads((store / ".zmetadata").read_text())
    assert doc2["metadata"]["grp/.zgroup"] == {"zarr_format": 2}
    # unsupported consolidated version -> loud rejection
    doc2["zarr_consolidated_format"] = 2
    (store / ".zmetadata").write_text(_json.dumps(doc2))
    with _pytest.raises(NotImplementedError, match="consolidated"):
        ZappyFrame.from_zarrlite(spark, str(store)).asndarray()


def test_zarr_v2_append_refreshes_consolidated(spark, tmp_path):
    """z35's hazard, closed: the reader PREFERS .zmetadata, so
    append_zarr_v2 must refresh a present consolidated doc or the
    grown shape is silently shadowed. Pin: after append, the doc
    carries the new shape and a .zarray-less read sees ALL rows."""
    import json as _json
    import os

    from zappy_spark.sources.zarrlite import append_zarr_v2, write_zarr_v2

    X = np.arange(24, dtype=np.float64).reshape(8, 3)
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    store = tmp_path / "v2ca"
    write_zarr_v2(
        zf.df.selectExpr("row_id", "vec"),
        str(store),
        chunk_rows=4,
        ncols=3,
        consolidated=True,
    )
    extra = np.arange(100, 106, dtype=np.float64).reshape(2, 3)
    append_zarr_v2(str(store), extra)
    doc = _json.loads((store / ".zmetadata").read_text())
    assert doc["metadata"][".zarray"]["shape"] == [10, 3]
    os.remove(store / ".zarray")
    got = ZappyFrame.from_zarrlite(spark, str(store)).asndarray()
    assert np.array_equal(got, np.vstack([X, extra]))


def test_zarr_v2_rewrite_refreshes_consolidated(spark, tmp_path):
    """Round-10 ADVICE pin: write_zarr_v2 with consolidated=False
    over a store previously written consolidated must refresh the
    pre-existing .zmetadata (the reader prefers it, so a stale doc
    would silently shadow the new shape/compressor — the rewrite
    twin of the append hazard)."""
    import json as _json
    import os

    from zappy_spark.sources.zarrlite import write_zarr_v2

    X = np.arange(24, dtype=np.float64).reshape(8, 3)
    zf = ZappyFrame.from_ndarray(spark, X, num_partitions=2)
    store = tmp_path / "v2cr"
    write_zarr_v2(
        zf.df.selectExpr("row_id", "vec"),
        str(store),
        chunk_rows=4,
        ncols=3,
        consolidated=True,
    )
    # rewrite with a DIFFERENT shape + compressor, consolidated off
    Y = np.arange(100, 130, dtype=np.float64).reshape(10, 3)
    zf2 = ZappyFrame.from_ndarray(spark, Y, num_partitions=2)
    write_zarr_v2(
        zf2.df.selectExpr("row_id", "vec"),
        str(store),
        chunk_rows=5,
        ncols=3,
        compressor="zlib",
    )
    doc = _json.loads((store / ".zmetadata").read_text())
    assert doc["metadata"][".zarray"]["shape"] == [10, 3]
    assert doc["metadata"][".zarray"]["compressor"] == {"id": "zlib"}
    # the consolidated-first open must see the NEW array
    os.remove(store / ".zarray")
    got = ZappyFrame.from_zarrlite(spark, str(store)).asndarray()
    assert np.array_equal(got, Y)
