"""Avro OCF codec: python round-trip properties + JAVA avro-core interop.

The container has no spark-avro datasource and no python avro package, but
pyspark bundles avro-core (the reference Java implementation of the spec).
That makes a true second-engine certificate possible: files written by the
pure-python codec (operators/avro.py) must be readable by Java avro-core,
and files written by Java avro-core must be readable by the python codec —
both directions, both supported codecs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from iceberg_benchmark_poc_spark.operators.avro import read_ocf, write_ocf

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

FIELDS = [("k", "long"), ("s", "string"), ("b", "bytes"), ("x", "double")]

rows_strategy = st.lists(
    st.tuples(
        st.integers(-(2**63), 2**63 - 1),
        st.text(max_size=50),
        st.binary(max_size=50),
        st.floats(allow_nan=False),  # NaN breaks tuple equality, not the codec
    ),
    max_size=200,
)


@given(rows=rows_strategy, codec=st.sampled_from(["null", "deflate"]))
@settings(**SETTINGS)
def test_python_roundtrip(tmp_path_factory, rows, codec):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_ocf(path, FIELDS, rows, codec=codec, block_rows=7)  # multi-block
    fields, got = read_ocf(path)
    assert fields == FIELDS
    assert got == rows


def _java_read(spark, path):
    jvm = spark._jvm  # noqa: SLF001
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while reader.hasNext():
        rec = reader.next()
        out.append((rec.get("k"), str(rec.get("s")), float(rec.get("x"))))
    reader.close()
    return out


def test_java_avro_reads_python_files(spark, tmp_path):
    rows = [(i * 7 - 3, f's"{i}\n\t\\', float(i) / 3.0) for i in range(50)]
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"py_{codec}.avro")
        write_ocf(path, [("k", "long"), ("s", "string"), ("x", "double")], rows, codec=codec)
        assert _java_read(spark, path) == rows, f"java failed to read python {codec} file"


def test_python_reads_java_avro_files(spark, tmp_path):
    from iceberg_benchmark_poc_spark.operators.avro import avro_schema_json

    jvm = spark._jvm  # noqa: SLF001
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        avro_schema_json("row", [("k", "long"), ("s", "string")])
    )
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"java_{codec}.avro")
        writer = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        )
        if codec == "deflate":
            writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(schema, jvm.java.io.File(path))
        expect = []
        for i in range(40):
            rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
            rec.put("k", jvm.java.lang.Long.valueOf(i * 11 - 5))
            rec.put("s", f"v{i}\n\\")
            writer.append(rec)
            expect.append((i * 11 - 5, f"v{i}\n\\"))
        writer.close()
        fields, got = read_ocf(path)
        assert fields == [("k", "long"), ("s", "string")]
        assert got == expect, f"python failed to read java {codec} file"
