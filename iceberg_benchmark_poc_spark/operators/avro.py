"""Pure-Python Avro Object Container File codec (public Avro 1.x spec).

pyspark bundles avro-core (the Java library) but NOT the spark-avro
datasource module, so ``spark.read.format("avro")`` raises in this
container. Avro ingest is still table stakes for a training-data pipeline
(Kafka dumps, Hive exports), so this module implements the published spec
directly — writer and reader for the Object Container File format:

    magic "Obj\\x01"
    file metadata map: avro.schema (JSON), avro.codec ("null" | "deflate")
    16-byte sync marker
    blocks: record count (zigzag varint) + byte size (zigzag varint)
            + serialized records (+ codec) + sync marker

Record encoding is the spec's binary encoding: fields in schema order, no
tags — long/int as zigzag varints, string/bytes length-prefixed, double as
little-endian IEEE 754. "deflate" is RFC 1951 raw deflate per the spec.

Interop is certified three ways (tests/test_avro.py): a python round-trip
property test, the bundled JAVA avro-core reading files this writer
produced, and this reader decoding files Java's DataFileWriter produced
(both codecs in both directions). The Spark integration
(queries/sources.py q_avro_roundtrip) runs the codec in mapInPandas leaves
so encode/decode parallelize per-partition with no shuffle.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = bytes.fromhex("8e7a1b2c3d4e5f60718293a4b5c6d7e8")  # fixed: deterministic output

#: supported primitive field types -> avro schema type names
_TYPES = {"long": "long", "string": "string", "bytes": "bytes", "double": "double"}


def avro_schema_json(name: str, fields: list[tuple[str, str]]) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": _TYPES[t]} for n, t in fields],
        }
    )


# -- primitive encoders (spec: binary encoding) -----------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc)


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    return buf.read(n)


# -- container file ----------------------------------------------------------


def write_ocf(
    path: str,
    fields: list[tuple[str, str]],
    rows: list[tuple],
    codec: str = "deflate",
    block_rows: int = 4096,
    name: str = "row",
) -> int:
    """Write rows (tuples in field order) as an Avro OCF; returns row count."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": avro_schema_json(name, fields).encode(),
        "avro.codec": codec.encode(),
    }
    # metadata map: one block of len(meta) entries, then the 0 terminator
    write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        write_bytes(out, k.encode())
        write_bytes(out, v)
    write_long(out, 0)
    out.write(SYNC)
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        body = io.BytesIO()
        for row in chunk:
            for (fname, ftype), val in zip(fields, row):
                if ftype == "long":
                    write_long(body, int(val))
                elif ftype == "string":
                    write_bytes(body, str(val).encode("utf-8"))
                elif ftype == "bytes":
                    write_bytes(body, bytes(val))
                elif ftype == "double":
                    body.write(struct.pack("<d", float(val)))
        payload = body.getvalue()
        if codec == "deflate":  # spec: RFC 1951 raw deflate, no zlib header
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.write(payload)
        out.write(SYNC)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
    return len(rows)


def read_ocf(path: str) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Read an Avro OCF written by any spec-conforming writer; returns
    (fields, rows). Supports the primitive types in _TYPES and the null /
    deflate codecs."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count = abs count + byte size follows
            n = -n
            read_long(buf)
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("only record schemas supported")
    fields: list[tuple[str, str]] = []
    for fld in schema["fields"]:
        t = fld["type"]
        if t not in _TYPES:
            raise ValueError(f"unsupported avro field type {t!r}")
        fields.append((fld["name"], t))
    rows: list[tuple] = []
    while buf.tell() < len(buf.getvalue()):
        count = read_long(buf)
        size = read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        body = io.BytesIO(payload)
        for _ in range(count):
            row = []
            for _, ftype in fields:
                if ftype == "long":
                    row.append(read_long(body))
                elif ftype == "string":
                    row.append(read_bytes(body).decode("utf-8"))
                elif ftype == "bytes":
                    row.append(read_bytes(body))
                elif ftype == "double":
                    row.append(struct.unpack("<d", body.read(8))[0])
            rows.append(tuple(row))
    return fields, rows
