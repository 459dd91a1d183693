"""Pure-stdlib Avro Object Container File codec (null codec).

The container ships no spark-avro jar (same honest constraint as the
lakehouse jars — sources/lakehouse.py), but the Avro 1.x container
format itself (https://avro.apache.org/docs/current/specification/)
is ~100 lines of stdlib: magic ``Obj\\x01``, a metadata map carrying
the writer schema JSON, a 16-byte sync marker, then blocks of
``(record_count, byte_size, records..., sync)`` with zigzag-varint
longs and length-prefixed UTF-8 strings.

This module implements the binary encoding for the primitive types
the fixtures need (long, double, string) so the engine can both WRITE
valid Avro container files and READ them back — the read side runs
DISTRIBUTED (each executor decodes its files' bytes inside an
Arrow-batched mapInPandas; see operators/scans.q_source_avro_roundtrip).

Scale note: real Avro readers split WITHIN a file by scanning for the
sync marker and resuming at the next block boundary — the format is
designed for it, and ``iter_blocks`` exposes exactly that boundary.
The demo reader parallelizes per-file (binaryFile source), which is
the right shape when files are row-group-sized; intra-file splitting
would reuse iter_blocks unchanged on byte ranges.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"Obj\x01"
# Deterministic sync marker: fixtures must be byte-reproducible across
# runs (the repo-wide determinism rule), so no random marker.
SYNC = bytes(range(16))


# ---- primitive codec ------------------------------------------------------


def encode_long(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def encode_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return encode_long(len(raw)) + raw


def decode_string(buf: io.BytesIO) -> str:
    n = decode_long(buf)
    return buf.read(n).decode("utf-8")


def encode_double(x: float) -> bytes:
    return struct.pack("<d", x)


def decode_double(buf: io.BytesIO) -> float:
    return struct.unpack("<d", buf.read(8))[0]


_ENCODERS = {"long": encode_long, "string": encode_string, "double": encode_double}
_DECODERS = {"long": decode_long, "string": decode_string, "double": decode_double}


# ---- container ------------------------------------------------------------


def write_container(
    path: str,
    schema: dict,
    rows: list[dict],
    records_per_block: int = 10,
) -> None:
    """Write ``rows`` as a spec-compliant Avro object container file
    (codec null).  ``schema`` is a standard Avro record schema dict:
    {"type": "record", "name": ..., "fields": [{"name","type"}...]}."""
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null",
        }
        fh.write(encode_long(len(meta)))
        for k, v in sorted(meta.items()):
            fh.write(encode_string(k))
            fh.write(encode_long(len(v)) + v)
        fh.write(encode_long(0))  # end of metadata map
        fh.write(SYNC)
        for start in range(0, len(rows), records_per_block):
            block = rows[start : start + records_per_block]
            body = b"".join(
                b"".join(_ENCODERS[t](r[n]) for n, t in fields) for r in block
            )
            fh.write(encode_long(len(block)))
            fh.write(encode_long(len(body)))
            fh.write(body)
            fh.write(SYNC)


def read_header(buf: io.BytesIO) -> tuple[dict, bytes]:
    """Parse magic + metadata map; return (schema, sync_marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = decode_long(buf)
        if count == 0:
            break
        if count < 0:  # spec: negative count is followed by a byte size
            count = -count
            decode_long(buf)
        for _ in range(count):
            k = decode_string(buf)
            vlen = decode_long(buf)
            meta[k] = buf.read(vlen)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported Avro codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    return schema, buf.read(16)


def iter_blocks(buf: io.BytesIO, sync: bytes):
    """Yield (record_count, block_bytes) until EOF, verifying each
    trailing sync marker — the per-block boundary a splittable reader
    resumes at."""
    while True:
        first = buf.read(1)
        if not first:
            return
        buf.seek(-1, io.SEEK_CUR)
        count = decode_long(buf)
        size = decode_long(buf)
        body = buf.read(size)
        marker = buf.read(16)
        if marker != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        yield count, body


def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole container file's bytes to (schema, rows)."""
    buf = io.BytesIO(data)
    schema, sync = read_header(buf)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    rows: list[dict] = []
    for count, body in iter_blocks(buf, sync):
        bbuf = io.BytesIO(body)
        for _ in range(count):
            rows.append({n: _DECODERS[t](bbuf) for n, t in fields})
    return schema, rows
