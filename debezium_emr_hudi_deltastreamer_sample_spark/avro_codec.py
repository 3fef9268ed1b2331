"""Pure-Python Avro BINARY codec for the Debezium envelope.

The reference's Hudi path is Avro-serialized (AvroConverter /
KafkaAvroDeserializer, /root/reference/README.md:262-263, 309) and its
submit line ships spark-avro (README.md:348). This container has neither
spark-avro nor fastavro, so the engine carries its own minimal
implementation of the Avro 1.x binary encoding — just the subset the
envelope schema generator (envelope.envelope_avro_schema) can emit:

  record · union · named-type references · null · boolean · int · long ·
  float · double · bytes · string · logical date (int days) ·
  logical timestamp-micros (long)

That subset is closed under `envelope._avro_type`, so any registered row
schema round-trips. Used two ways:

- tests encode envelope sequences to REAL Avro bytes and pin that the
  Avro path and the JSON path parse identically (serde-equivalence);
- `envelope.parse_envelope_avro_py` decodes Avro-binary Kafka values via
  mapInPandas wherever the spark-avro jar is absent (the jar path,
  `parse_envelope_avro`, remains the fast lane when present: JVM-side
  decode, no Python boundary).

Wire format (Avro spec "Binary encoding"): int/long are zigzag varints;
string/bytes are length-prefixed; float/double little-endian IEEE;
union = zigzag branch index then value; record = fields in declared
order, no framing. Confluent wire format adds a 5-byte header
(magic 0 + schema id) ahead of the body — stripped explicitly (never
sniffed) via ``parse_envelope_avro_py(confluent_header=True)``.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct
from typing import Any

_EPOCH = _dt.date(1970, 1, 1)


# ---------------------------------------------------------------- varints
def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# ---------------------------------------------------------------- schema
def _named_types(schema: Any, reg: dict[str, Any]) -> None:
    """Collect record definitions so later occurrences can reference them
    by (qualified) name — Avro forbids redefining a named type."""
    if isinstance(schema, dict) and schema.get("type") == "record":
        ns = schema.get("namespace")
        name = schema["name"]
        reg[f"{ns}.{name}" if ns else name] = schema
        reg[name] = schema
        for f in schema["fields"]:
            _named_types(f["type"], reg)
    elif isinstance(schema, list):
        for s in schema:
            _named_types(s, reg)


def _resolve(schema: Any, reg: dict[str, Any]) -> Any:
    if isinstance(schema, str) and schema in reg:
        return reg[schema]
    return schema


class EnvelopeAvro:
    """Encoder/decoder bound to one envelope schema JSON."""

    def __init__(self, schema_json: str, nan_is_null: bool = False) -> None:
        self.schema = json.loads(schema_json)
        self.registry: dict[str, Any] = {}
        self.nan_is_null = nan_is_null
        _named_types(self.schema, self.registry)

    # ------------------------------------------------------------ encode
    def encode(self, value: dict) -> bytes:
        out = io.BytesIO()
        self._enc(self.schema, value, out)
        return out.getvalue()

    def _enc(self, schema: Any, v: Any, out: io.BytesIO) -> None:
        schema = _resolve(schema, self.registry)
        if isinstance(schema, list):  # union: branch index, then value
            idx = self._branch(schema, v)
            _write_long(out, idx)
            branch = _resolve(schema[idx], self.registry)
            if branch == "null" or (
                isinstance(branch, dict) and branch.get("type") == "null"
            ):
                return  # NaN-as-null: do not pass the NaN into the branch
            self._enc(schema[idx], v, out)
            return
        t = schema["type"] if isinstance(schema, dict) else schema
        logical = schema.get("logicalType") if isinstance(schema, dict) else None
        if t == "record":
            for f in schema["fields"]:
                self._enc(f["type"], None if v is None else v.get(f["name"]), out)
        elif t == "null":
            return
        elif t == "boolean":
            out.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            if logical == "date" and isinstance(v, _dt.date):
                v = (v - _EPOCH).days
            elif logical == "timestamp-micros" and isinstance(v, _dt.datetime):
                # Naive datetimes are UTC by engine convention (session TZ is
                # pinned to UTC); integer math avoids float-microsecond loss.
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_dt.timezone.utc)
                delta = v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                v = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            _write_long(out, int(v))
        elif t == "float":
            out.write(struct.pack("<f", float(v)))
        elif t == "double":
            out.write(struct.pack("<d", float(v)))
        elif t in ("bytes", "string"):
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            _write_long(out, len(b))
            out.write(b)
        else:
            raise TypeError(f"unsupported Avro type {t!r}")

    def _branch(self, union: list, v: Any) -> int:
        # ``nan_is_null`` (constructor flag): pandas upcasts nullable
        # numeric columns to float64 and represents NULL as NaN, so the
        # mapInPandas envelope lane turns it on. The plain-Row lane
        # (avrolog writer) leaves it OFF — there NaN is a legitimate
        # non-null double and mapping it to null would silently corrupt
        # the value.
        # Null-likeness must cover every NaN the Arrow/pandas lane can
        # deliver, not just python float: np.float32 NaN is NOT a float
        # subclass (NULL would silently encode as an Avro NaN value) and
        # a nullable Timestamp arrives as pd.NaT (int(NaT math) raises,
        # killing the task). Both satisfy the IEEE self-inequality test;
        # the try keeps exotic types (arrays, overloaded __ne__) from
        # leaking through as crashes. Pure stdlib — no pandas import.
        def _nan_like(x: Any) -> bool:
            try:
                return bool(x != x)
            except Exception:
                return False

        is_null = v is None or (self.nan_is_null and _nan_like(v))
        for i, s in enumerate(union):
            if (s == "null") == is_null:
                return i
        raise TypeError(f"no union branch for {type(v).__name__} in {union}")

    # ------------------------------------------------------------ decode
    def decode(self, b: bytes) -> dict:
        return self._dec(self.schema, io.BytesIO(b))

    @staticmethod
    def _read_exact(buf: io.BytesIO, n: int) -> bytes:
        # Every fixed-width read validates its length: a truncated buffer
        # must raise (the framing layer promises IOError on corruption),
        # not silently decode EOF as False/empty/garbage.
        b = buf.read(n)
        if len(b) != n:
            raise IOError(
                f"truncated Avro payload: wanted {n} bytes, got {len(b)}"
            )
        return b

    def _dec(self, schema: Any, buf: io.BytesIO) -> Any:
        schema = _resolve(schema, self.registry)
        if isinstance(schema, list):
            i = _read_long(buf)
            if not 0 <= i < len(schema):
                raise IOError(
                    f"corrupt Avro union index {i} for {len(schema)}-branch union"
                )
            return self._dec(schema[i], buf)
        t = schema["type"] if isinstance(schema, dict) else schema
        logical = schema.get("logicalType") if isinstance(schema, dict) else None
        if t == "record":
            return {f["name"]: self._dec(f["type"], buf) for f in schema["fields"]}
        if t == "null":
            return None
        if t == "boolean":
            return self._read_exact(buf, 1) == b"\x01"
        if t in ("int", "long"):
            n = _read_long(buf)
            if logical == "date":
                return _EPOCH + _dt.timedelta(days=n)
            if logical == "timestamp-micros":
                # Integer arithmetic like the encoder: float division loses
                # microseconds beyond ~year 2242 (double ulp > 0.5 µs).
                return _dt.datetime(
                    1970, 1, 1, tzinfo=_dt.timezone.utc
                ) + _dt.timedelta(microseconds=n)
            return n
        if t == "float":
            return struct.unpack("<f", self._read_exact(buf, 4))[0]
        if t == "double":
            return struct.unpack("<d", self._read_exact(buf, 8))[0]
        if t == "bytes":
            return self._read_exact(buf, _read_long(buf))
        if t == "string":
            return self._read_exact(buf, _read_long(buf)).decode("utf-8")
        raise TypeError(f"unsupported Avro type {t!r}")
