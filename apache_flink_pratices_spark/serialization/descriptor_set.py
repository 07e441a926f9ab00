"""Self-describing FileDescriptorSet for the market-data messages, built
with our own proto3 wire codec.

``spark-protobuf``'s ``to_protobuf``/``from_protobuf`` accept a binary
``FileDescriptorSet`` (normally produced by ``protoc
--descriptor_set_out``). ``protoc`` is not in this environment, but
``descriptor.proto`` is itself a protobuf message whose public schema we
can encode with :mod:`apache_flink_pratices_spark.serialization.protowire`
— so the JVM codec path (operators/protobuf_codec.py) gets a real
descriptor without any external tooling, generated from the SAME
``Field`` tables the Python codec runs on (single source of truth; a
field added to the message descriptors automatically appears here).

Schema notes:

- enum-kind fields are declared TYPE_INT64: wire-identical varints, and
  Spark then surfaces them as ``long`` columns exactly like the Python
  path's output schema;
- ``Timestamp`` is declared as a package-local message with the
  google.protobuf.Timestamp wire shape (seconds=1, nanos=2) — encoding is
  byte-compatible with the reference's well-known type
  (``proto/market_data.proto:9-45`` uses the WKT; the wire bytes do not
  carry type names).
"""

from __future__ import annotations

from functools import lru_cache

from apache_flink_pratices_spark.serialization.market_proto import (
    ORDERBOOK_LEVEL,
    ORDERBOOK_UPDATE,
    TIMESTAMP,
    TRADE,
)
from apache_flink_pratices_spark.serialization.protowire import Field, encode

#: proto package for the generated file; message full names are
#: f"{PACKAGE}.{name}" (pass these to to_protobuf/from_protobuf)
PACKAGE = "afp.market"

#: (message name, protowire descriptor) in declaration order
MESSAGES: tuple[tuple[str, tuple[Field, ...]], ...] = (
    ("Timestamp", TIMESTAMP),
    ("OrderBookLevel", ORDERBOOK_LEVEL),
    ("Trade", TRADE),
    ("OrderBookUpdate", ORDERBOOK_UPDATE),
)

# --- descriptor.proto subset (public schema, protobuf.dev) ----------------
# FieldDescriptorProto
_D_FIELD = (
    Field(1, "name", "string"),
    Field(3, "number", "int64"),
    Field(4, "label", "enum"),  # 1 = LABEL_OPTIONAL, 3 = LABEL_REPEATED
    Field(5, "type", "enum"),  # 1 = DOUBLE, 3 = INT64, 8 = BOOL, 9 = STRING, 11 = MESSAGE
    Field(6, "type_name", "string"),
)
# DescriptorProto
_D_MESSAGE = (
    Field(1, "name", "string"),
    Field(2, "field", "message", repeated=True, message=_D_FIELD),
)
# FileDescriptorProto
_D_FILE = (
    Field(1, "name", "string"),
    Field(2, "package", "string"),
    Field(4, "message_type", "message", repeated=True, message=_D_MESSAGE),
    Field(12, "syntax", "string"),
)
# FileDescriptorSet
DESCRIPTOR_SET_SCHEMA = (Field(1, "file", "message", repeated=True, message=_D_FILE),)

_TYPE_OF_KIND = {"double": 1, "int64": 3, "enum": 3, "bool": 8, "string": 9, "message": 11}


def _message_name_of(desc: tuple[Field, ...]) -> str:
    for name, d in MESSAGES:
        if d is desc:
            return name
    raise ValueError("nested message descriptor is not a registered message")


def _field_entry(f: Field) -> dict:
    entry = {
        "name": f.name,
        "number": f.number,
        "label": 3 if f.repeated else 1,
        "type": _TYPE_OF_KIND[f.kind],
    }
    if f.kind == "message":
        entry["type_name"] = f".{PACKAGE}.{_message_name_of(f.message)}"
    return entry


def descriptor_set_dict() -> dict:
    """The FileDescriptorSet as a plain dict (inspectable / testable)."""
    return {
        "file": [
            {
                "name": "afp_market_data.proto",
                "package": PACKAGE,
                "message_type": [
                    {"name": name, "field": [_field_entry(f) for f in desc]}
                    for name, desc in MESSAGES
                ],
                "syntax": "proto3",
            }
        ]
    }


@lru_cache(maxsize=1)
def descriptor_set_bytes() -> bytes:
    """Binary FileDescriptorSet for spark-protobuf's binaryDescriptorSet."""
    return encode(DESCRIPTOR_SET_SCHEMA, descriptor_set_dict())


def full_name(message: str) -> str:
    """Fully-qualified message name for to_protobuf/from_protobuf."""
    return f"{PACKAGE}.{message}"
