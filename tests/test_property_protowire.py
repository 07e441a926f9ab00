"""Property-based codec invariants (hypothesis): encode→decode is the
identity for arbitrary well-formed messages — doubles at full range,
int64 extremes, unicode strings, any level count and order."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_flink_pratices_spark.serialization.market_proto import (
    decode_orderbook,
    decode_trade,
    encode_orderbook,
    encode_trade,
    ts_to_us,
    us_to_ts,
)

finite_doubles = st.floats(allow_nan=False, allow_infinity=True, width=64)
int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
enums = st.integers(min_value=0, max_value=3)
ts_us = st.integers(min_value=0, max_value=4_102_444_800_000_000)


@st.composite
def trades(draw):
    return {
        "exchange": draw(enums),
        "code": draw(st.text(max_size=24)),
        "trade_price": draw(finite_doubles),
        "trade_volume": draw(finite_doubles),
        "ask_bid": draw(enums),
        "prev_closing_price": draw(finite_doubles),
        "change": draw(enums),
        "change_price": draw(finite_doubles),
        "trade_timestamp": us_to_ts(draw(ts_us)),
        "sequential_id": draw(int64s),
        "stream_type": draw(enums),
        "received_timestamp": us_to_ts(draw(ts_us)),
    }


@st.composite
def orderbooks(draw):
    levels = st.lists(
        st.fixed_dictionaries({"price": finite_doubles, "size": finite_doubles}),
        max_size=20,
    )
    return {
        "exchange": draw(enums),
        "code": draw(st.text(max_size=24)),
        "total_ask_size": draw(finite_doubles),
        "total_bid_size": draw(finite_doubles),
        "asks": draw(levels),
        "bids": draw(levels),
        "stream_type": draw(enums),
        "event_timestamp": us_to_ts(draw(ts_us)),
        "received_timestamp": us_to_ts(draw(ts_us)),
    }


def _bits(v):
    """Bit-exact normal form: doubles compare by bit pattern (so -0.0 must
    survive the round-trip — encode elides by bits, not truthiness)."""
    if isinstance(v, float):
        import struct

        return struct.pack("<d", v)
    if isinstance(v, dict):
        return {k: _bits(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_bits(x) for x in v]
    return v


@given(trades())
@settings(max_examples=300, deadline=None)
def test_trade_roundtrip_property(msg):
    assert _bits(decode_trade(encode_trade(msg))) == _bits(msg)


@given(orderbooks())
@settings(max_examples=200, deadline=None)
def test_orderbook_roundtrip_property(msg):
    got = decode_orderbook(encode_orderbook(msg))
    assert _bits(got) == _bits(msg)


def test_negative_zero_survives_roundtrip():
    msg = {"trade_price": -0.0, "code": "KRW-BTC"}
    got = decode_trade(encode_trade(msg))
    assert math.copysign(1.0, got["trade_price"]) == -1.0


def test_wire_type_mismatch_rejected():
    """A foreign message whose field was encoded with a different wire type
    must be rejected, not silently misparsed."""
    import pytest

    from apache_flink_pratices_spark.serialization.protowire import _varint

    # field 3 (trade_price) is declared double (wire 1); send it as varint
    forged = _varint((3 << 3) | 0) + _varint(42)
    with pytest.raises(ValueError, match="wire type"):
        decode_trade(forged)
    # field 2 (code) is declared string (wire 2); send it as 8-byte I64
    forged = _varint((2 << 3) | 1) + b"\x00" * 8
    with pytest.raises(ValueError, match="wire type"):
        decode_trade(forged)


@given(ts_us)
@settings(max_examples=300, deadline=None)
def test_timestamp_bijection(us):
    assert ts_to_us(us_to_ts(us)) == us


@given(st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_decoder_never_crashes_on_wellformed_prefix(data):
    """Decoding arbitrary bytes either succeeds or raises a ValueError /
    IndexError / UnicodeDecodeError — never hangs or corrupts."""
    try:
        decode_trade(bytes(data))
    except (ValueError, IndexError, UnicodeDecodeError):
        pass
