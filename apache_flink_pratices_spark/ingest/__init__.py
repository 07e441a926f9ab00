"""Out-of-engine ingestion (SURVEY.md §2.1 S2, §6 M5).

The reference feeds its engine through an asyncio WebSocket→Kafka bridge,
NOT through the stream processor itself (``시스템 아키텍처.md:737-748``) —
the engine consumes Kafka. This package is that thin bridge: connection
state machine, exponential-backoff reconnect, subscription restore, and a
pluggable sink (the Kafka producer in production, a list in tests).
"""
