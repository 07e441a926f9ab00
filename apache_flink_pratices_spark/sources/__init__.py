"""Sources (SURVEY.md §2.1): collection (S1), file-stream, Kafka (S3),
and JSONL/CSV landing-zone loaders with corrupt-record quarantine
(``files.py``).

The reference's WebSocket connector (S2) is an out-of-engine asyncio ingest
daemon feeding Kafka — the reference itself consumes it *through Kafka*
(``docs/project docs/호가창 분석 스캘퍼: 시스템 아키텍처.md:737-748``), so the
engine's ingest surface is the Kafka source plus the test-friendly
collection/file sources.
"""
