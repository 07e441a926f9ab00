"""Structured Streaming side of the engine.

Modules:

- :mod:`.fraud` — the reference's flagship keyed stateful processor
  (ValueState + event-time timers) as a Spark 4 ``StatefulProcessor``
  driven by ``transformWithStateInPandas``.
- :mod:`.wordcount` — streaming word count in update output mode (the
  per-record-emission semantics of a Flink keyed ``reduce``).
- :mod:`.watermarks` — the engine's late-data policy helpers.

The batch twins of these operators live in
:mod:`apache_flink_pratices_spark.operators` and share business rules via
:mod:`apache_flink_pratices_spark.domain.rules`.
"""
