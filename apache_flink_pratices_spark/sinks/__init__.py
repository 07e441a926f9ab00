"""Sinks (SURVEY.md §2.2): console/print (K1), Kafka with key partitioning
and per-event-type topic routing (K2/K3)."""
