"""Physical-plan introspection and audit helpers.

The engine's scale claims (filter pushdown, column pruning, broadcast vs
shuffle join choice, whole-stage codegen coverage) are asserted as tests
via :mod:`.explain`, not just stated in docstrings.
"""
