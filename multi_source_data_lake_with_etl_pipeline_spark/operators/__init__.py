"""Relational/dataflow operator library.

Every operator is a pure ``DataFrame -> DataFrame`` function (compose
with ``df.transform(...)``), mirroring the reference's pluggable
transformer chain (``data_transformers.py:15-25``, ``290-311``) but as
lazy Catalyst plans instead of per-record Python loops.
"""
