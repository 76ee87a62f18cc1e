"""Pure-Python row semantics shared by the oracle and the Spark UDFs.

Nothing in this subpackage imports pyspark. Every function here is the
single source of truth for a per-row invariant; the Spark operators call
these functions inside Arrow-batched pandas UDFs (python loop over the
batch, no per-row Spark overhead), and the oracle calls them directly —
so byte-identity between pipeline and oracle holds by construction.
"""
