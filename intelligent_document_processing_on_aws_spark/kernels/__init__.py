"""Pure deterministic kernels — no Spark imports allowed in this package.

These functions define the byte-identity contract of the engine. The Spark
stages (operators/) call them inside Arrow-batched UDFs; golden tests call
them directly.
"""
