"""Deterministic synthetic fixtures (seed-addressed, order-independent).

Every page is generated from its index alone (`random.Random(f"page-{i}-42")`)
so generation can run distributed on executors (spark.range -> mapInPandas)
and still be byte-stable, per FIXTURES.md.
"""
