"""DataFrame -> DataFrame operators (the Spark-side engine surface)."""
