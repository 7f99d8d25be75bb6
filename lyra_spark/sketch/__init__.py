from lyra_spark.sketch.tdigest import TDigest  # noqa: F401
