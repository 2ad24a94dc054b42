from amundsendatabuilder_spark.plans.lake import SnapshotLake, SnapshotTable  # noqa: F401
