from ideacrawler_spark.sources.fixtures import synth_web, PAGES_SCHEMA, ROBOTS_SCHEMA  # noqa: F401
