from ideacrawler_spark.streaming.microbatch import StreamingCrawl  # noqa: F401
