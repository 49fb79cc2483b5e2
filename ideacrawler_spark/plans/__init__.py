from ideacrawler_spark.plans.crawl import CrawlEngine  # noqa: F401
