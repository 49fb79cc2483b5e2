from ideacrawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize,
    resolve_and_canonicalize,
    canonicalize_udf,
    host_of,
)
from ideacrawler_spark.functions.extract import extract_links, extract_links_udf  # noqa: F401
