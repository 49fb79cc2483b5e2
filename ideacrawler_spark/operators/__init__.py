from ideacrawler_spark.operators.admission import admit_budget, admit_topk  # noqa: F401
from ideacrawler_spark.operators.dedup import first_occurrence, anti_join_seen  # noqa: F401
