from gridmr_spark.compat.mapreduce import (  # noqa: F401
    parse_tab_kv,
    pipe_job,
    run_job,
    wordcount_map,
    wordcount_reduce,
)
