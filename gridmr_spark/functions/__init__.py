from gridmr_spark.functions.numeric import davg, dmoney, dsum  # noqa: F401
from gridmr_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
