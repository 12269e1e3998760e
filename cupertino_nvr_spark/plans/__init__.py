from cupertino_nvr_spark.plans.registry import REGISTRY, QuerySpec, register, all_queries, all_oracles  # noqa: F401

# Importing the plan modules populates REGISTRY.
from cupertino_nvr_spark.plans import flagship  # noqa: F401,E402
from cupertino_nvr_spark.plans import relational  # noqa: F401,E402
from cupertino_nvr_spark.plans import tpch_extra  # noqa: F401,E402
from cupertino_nvr_spark.plans import temporal  # noqa: F401,E402
from cupertino_nvr_spark.plans import scalar  # noqa: F401,E402
from cupertino_nvr_spark.plans import event_domain  # noqa: F401,E402
from cupertino_nvr_spark.plans import llm  # noqa: F401,E402
from cupertino_nvr_spark.plans import commands  # noqa: F401,E402
