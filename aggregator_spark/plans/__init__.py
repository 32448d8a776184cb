from aggregator_spark.plans.stage1 import Stage1Result, run_stage1
from aggregator_spark.plans.stage2 import Stage2Result, run_stage2

__all__ = ["run_stage1", "Stage1Result", "run_stage2", "Stage2Result"]
